package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Measured evidence for the incremental-dedup claim: deduping a new
 * batch against a standing corpus via the persisted MinHash band
 * index (`Dedup.minhashProbe`) must beat re-shingling the whole
 * corpus (`Dedup.minhashLshPairs` over corpus ∪ batch, the only
 * option without an index). The registry's `minhash_index` form
 * deliberately runs BOTH sides plus the index build in one query as
 * its own oracle anchor, so its bench timing cannot show the ratio —
 * this probe times the steady-state loop alone:
 *
 *  - setup (timed once, amortized over every future batch): build the
 *    corpus index;
 *  - side A, per batch: probe the index — shingles/signs ONLY the
 *    batch, prunes the index scan to the batch's buckets;
 *  - side B, per batch: the no-index alternative — banded pair join
 *    over corpus ∪ batch (re-shingles the corpus every batch),
 *    filtered to cross pairs, i.e. the same answer side A gives.
 *
 * Knobs via env (mirrors Bench/AnchorProbe):
 *   SPARK_GRAFT_SF_DIR    data dir      (default /root/testdata/sf0.1)
 *   SPARK_GRAFT_CPUS      local threads (default 32)
 *   SPARK_GRAFT_RUNS      runs/side     (default 3)
 *   SPARK_GRAFT_BATCH_MOD batch = doc_id % MOD == 0 (default 10) —
 *     raise it to hold the BATCH fixed while the corpus grows, which
 *     is the steady-state production geometry (a day's batch vs the
 *     standing corpus); at the default the batch grows with the
 *     corpus and both sides converge on candidate-pair work
 *
 * Output: one JSON line with the per-side min, the index build time,
 * the probe/reshingle ratio, and the (equal) candidate counts — a
 * fast probe that returned different pairs would be half an answer.
 */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val batchMod = sys.env.getOrElse("SPARK_GRAFT_BATCH_MOD", "10").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    val docs = Tables.documents(spark, sfDir)
    val batch = docs.filter(col("doc_id") % batchMod === 0)
    val corpus = docs.filter(col("doc_id") % batchMod =!= 0)
    val path = Scratch.tempDir("graft_idx_probe") + "/idx"

    def hygiene(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def timed(f: () => Unit): Double = {
      val t0 = System.nanoTime()
      f()
      val dt = (System.nanoTime() - t0) / 1e9
      hygiene()
      dt
    }

    // one-time: the standing index (amortized over every future batch)
    val buildSec = timed(() =>
      Dedup.minhashIndexWrite(corpus, "doc_id", "text", path))

    var probeRows = 0L
    val probeTs = (1 to runs).map(_ => timed { () =>
      probeRows = Dedup.minhashProbe(batch, path, "doc_id", "text").count()
    })

    var reshingleRows = 0L
    val reshingleTs = (1 to runs).map(_ => timed { () =>
      reshingleRows = Dedup.minhashLshPairs(docs, "doc_id", "text")
        .filter((col("id1") % batchMod === 0) =!= (col("id2") % batchMod === 0))
        .count()
    })

    val ratio = probeTs.min / reshingleTs.min
    println(f"  index build     ${buildSec}%7.2fs (one-time)")
    println(f"  index probe     min ${probeTs.min}%7.2fs  runs [${probeTs.map(t => f"$t%.2f").mkString(", ")}]  rows $probeRows")
    println(f"  corpus reshingle min ${reshingleTs.min}%7.2fs  runs [${reshingleTs.map(t => f"$t%.2f").mkString(", ")}]  rows $reshingleRows")
    println(s"""{"sf":"$sfDir","runs":$runs,"batch_mod":$batchMod,"index_build_sec":$buildSec,"probe":{"min":${probeTs.min},"runs":[${probeTs.mkString(",")}]},"reshingle":{"min":${reshingleTs.min},"runs":[${reshingleTs.mkString(",")}]},"probe_over_reshingle":${math.rint(ratio * 1000) / 1000},"probe_rows":$probeRows,"reshingle_rows":$reshingleRows}""")
    spark.stop()
  }
}
