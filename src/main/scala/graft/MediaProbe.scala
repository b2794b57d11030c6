package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Measured evidence for the perceptual-media-dedup GEOMETRY claim
 * (VERDICT r9's one `weak` item): the 64-bit SimHash's fixed 4×16-bit
 * band decomposition yields ~n²/2¹⁶ candidate pairs per band —
 * quadratic in asset count — while the 128-bit / 8×16 wide
 * fingerprint conditions each band collision on 16 of 128 independent
 * bits, keeping random collisions near-linear far longer. This probe
 * MEASURES both: banded candidate-pair volume (the eager guard's own
 * Σ C(bucket,2) aggregate) and end-to-end wall time for
 * `mm_dedup_near` (narrow) vs `mm_dedup_near_wide` (wide) on the same
 * corpus, across SF dirs — run it at sf0.1 / sf1 / sf10 and read the
 * growth curves side by side (§6 records them).
 *
 * Knobs via env (mirrors Bench/AnchorProbe/IndexProbe):
 *   SPARK_GRAFT_SF_DIR   data dir      (default /root/testdata/sf0.1)
 *   SPARK_GRAFT_CPUS     local threads (default 32)
 *   SPARK_GRAFT_RUNS     runs/side     (default 3)
 *
 * Output: one JSON line {n_assets, narrow/wide candidate counts +
 * ratios-to-linear, min wall times, result-pair counts}.
 */
object MediaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the probe exists to measure over-budget geometries too
    spark.conf.set("spark.graft.budget.bandCandPairs", "-1")
    import graft.operators.Multimodal

    val m = Multimodal.manifest(Tables.documents(spark, sfDir),
      "doc_id", "text")
    val nAssets = m.count()

    def hygiene(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def timedPairs(mk: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
      var pairs = 0L
      val ts = (1 to runs).map { _ =>
        hygiene()
        val t0 = System.nanoTime()
        pairs = Bench.consumed(mk()).head().getLong(0)
        (System.nanoTime() - t0) / 1e9
      }
      (ts.min, pairs)
    }
    // candidate volume via the guard's own arithmetic: Σ C(bucket, 2)
    // over (band, bucket) — computed from the probe's own signature
    // pass so the number is exactly what the self-join would face
    val candNarrow = Multimodal.bandedCandidatePairs(m, words = 4)
    val candWide = Multimodal.bandedCandidatePairs(m, words = 8)
    val candW32 = Multimodal.bandedCandidatePairs(m, words = 8, bandBits = 32)
    // End-to-end runs honor a candidate cap (SPARK_GRAFT_CAND_CAP,
    // default 200M): a geometry whose measured pair volume exceeds it
    // reports sec = -1 — the same refusal the registry guard makes,
    // here derived from the probe's own measurement so an sf10 run
    // still prices the over-budget geometry without executing its join.
    val candCap = sys.env.getOrElse("SPARK_GRAFT_CAND_CAP", "200000000").toLong
    def gated(cand: Long, mk: () => org.apache.spark.sql.DataFrame)
        : (Double, Long) =
      if (cand > candCap) (-1.0, -1L) else timedPairs(mk)
    val (tNarrow, pNarrow) = gated(candNarrow, () => Multimodal.nearDupMedia(m))
    val (tWide, pWide) = gated(candWide, () => Multimodal.nearDupMediaWide(m))
    val (tW32, pW32) = gated(candW32, () => Multimodal.nearDupMediaW32(m))

    val json = Seq(
      "\"metric\":\"media_dedup_probe\"",
      s""""sf_dir":"$sfDir"""",
      s""""n_assets":$nAssets""",
      s""""cand_pairs_narrow":$candNarrow""",
      s""""cand_pairs_wide":$candWide""",
      s""""cand_pairs_w32":$candW32""",
      f""""cand_per_asset_narrow":${candNarrow.toDouble / nAssets}%.3f""",
      f""""cand_per_asset_wide":${candWide.toDouble / nAssets}%.3f""",
      f""""cand_per_asset_w32":${candW32.toDouble / nAssets}%.3f""",
      f""""sec_narrow":$tNarrow%.2f""",
      f""""sec_wide":$tWide%.2f""",
      f""""sec_w32":$tW32%.2f""",
      s""""result_pairs_narrow":$pNarrow""",
      s""""result_pairs_wide":$pWide""",
      s""""result_pairs_w32":$pW32""")
    println("{" + json.mkString(",") + "}")
    spark.stop()
  }
}
