package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The maintenance leg of the append story: after many batch appends
 * each index directory is a pile of batch-sized files, and
 * `Layout.compactPartitioned` must fold them back to one-file-per-
 * directory WITHOUT changing anything a probe can observe —
 *
 *  - probe-after-compact ≡ probe-before (same rows, same estimates);
 *  - the file count strictly drops (the whole point);
 *  - the compacted index still partition-prunes: a single-doc probe's
 *    numFiles metric stays bounded by the doc's bucket count, i.e.
 *    the (band, bucket_p) directory layout survived the rewrite.
 *
 * The flat `Layout.compact` CANNOT be used here — it would read the
 * partition columns back as data columns and write one unpartitioned
 * directory, silently turning every probe into a full index scan.
 */
class IndexCompactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def scans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] = p match {
    case f: FileSourceScanExec => Seq(f)
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
    case other => other.children.flatMap(scans)
  }

  test("compactPartitioned: probe parity, fewer files, pruning intact") {
    val docs = graft.Tables.documents(spark, dir)
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    // base + two appended batches → touched directories hold 3 files
    val base = docs.filter(col("doc_id") % 10 > 1)
    val batch1 = docs.filter(col("doc_id") % 10 === 9)
    val root = graft.Scratch.tempDir("graft_mh_compact")
    val idx = root + "/idx"
    val compacted = root + "/compacted"
    Dedup.minhashIndexWrite(base, "doc_id", "text", idx)
    Dedup.minhashIndexAppend(batch1, idx, "doc_id", "text")
    Dedup.minhashIndexAppend(docs.filter(col("doc_id") % 10 === 1),
      idx, "doc_id", "text")

    def probeSet(p: String) =
      Dedup.minhashProbe(incoming, p, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val beforeProbe = probeSet(idx)
    assert(beforeProbe.nonEmpty)

    // compact the partitioned band table in place of the appended one;
    // the flat sigs table compacts with Layout.compact on its own
    val (nIn, nOut) = Layout.compactPartitioned(spark,
      Dedup.bandsPath(idx), Dedup.bandsPath(compacted),
      Seq("band", "bucket_p"))
    assert(nOut < nIn, s"compaction did not shrink the index: $nIn -> $nOut")
    // the orchestrator swapping a compacted root in carries the
    // index-level metadata (the `_layout.txt` fan-out record) with it,
    // same as it would the manifest — compactPartitioned itself only
    // rewrites the one partitioned table it is pointed at
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(idx, "_layout.txt"),
      java.nio.file.Paths.get(compacted, "_layout.txt"))
    val (sigsIn, sigsOut) = Layout.compact(spark, idx + "/sigs",
      compacted + "/sigs", targetFileBytes = 128L << 20)
    assert(sigsIn >= 3 && sigsOut == 1,
      s"sigs table: expected >=3 append-fragmented files -> 1, " +
        s"got $sigsIn -> $sigsOut")
    assert(probeSet(compacted) == beforeProbe,
      "compaction changed probe results")

    // pruning on the COMPACTED index: a one-doc probe reads at most its
    // 16 band buckets' directories (same bound MinhashIndexSpec pins on
    // a freshly-built index)
    val one = docs.filter(col("doc_id") === 0L)
    val probe = Dedup.minhashProbe(one, compacted, "doc_id", "text")
    probe.collect()
    val idxScans = scans(probe.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(p =>
        p.toString.contains("compacted") && p.toString.contains("/bands")))
    assert(idxScans.nonEmpty, "no band-row file scan found in the probe plan")
    val filesRead = idxScans.map(_.metrics("numFiles").value).sum
    assert(filesRead <= 16L * 4,
      s"probe read $filesRead files on the compacted index — pruning lost")
  }
}
