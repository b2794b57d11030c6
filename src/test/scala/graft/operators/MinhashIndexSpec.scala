package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * I/O-level proof of the incremental-dedup claim: with the corpus'
 * banded MinHash signatures written partitioned by (band, bucket_p),
 * a batch probe prunes the index scan to the batch's buckets, and its
 * candidates agree with the in-memory banded join on the same corpus.
 */
class MinhashIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("probe candidates match the in-memory banded join, est_jaccard included") {
    val docs = graft.Tables.documents(spark, dir)
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val path = graft.Scratch.tempDir("graft_mh_spec") + "/idx"
    Dedup.minhashIndexWrite(corpus, "doc_id", "text", path)
    val probed = Dedup.minhashProbe(incoming, path, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // in-memory reference: the banded pair join over the SAME split,
    // normalized to (incoming, corpus) sides
    val inMem = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .filter((col("id1") % 10 === 0) =!= (col("id2") % 10 === 0))
      .select(
        when(col("id1") % 10 === 0, col("id1")).otherwise(col("id2")).as("n"),
        when(col("id1") % 10 === 0, col("id2")).otherwise(col("id1")).as("c"),
        col("est_jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(probed.nonEmpty)
    assert(probed == inMem,
      s"probe/in-memory divergence: only-probe=${probed -- inMem}, " +
        s"only-mem=${inMem -- probed}")
  }

  test("a single-doc probe reads only its buckets' partitions") {
    val docs = graft.Tables.documents(spark, dir)
    val one = docs.filter(col("doc_id") === 0L)
    val corpus = docs.filter(col("doc_id") =!= 0L)
    val path = graft.Scratch.tempDir("graft_mh_prune") + "/idx"
    Dedup.minhashIndexWrite(corpus, "doc_id", "text", path)
    val probe = Dedup.minhashProbe(one, path, "doc_id", "text")
    probe.collect()

    val allFiles = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.count(_.toString.endsWith(".parquet"))
      } finally walk.close()
    }
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case f: FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
        case other => other.children.flatMap(scans)
      }
    // partition pruning applies to the BAND-ROW scan (the sig tables
    // are id-keyed fetch joins, read whole by design — they carry one
    // narrow row per doc, no partition layout to prune)
    val bandScans = scans(probe.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/bands")))
    assert(bandScans.nonEmpty, "no band-row file scan found in the plan")
    val filesRead = bandScans.map(_.metrics("numFiles").value).sum
    // one doc probes 16 band buckets → at most 16 directories of the
    // (band × bucket_p) layout; the corpus spreads over far more
    assert(filesRead < allFiles,
      s"probe read the whole index ($filesRead of $allFiles files)")
    assert(filesRead <= 16L * 4,
      s"probe read $filesRead files — not pruned to the single doc's 16 buckets")
  }
}
