package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * I/O-level proof of the ANN scale claim: with the corpus written
 * partitioned by (band, bucket), a probe's scan is PRUNED to the
 * query's buckets — verified three ways: the plan's PartitionFilters,
 * the post-run numFiles scan metric (files actually opened), and
 * result parity with the in-memory `annLsh` on the same query.
 */
class AnnIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val bands = 16
  private val planesPerBand = 4

  test("a probe's scan reads only the query's (band, bucket) partitions") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft_ann_index").toString + "/idx"
    Similarity.annIndexWrite(emb, "vec_id", "embedding", indexPath,
      dim = 64, bands = bands, planesPerBand = planesPerBand)

    val queryVec = emb.filter(col("vec_id") === 0L)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
      .head().getSeq[Double](0).toArray
    val probe = Similarity
      .annProbe(spark, indexPath, "vec_id", queryVec, k = 10, dim = 64,
        bands = bands, planesPerBand = planesPerBand, excludeId = Some(0L))

    // 1. the partition predicate reaches the file listing
    val planText = probe.queryExecution.executedPlan.toString
    assert(planText.contains("PartitionFilters:") &&
      planText.contains("band#") && planText.contains("bucket#"),
      s"no partition filter on (band, bucket):\n$planText")

    val rows = probe.collect()

    // 2. files actually opened on the BAND table = only the probed
    //    buckets' files. The band table has bands × 2^planesPerBand
    //    directories; the query touches `bands` of them, so its scan
    //    must read well under the total (exactly the per-bucket file
    //    count when each bucket is one file). The flat vecs table is
    //    id-fetched, not pruned — it carries the payload exactly once
    //    (the v2 narrow-bands layout; v1 duplicated the vector onto
    //    every band row, bands× the storage and shuffle bytes).
    val allFiles = {
      val walk = java.nio.file.Files.walk(
        java.nio.file.Paths.get(Similarity.annBandsPath(indexPath)))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.count(_.toString.endsWith(".parquet"))
      } finally walk.close()
    }
    // AQE wraps materialized stages in QueryStageExec nodes whose
    // `plan` is a field, not a child — a plain collect() never sees
    // the scan, so descend explicitly
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case f: FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
        case other => other.children.flatMap(scans)
      }
    val filesRead = scans(probe.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/bands")))
      .map(_.metrics("numFiles").value).sum
    assert(filesRead > 0, "scan metric missing")
    val bucketDirs = bands * (1 << planesPerBand)
    assert(filesRead <= allFiles.toLong * bands / bucketDirs + bands,
      s"band scan read $filesRead of $allFiles files — not pruned to ~$bands/$bucketDirs of the band table")
    assert(filesRead < allFiles, s"band scan read the whole band table ($allFiles files)")

    // 3. parity with the in-memory banded ANN on the same query
    val expected = Similarity.annLsh(emb, "vec_id", "embedding",
        queryId = 0L, k = 10, dim = 64, bands = bands,
        planesPerBand = planesPerBand)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSet == expected)
  }
}
