package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * I/O-level proof of the IVF scale claim, mirroring AnnIndexSpec: with
 * the corpus written partitioned by KMeans cluster and the centroids
 * persisted as model parameters, a probe (a) needs NO quantizer fit,
 * (b) scans only the probed clusters' directories (PartitionFilters +
 * the post-run numFiles metric), and (c) returns exactly what the
 * in-memory `ivfAnn` (same seed, same params) returns.
 */
class IvfIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val nCentroids = 16
  private val nProbe = 2

  test("a probe's scan reads only the probed clusters' partitions") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft_ivf_index").toString + "/idx"
    Similarity.ivfIndexWrite(emb, "vec_id", "embedding", indexPath,
      nCentroids = nCentroids)

    val queryVec = emb.filter(col("vec_id") === 0L)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
      .head().getSeq[Double](0).toArray
    val probe = Similarity.ivfProbe(spark, indexPath, "vec_id", queryVec,
      k = 10, nProbe = nProbe, excludeId = Some(0L))

    // 1. the partition predicate reaches the file listing
    val planText = probe.queryExecution.executedPlan.toString
    assert(planText.contains("PartitionFilters:") && planText.contains("cluster#"),
      s"no partition filter on cluster:\n$planText")

    val rows = probe.collect()
    assert(rows.nonEmpty)

    // 2. files actually opened = only the probed clusters' files
    val allFiles = {
      val walk = java.nio.file.Files.walk(
        java.nio.file.Paths.get(indexPath))
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
    val filesRead = scans(probe.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(filesRead > 0, "scan metric missing")
    assert(filesRead <= allFiles.toLong * nProbe / nCentroids + nProbe,
      s"probe read $filesRead of $allFiles files — not pruned to ~$nProbe/$nCentroids")
    assert(filesRead < allFiles, s"probe read the whole index ($allFiles files)")

    // 3. parity with the in-memory ivfAnn (same seed → same quantizer)
    val expected = Similarity.ivfAnn(emb, "vec_id", "embedding",
        queryId = 0L, k = 10, nCentroids = nCentroids, nProbe = nProbe)
      .collect().map(r => (r.getLong(0), r.getDouble(r.length - 1))).toSet
    assert(rows.map(r => (r.getLong(0), r.getDouble(2))).toSet == expected)
  }
}
