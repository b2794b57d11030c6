package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The composed IVF-PQ index must deliver BOTH scale cuts in ONE probe
 * — that is its whole reason to exist over the single-cut families:
 *
 *  - the coarse quantizer's `cluster IN (…)` reaches the file listing
 *    (PartitionFilters + the post-run numFiles metric proves only the
 *    probed clusters' directories were opened), AND
 *  - the same scan's `ReadSchema` carries (id, code) only — no vector
 *    bytes (the 32× PQ byte cut).
 *
 * Plus the family-wide contracts: recall@10 against the exact brute
 * anchor at the registry floor, and append-under-frozen-parameters
 * parity (probe-after-append ≡ probe over a frozen-params build that
 * had included the batch).
 */
class IvfPqIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val nCentroids = 16
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def queryVec: Array[Double] =
    emb.filter(col("vec_id") === 0L).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray

  private def scans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] = p match {
    case f: FileSourceScanExec => Seq(f)
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
    case other => other.children.flatMap(scans)
  }

  test("one probe gets the partition prune AND the codes-only scan") {
    val nProbe = 2
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_idx").toString + "/idx"
    Similarity.ivfpqIndexWrite(emb, "vec_id", "embedding", path, dim = 64,
      nCentroids = nCentroids)

    val probe = Similarity.ivfpqProbe(spark, path, emb, "vec_id", "embedding",
      queryVec, k = 10, nProbe = nProbe, excludeId = Some(0L))
    val rows = probe.collect()
    assert(rows.nonEmpty)

    // 1. partition predicate reaches the file listing
    val planText = probe.queryExecution.executedPlan.toString
    assert(planText.contains("PartitionFilters:") && planText.contains("cluster#"),
      s"no partition filter on cluster:\n$planText")

    // 2. the SAME scan is codes-only: its ReadSchema has no vector bytes
    val codeScanLines = planText.linesIterator
      .filter(_.contains("ReadSchema")).toSeq
    val codeScan = codeScanLines.find(_.contains("code"))
    assert(codeScan.isDefined,
      s"no code-table scan found:\n${codeScanLines.mkString("\n")}")
    assert(!codeScan.get.contains("embedding") && !codeScan.get.contains("v:"),
      s"code scan reads vector bytes: ${codeScan.get}")

    // 3. files actually opened ≈ the probed clusters' share
    val allFiles = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.count(_.toString.endsWith(".parquet"))
      } finally walk.close()
    }
    val filesRead = scans(probe.queryExecution.executedPlan)
      .filter(_.output.exists(_.name == "code"))
      .map(_.metrics("numFiles").value).sum
    assert(filesRead > 0, "code-scan metric missing")
    assert(filesRead <= allFiles.toLong * nProbe / nCentroids + nProbe,
      s"probe read $filesRead of $allFiles files — not pruned to ~$nProbe/$nCentroids")
    assert(filesRead < allFiles, s"probe read the whole index ($allFiles files)")
  }

  test("recall@10 vs the exact brute anchor holds the registry floor") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_rec").toString + "/idx"
    Similarity.ivfpqIndexWrite(emb, "vec_id", "embedding", path, dim = 64,
      nCentroids = nCentroids)
    val exact = Similarity.knnBrute(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val got = Similarity.ivfpqProbe(spark, path, emb, "vec_id", "embedding",
        queryVec, k = 10, nProbe = 8, excludeId = Some(0L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact intersect got).size / 10.0
    info(s"ivfpq recall@10 = $recall")
    assert(recall >= 0.5, s"recall $recall below registry floor 0.5")
  }

  test("append under frozen quantizer+codebook: probe parity with a frozen rebuild") {
    val base = emb.filter(col("vec_id") % 4 =!= 3)
    val batch = emb.filter(col("vec_id") % 4 === 3)
    val root = graft.Scratch.tempDir("graft_ivfpq_app")
    val idx = root + "/idx"
    Similarity.ivfpqIndexWrite(base, "vec_id", "embedding", idx, dim = 64,
      nCentroids = nCentroids)
    Similarity.ivfpqIndexAppend(batch, "vec_id", "embedding", idx)

    // frozen-parameter rebuild reference: same centers + codebook (they
    // are persisted model parameters), corpus = base ∪ batch — realized
    // by building on base and appending, vs appending in two halves
    val idx2 = root + "/idx2"
    Similarity.ivfpqIndexWrite(base, "vec_id", "embedding", idx2, dim = 64,
      nCentroids = nCentroids)
    Similarity.ivfpqIndexAppend(batch.filter(col("vec_id") % 8 === 3),
      "vec_id", "embedding", idx2)
    Similarity.ivfpqIndexAppend(batch.filter(col("vec_id") % 8 =!= 3),
      "vec_id", "embedding", idx2)

    val a = Similarity.ivfpqProbe(spark, idx, emb, "vec_id", "embedding",
      queryVec, k = 20, nProbe = 8).collect().map(_.toString).toSeq
    val b = Similarity.ivfpqProbe(spark, idx2, emb, "vec_id", "embedding",
      queryVec, k = 20, nProbe = 8).collect().map(_.toString).toSeq
    assert(a == b,
      "append slicing changed probe results under frozen parameters")

    // with every cluster probed, exactly base + batch ids are visible,
    // each once (no double-append, no lost batch rows)
    val n = emb.count().toInt
    val ids = Similarity.ivfpqProbe(spark, idx, emb, "vec_id", "embedding",
        queryVec, k = n + 10, nProbe = nCentroids, refine = 1)
      .select("vec_id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length, "a row appears twice")
    assert(ids.length == n, s"expected $n visible rows, got ${ids.length}")
  }
}
