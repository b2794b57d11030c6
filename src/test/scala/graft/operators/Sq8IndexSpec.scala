package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the scalar-quantization (SQ8) index's claims:
 *
 *  - the probe's scan side touches ONLY the narrow `(id, code)` table
 *    — its parquet `ReadSchema` carries no embedding bytes, so the
 *    scan reads 1 byte/dim instead of the raw vector (4× at float32);
 *  - the persisted path is EXACTLY the in-memory `sq8Ann` (the
 *    per-dim min/max params travel with the index), and
 *    encode→probe round-trips deterministically;
 *  - the quantized ADC ranking is near-exact: at 8 bits/dim the
 *    registry recall floor (0.9) holds with margin.
 */
class Sq8IndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = graft.Tables.embeddings(spark, sfDir)

  private def queryVec: Array[Double] =
    emb.filter(col("vec_id") === 0L).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray

  test("probe parity with in-memory sq8Ann, and the scan reads codes only") {
    val path = java.nio.file.Files.createTempDirectory("sq8idx").toString + "/idx"
    Similarity.sq8IndexWrite(emb, "vec_id", "embedding", path, dim = 64)

    val probed = Similarity.sq8Probe(spark, path, emb, "vec_id", "embedding",
      queryVec, k = 10, excludeId = Some(0L))
    val inMem = Similarity.sq8Ann(emb, "vec_id", "embedding",
      queryId = 0L, k = 10, dim = 64)
    assert(probed.collect().toSeq == inMem.collect().toSeq,
      "persisted probe disagrees with the in-memory form")

    val scans = probed.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).toSeq
    val codeScan = scans.find(_.contains("code"))
    assert(codeScan.isDefined, s"no code-table scan found:\n${scans.mkString("\n")}")
    assert(!codeScan.get.contains("embedding") && !codeScan.get.contains("v:"),
      s"code scan reads vector bytes: ${codeScan.get}")
  }

  test("params round-trip bit-identically and encoding is deterministic") {
    val path = java.nio.file.Files.createTempDirectory("sq8idx2").toString + "/idx"
    Similarity.sq8IndexWrite(emb, "vec_id", "embedding", path, dim = 64)
    def snap() = spark.read.parquet(path).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSeq
    val a = snap()
    Similarity.sq8IndexWrite(emb, "vec_id", "embedding", path, dim = 64)
    assert(a == snap(), "re-encoding the same corpus changed codes")
  }

  test("registry-form recall floor holds with margin at test SF") {
    val exact = Similarity.knnBrute(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val sq = Similarity.sq8Ann(emb, "vec_id", "embedding", 0L, 10, dim = 64)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact intersect sq).size / 10.0
    info(s"sq8_ann recall@10 = $recall")
    assert(recall >= 0.9, s"recall $recall below registry floor 0.9")
  }
}
