package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the product-quantization index's two claims:
 *
 *  - the probe's scan side touches ONLY the narrow `(id, code)` table
 *    — its parquet `ReadSchema` carries no embedding bytes, so the
 *    compressed-domain scan reads 8 bytes of code per vector instead
 *    of the raw vector (32× at float32×64);
 *  - the persisted path is EXACTLY the in-memory `pqAnn` (same
 *    codebook by construction — it travels with the index), and
 *    encode→probe round-trips deterministically.
 */
class PqIndexSpec extends AnyFunSuite {

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

  test("probe parity with in-memory pqAnn, and the scan reads codes only") {
    val path = java.nio.file.Files.createTempDirectory("pqidx").toString + "/idx"
    Similarity.pqIndexWrite(emb, "vec_id", "embedding", path, dim = 64)

    val probed = Similarity.pqProbe(spark, path, emb, "vec_id", "embedding",
      queryVec, k = 10, excludeId = Some(0L))
    val inMem = Similarity.pqAnn(emb, "vec_id", "embedding",
      queryId = 0L, k = 10, dim = 64)
    assert(probed.collect().toSeq == inMem.collect().toSeq,
      "persisted probe disagrees with the in-memory form")

    // the code-table scan must be narrow: no embedding/vector columns
    val scans = probed.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).toSeq
    val codeScan = scans.find(_.contains("code"))
    assert(codeScan.isDefined, s"no code-table scan found:\n${scans.mkString("\n")}")
    assert(!codeScan.get.contains("embedding") && !codeScan.get.contains("v:"),
      s"code scan reads vector bytes: ${codeScan.get}")
  }

  test("codebook round-trips bit-identically and encoding is deterministic") {
    val path = java.nio.file.Files.createTempDirectory("pqidx2").toString + "/idx"
    Similarity.pqIndexWrite(emb, "vec_id", "embedding", path, dim = 64)
    val a = spark.read.parquet(path).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    Similarity.pqIndexWrite(emb, "vec_id", "embedding", path, dim = 64)
    val b = spark.read.parquet(path).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b, "re-encoding the same corpus changed codes")
  }

  test("registry-form recall floor holds with margin at test SF") {
    val exact = Similarity.knnBrute(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val pq = Similarity.pqAnn(emb, "vec_id", "embedding", 0L, 10, dim = 64)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact intersect pq).size / 10.0
    info(s"pq_ann recall@10 = $recall")
    assert(recall >= 0.7, s"recall $recall below registry floor 0.7")
  }
}
