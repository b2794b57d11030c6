package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityModelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def labeled = {
    val docs = graft.Tables.documents(spark, sfDir)
    val q = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("quality"))
    QualityModel.featurize(docs, "doc_id", "text")
      .join(q, "doc_id")
      .withColumn("label", (col("quality") >= 0.5).cast("int"))
  }

  test("fit is deterministic and the held-out AUC clears the floor") {
    val train = labeled.filter(col("doc_id") % 2 === 0)
    val (c1, b1) = QualityModel.fit(train)
    val (c2, b2) = QualityModel.fit(train)
    assert(c1.toSeq == c2.toSeq && b1 == b2, "refit changed the model")

    val heldOut = QualityModel.score(labeled.filter(col("doc_id") % 2 =!= 0),
      c1, b1)
    val a = QualityModel.auc(heldOut, "label")
    info(s"held-out AUC = $a")
    assert(a >= 0.8, s"AUC $a below floor")
    // scores are probabilities
    val mm = heldOut.agg(min(col("score")), max(col("score"))).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("rank-exact AUC matches the closed form on a hand case") {
    import spark.implicits._
    // scores: pos {0.9, 0.8, 0.4}, neg {0.7, 0.3, 0.2} → 0.9 and 0.8
    // beat all 3 negatives, 0.4 beats 2 → 8/9, tie-free
    val df = Seq((0.9, 1), (0.8, 1), (0.4, 1), (0.7, 0), (0.3, 0), (0.2, 0))
      .toDF("score", "label")
    assert(math.abs(QualityModel.auc(df, "label") - 8.0 / 9.0) < 1e-9)
    // ties get average ranks: all-equal scores → AUC exactly 0.5
    val tied = Seq((0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0)).toDF("score", "label")
    assert(math.abs(QualityModel.auc(tied, "label") - 0.5) < 1e-9)
  }
}
