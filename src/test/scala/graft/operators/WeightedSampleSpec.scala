package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WeightedSampleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("exactly k hits, heavy rows guaranteed, zero weights excluded") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1L to 500L).map(i =>
      (i, if (i == 250L) 100000L else rnd.nextInt(100).toLong))
    val df = rows.toDF("id", "w")
    val out = Curation.weightedSystematicSample(df, "id", "w", k = 37)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.map(_._3).sum == 37L, "hit multiplicities must sum to k")
    // the heavy row owns >> W/k of the line: it must be hit, multiple times
    val heavy = out.find(_._1 == 250L)
    assert(heavy.exists(_._3 > 1), s"heavy row under-sampled: $heavy")
    // rows with w = 0 never selected
    assert(out.forall(_._2 > 0))
    // deterministic: same input → identical sample
    val again = Curation.weightedSystematicSample(df, "id", "w", k = 37)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(again.toSeq == out.toSeq)
  }

  test("k larger than distinct rows oversamples proportionally") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 30L)).toDF("id", "w")
    val out = Curation.weightedSystematicSample(df, "id", "w", k = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.values.sum == 8L)
    // 30/40 of the mass → 6 of 8 hits
    assert(out(2L) == 6L && out(1L) == 2L)
  }
}
