package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.ExtractLayout

class ScaledNumberSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("scaled arithmetic is exact and scale-checked") {
    val df = Seq((1L, 150L, 2), (1L, 250L, 2), (2L, 999L, 3)).toDF("k", "v", "s")
      .withColumn("n", ScaledNumber.make(col("v"), col("s")))
    val summed = df.groupBy("k").agg(ScaledNumber.sumScaled(col("n")).as("total"))
      .withColumn("as_double", ScaledNumber.toDouble(col("total")))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Double]("as_double")).toMap
    assert(summed == Map(1L -> 4.0, 2L -> 0.999))

    val mixed = spark.sql("SELECT 1").select(
      ScaledNumber.plus(
        ScaledNumber.make(lit(100L), lit(2)),
        ScaledNumber.make(lit(100L), lit(3))).as("bad"))
    assert(mixed.head().isNullAt(0)) // scale mismatch -> null, not garbage
  }

  test("lamports carry scale 9 like the reference") {
    val d = spark.sql("SELECT 1").select(
      ScaledNumber.toDouble(ScaledNumber.lamports(lit(1500000000L))).as("sol"))
      .head().getDouble(0)
    assert(d == 1.5)
  }

  test("extract layout groups slots and caps backoff") {
    assert(ExtractLayout.dirFor(119_000_123L, 10_000) == "119000000_119009999")
    assert(ExtractLayout.blockPath(42, 100) == "0_99/block_42.json.gz")
    assert(ExtractLayout.fileFor(1234, 500) == "blocks_1000_1499")
    assert(ExtractLayout.backoffSchedule() == Seq(5, 10, 20, 40))
  }
}
