package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Band-boundary cases for the banded range join. */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("matches across band boundaries, excludes outside the window") {
    val w = 60L * 1000000 // 1 minute bands
    // left at 59s; matches at 59s(same band), 61s(next band, within
    // window), 119s (exactly window edge: inclusive), 120s (outside)
    val left = Seq((1L, 59_000_000L, "L"))
      .toDF("k", "us", "tag")
      .withColumn("t1", timestamp_micros(col("us"))).drop("us")
    val right = Seq(
      (1L, 59_000_000L, "same-band"),
      (1L, 61_000_000L, "next-band"),
      (1L, 119_000_000L, "edge"),
      (1L, 120_000_000L, "outside"),
      (2L, 59_000_000L, "wrong-key"))
      .toDF("k", "us", "rtag")
      .withColumn("t2", timestamp_micros(col("us"))).drop("us")
    val got = RangeJoin.within(left, right, "k", "t1", "t2", w)
      .select(col("rtag")).collect().map(_.getString(0)).toSet
    assert(got == Set("same-band", "next-band", "edge"))
  }

  test("produces no duplicate pairs") {
    val w = 60L * 1000000
    val left = Seq((1L, 30_000_000L)).toDF("k", "us")
      .withColumn("t1", timestamp_micros(col("us"))).drop("us")
    val right = Seq((1L, 45_000_000L)).toDF("k", "us")
      .withColumn("t2", timestamp_micros(col("us"))).drop("us")
    assert(RangeJoin.within(left, right, "k", "t1", "t2", w).count() == 1)
  }
}
