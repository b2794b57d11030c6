package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ResampleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val H = 3600000000L

  test("grid completeness, zero-filled counts, forward fill") {
    import spark.implicits._
    val base = 1700000000000000L
    // user 1: events in hours 0, 3 (gap of 2 empty hours);
    // user 2: single event (one-bin grid)
    val df = Seq(
      (1L, base + 10L, 1.50), (1L, base + 20L, 2.25),
      (1L, 3 * H + base, 4.00),
      (2L, base + 5L, 9.99))
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
    val out = Resample.resample(df, "user_id", "ts", "value", H)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getDouble(4),
        r.getBoolean(5)))
    val u1 = out.filter(_._1 == 1L)
    assert(u1.length == 4, s"expected 4 hourly bins for user 1, got ${u1.length}")
    val bin0 = base - base % H
    assert(u1.map(_._2).toSeq == Seq(bin0, bin0 + H, bin0 + 2 * H, bin0 + 3 * H))
    // observed, filled, filled, observed
    assert(u1.map(_._6).toSeq == Seq(false, true, true, false))
    assert(u1.map(_._3).toSeq == Seq(2L, 0L, 0L, 1L))
    assert(u1.map(_._4).toSeq == Seq(Some(3.75), None, None, Some(4.0)))
    // forward fill carries 3.75 across the gap
    assert(u1.map(_._5).toSeq == Seq(3.75, 3.75, 3.75, 4.0))
    assert(out.filter(_._1 == 2L).toSeq ==
      Seq((2L, bin0, 1L, Some(9.99), 9.99, false)))
  }

  test("event counts are conserved on real data") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val out = Resample.resample(ev, "user_id", "ts", "value", H)
    assert(out.agg(sum(col("n_events"))).head().getLong(0) == ev.count())
    // no duplicate bins, and every key's grid is contiguous
    val bad = out.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), min(col("bin_us")).as("b0"),
        max(col("bin_us")).as("b1"))
      .filter(col("n") =!= (col("b1") - col("b0")) / H + 1)
      .count()
    assert(bad == 0, s"$bad users have non-contiguous grids")
  }
}
