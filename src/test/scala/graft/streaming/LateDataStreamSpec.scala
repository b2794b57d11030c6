package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the watermark-semantics model behind stream_late_data: the
  * emitted append-mode relation must equal the batch reconstruction
  * under (a) the one-batch watermark lag for late-row dropping and
  * (b) window finalization at window_end <= final watermark. If a
  * Spark upgrade changes either semantic, this fails loudly (and the
  * DuckDB oracle mirror in EventStreams.oracleSql must move with it).
  */
class LateDataStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streamed late-data aggregate equals the lagged-watermark batch model") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStreams.streamLateData(spark, dir).collect().toSeq

    val ev = graft.Tables.events(spark, dir)
    val us = unix_micros(col("ts"))
    val b = ev.agg(min(us).as("mn"), max(us).as("mx")).head()
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val span = mx - mn + 1
    val slice = least(lit(2L), expr(s"((unix_micros(ts) - ${mn}L) * 3) div ${span}L"))
    val base = ev.withColumn("slc", slice)
      .withColumn("moved", (col("user_id") % 7 === 0) && (col("slc") < 2))
      .withColumn("wend",
        unix_micros(date_trunc("hour", col("ts"))) + 3600000000L)
    // watermark applied to the late batch lags one batch: data through
    // terciles 0-1 only; finalization uses the full-data watermark
    val dropWm = base.filter(!col("moved") && col("slc") <= 1)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) - 3600000000L
    val finalWm = mx - 3600000000L
    val model = base
      .filter((!col("moved") || col("wend") > dropWm) && col("wend") <= finalWm)
      .groupBy((col("wend") - 3600000000L).as("window_start_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(12,2)")).cast("double"), 4)
          .as("total_value"))
      .orderBy(col("window_start_us"), col("event_type"))
      .collect().toSeq

    assert(streamed.nonEmpty)
    assert(streamed == model,
      "streamed append-mode output diverged from the watermark model")
    // the late cohort must be non-trivial for the check to mean much
    val nMoved = base.filter(col("moved")).count()
    assert(nMoved > 0)
  }
}
