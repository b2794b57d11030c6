package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming CDC apply must converge to the batch latest-per-key
  * snapshot regardless of how the change stream was sliced into
  * microbatches (the merge rule is associative + commutative). */
class CdcStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streamed snapshot equals the batch latest-per-key state") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStreams.streamCdcApply(spark, dir).collect().toSeq

    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val batch = graft.Tables.events(spark, dir)
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"),
        unix_micros(col("ts")).as("last_us"))
      .orderBy(col("user_id")).collect().toSeq

    assert(streamed == batch,
      "streaming CDC snapshot diverged from the batch merge")
    assert(streamed.nonEmpty)
  }
}
