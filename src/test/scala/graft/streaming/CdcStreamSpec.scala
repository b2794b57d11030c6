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

  test("crash before the manifest flip: readers stay on the published snapshot") {
    // the publish protocol under foreachBatch, driven directly so the
    // crash can be injected at the exact boundary: version v+1's files
    // fully written (and worse: partially written) but the ONE
    // manifest flip never ran — a restarting reader must see v,
    // byte for byte
    import graft.operators.IndexManifest
    val snapDir = graft.Scratch.tempDir("graft_cdc_crash") + "/snapshot"
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")

    // published v1
    val v1 = events.filter(col("user_id") % 2 === 0)
    v1.write.parquet(s"$snapDir/v1")
    IndexManifest.replace(spark, snapDir,
      IndexManifest.listDataFiles(spark, snapDir, "v1"))
    val published = EventStreams.cdcSnapshotRead(spark, snapDir)
      .collect().map(_.toString).sorted.toSeq

    // crash case A: v2 written COMPLETELY but the flip never ran
    events.filter(col("user_id") % 2 === 1).write.parquet(s"$snapDir/v2")
    assert(EventStreams.cdcSnapshotRead(spark, snapDir)
        .collect().map(_.toString).sorted.toSeq == published,
      "an unflipped complete snapshot leaked to a reader")

    // crash case B: v2 additionally TORN — a junk part file a directory
    // -convention reader would try to open and fail on
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$snapDir/v2/part-junk-torn.parquet"),
      Array[Byte](80, 65, 82, 49, 0, 0, 0)) // "PAR1" + garbage
    assert(EventStreams.cdcSnapshotRead(spark, snapDir)
        .collect().map(_.toString).sorted.toSeq == published,
      "a torn snapshot write leaked to a reader")

    // the uncommitted debris is exactly what orphans() names
    val debris = IndexManifest.orphans(spark, snapDir, Seq("v2"))
    assert(debris.nonEmpty && debris.forall(_.startsWith("v2/")))

    // recovery: the restarted writer re-publishes v2 (overwrite mode,
    // exactly what foreachBatch does) and the flip makes it visible
    events.filter(col("user_id") % 2 === 1)
      .write.mode("overwrite").parquet(s"$snapDir/v2")
    IndexManifest.replace(spark, snapDir,
      IndexManifest.listDataFiles(spark, snapDir, "v2"))
    val after = EventStreams.cdcSnapshotRead(spark, snapDir)
    assert(after.collect().map(_.toString).sorted.toSeq ==
      events.filter(col("user_id") % 2 === 1)
        .collect().map(_.toString).sorted.toSeq)
  }
}
