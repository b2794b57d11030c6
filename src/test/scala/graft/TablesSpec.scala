package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The driver has shipped `events.ts` under two physical parquet types
 * across testdata generations (TIMESTAMP(NANOS) → read as LONG via
 * nanosAsLong, then timestamp[us] → TIMESTAMP_NTZ). `Tables.events`
 * must dispatch on the READ schema so a regeneration can never again
 * break 18 queries at once (round-7 regression). This spec pins all
 * three input shapes to the same output: TimestampType with identical
 * epoch-micros under the UTC session.
 */
class TablesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val us = 1700000000123456L // µs-aligned epoch instant

  private def writeAndLoad(write: String => Unit): (DataType, Long) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_gen").toString
    write(dir)
    val df = Tables.events(spark, dir)
    val tpe = df.schema("ts").dataType
    val got = df.select(unix_micros(col("ts"))).head().getLong(0)
    (tpe, got)
  }

  test("normalizeEventTs: INT64 epoch-nanos generation → timestamp") {
    import spark.implicits._
    val (tpe, got) = writeAndLoad { dir =>
      Seq((us * 1000L, 1L)).toDF("ts", "event_id")
        .write.parquet(s"$dir/events.parquet")
    }
    assert(tpe == TimestampType)
    assert(got == us)
  }

  test("normalizeEventTs: TIMESTAMP_NTZ generation → timestamp, identity under UTC") {
    import spark.implicits._
    val (tpe, got) = writeAndLoad { dir =>
      Seq((us, 1L)).toDF("us", "event_id")
        .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"), col("event_id"))
        .write.parquet(s"$dir/events.parquet")
    }
    assert(tpe == TimestampType)
    assert(got == us)
  }

  test("normalizeEventTs: TIMESTAMP (LTZ) generation passes through") {
    import spark.implicits._
    val (tpe, got) = writeAndLoad { dir =>
      Seq((us, 1L)).toDF("us", "event_id")
        .select(timestamp_micros(col("us")).as("ts"), col("event_id"))
        .write.parquet(s"$dir/events.parquet")
    }
    assert(tpe == TimestampType)
    assert(got == us)
  }

  test("live testdata loads at every SF with a plain TimestampType ts") {
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val df = Tables.events(spark, s"/root/testdata/sf$sf")
      assert(df.schema("ts").dataType == TimestampType, s"sf$sf")
      assert(df.limit(1).count() == 1, s"sf$sf")
    }
  }
}
