package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loaders for the driver-generated testdata star schema
 * (`/root/testdata/sf*`; see TESTDATA.md). One parquet file per table.
 *
 * All operators in this library are written against plain DataFrames so
 * they work on any data; these loaders just bind them to the test
 * tables. At cluster scale the same operators read partitioned
 * directories — nothing here assumes a single file.
 */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /**
   * `events.ts` has shipped under two physical parquet types across
   * testdata generations, so the loader dispatches on the READ schema
   * rather than assuming one:
   *
   *  - TIMESTAMP(NANOS): Spark 4 refuses it natively; with
   *    `legacy.parquet.nanosAsLong` it reads as LONG epoch-nanos →
   *    convert with integer `div` (epoch-nanos overflow double's
   *    53-bit mantissa) to a microsecond timestamp. Lossless: the
   *    values are µs-aligned.
   *  - timestamp[us] without timezone: reads as TIMESTAMP_NTZ → cast
   *    to session-local TIMESTAMP. The session timezone is pinned to
   *    UTC everywhere in this library, so the cast is numerically an
   *    identity and `unix_micros`/windows/watermarks agree with the
   *    DuckDB oracle's naive-timestamp epoch functions.
   *  - TIMESTAMP (LTZ): pass through.
   */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  def events(s: SparkSession, d: String): DataFrame = {
    // harmless when ts is already a timestamp; required to read the
    // TIMESTAMP(NANOS) generation at all
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
