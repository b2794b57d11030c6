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
   * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
   * read natively. Read nanos as long and convert to a microsecond
   * timestamp (integer `div`, not `/`: epoch-nanos overflow double's
   * 53-bit mantissa). The testdata's values are µs-aligned, so this is
   * lossless.
   */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
