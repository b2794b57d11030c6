package graft.etl

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * JDBC ingest — the "relational sidecar" source (reference scope ends
 * at RPC+files; this closes the SURVEY §7 backlog item with a real
 * implementation against embedded Derby, which ships on the Spark
 * classpath).
 *
 * Scale design: a naive `spark.read.jdbc(url, table)` is ONE task
 * holding one connection — a 10⁹-row table funnels through a single
 * executor thread. `readPartitioned` issues `numPartitions` range
 * predicates on a numeric column so every executor pulls its own
 * slice concurrently; Spark pushes filters and column pruning into
 * the generated SQL (visible as PushedFilters in the scan). Bounds
 * are caller-provided, NOT discovered with a min/max query, because
 * against a production DB that discovery query is itself a full-table
 * scan; callers usually know the key range (sequence/auto-increment
 * high-water mark).
 */
object JdbcSource {

  /** Single-connection read — fine for dimension-sized tables only. */
  def read(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /**
   * Range-partitioned parallel read: `numPartitions` concurrent
   * connections, each scanning `[lower, upper]` stride of
   * `partitionCol`. Rows outside the bounds are still read (Spark
   * widens the first/last stride), so the bounds steer parallelism,
   * not correctness.
   */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)
}
