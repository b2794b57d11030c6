package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOf

/** §G temporal — as-of join bound to the orders history. */
object TemporalQueries {

  /**
   * Self as-of over each customer's order history: every order gets
   * the date of the customer's most recent strictly-earlier order and
   * the count of prior orders — the point-in-time enrichment pattern.
   */
  def asofPrevOrder(spark: SparkSession, dir: String): DataFrame =
    AsOf.selfAsOf(Tables.orders(spark, dir), "o_custkey", "o_orderdate")
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("order_date_us"),
        col("prev_time_us").as("prev_order_date_us"),
        col("n_prior"))
      .orderBy(col("o_orderkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join" -> asofPrevOrder _)

  val oracleSql: Map[String, String] = Map(
    "asof_join" ->
      """SELECT o_orderkey, o_custkey,
        | epoch_us(o_orderdate) AS order_date_us,
        | max(epoch_us(o_orderdate)) OVER w AS prev_order_date_us,
        | count(*) OVER w AS n_prior
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
        |             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |ORDER BY o_orderkey""".stripMargin)
}
