package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOf, Scd}

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

  /**
   * Banded range join: ordered pairs of events from the same user
   * within 5 minutes — the "what happened right after X" shape.
   */
  def eventPairsWithin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val left = ev.select(col("user_id"), col("event_id").as("e1"), col("ts").as("t1"))
    val right = ev.select(col("user_id"), col("event_id").as("e2"), col("ts").as("t2"))
    graft.operators.RangeJoin.within(left, right, "user_id", "t1", "t2",
        windowUs = 5L * 60 * 1000000)
      .filter(col("e1") =!= col("e2"))
      .select(col("user_id"), col("e1"), col("e2"),
        (col("_rt") - col("_lt")).as("gap_us"))
      .orderBy(col("e1"), col("e2"))
  }

  /**
   * SCD Type-2 build over the event log: each user's `event_type`
   * history collapsed to validity intervals (operators/Scd.scala).
   * Timestamps surface as epoch-µs longs so the oracle compare is
   * integer-exact.
   */
  def scd2EventType(spark: SparkSession, dir: String): DataFrame =
    Scd.scd2(Tables.events(spark, dir), "user_id", "event_type",
        "ts", "event_id")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("effective_from")).as("from_us"),
        unix_micros(col("effective_to")).as("to_us"),
        col("is_current"))
      .orderBy(col("user_id"), col("from_us"))

  /**
   * Sliding (hopping) windows — 1-hour windows every 15 minutes, the
   * overlap shape trend dashboards aggregate on. Spark's `window`
   * with a slide plans one Expand of windowDuration/slide = 4 rows
   * per event before the keyed aggregate; unlike `.cube` that factor
   * is inherent to the semantics (each event IS in 4 windows), so the
   * Expand stays on the scan and the aggregate shuffles (window,
   * type) partials. Values sum as DECIMAL (exact at any partitioning)
   * and surface as epoch-µs so the oracle compare is precision-free.
   */
  def slidingWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(12,2)")).cast("double"), 4)
          .as("total_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("window_start_us"), col("event_type"))

  /**
   * Hourly gap-filled resample of each user's event series
   * (operators/Resample.scala): empty hours between a user's first
   * and last event materialize with zero counts and the last observed
   * hourly total carried forward.
   */
  def resampleHourly(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Resample.resample(Tables.events(spark, dir),
      "user_id", "ts", "value", stepUs = 3600000000L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join" -> asofPrevOrder _,
    "range_join" -> eventPairsWithin _,
    "q_sliding_window" -> slidingWindowAgg _,
    "time_resample" -> resampleHourly _,
    "q_scd2" -> scd2EventType _)

  val oracleSql: Map[String, String] = Map(
    // each event lands in exactly 4 of the epoch-aligned 15-minute
    // hop starts: floor15(ts) − i·15min for i ∈ 0..3
    "q_sliding_window" ->
      """WITH e AS (SELECT event_type, value, epoch_us(ts) AS us FROM events),
        |x AS (SELECT event_type, value,
        |        (us // 900000000 - i) * 900000000 AS window_start_us
        |      FROM e, unnest(range(0, 4)) t(i))
        |SELECT window_start_us, event_type, count(*) AS n_events,
        | round((sum(CAST(value AS DECIMAL(12,2))))::DOUBLE, 4) AS total_value
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // time_resample: grid generated per user from its (min, max) bins;
    // totals summed as DECIMAL then floated+rounded at the edge on
    // both sides; forward fill = last_value IGNORE NULLS
    "time_resample" ->
      """WITH a AS (
        | SELECT user_id,
        |   epoch_us(ts) - epoch_us(ts) % 3600000000 AS bin_us,
        |   count(*) AS n_events,
        |   sum(CAST(value AS DECIMAL(12,2))) AS total
        | FROM events GROUP BY 1, 2),
        |s AS (SELECT user_id, min(bin_us) AS b0, max(bin_us) AS b1
        |      FROM a GROUP BY 1),
        |g AS (SELECT user_id, b0 + i * 3600000000 AS bin_us
        |      FROM s, unnest(range(0, (b1 - b0) // 3600000000 + 1)) t(i)),
        |j AS (SELECT g.user_id, g.bin_us,
        |        coalesce(a.n_events, 0) AS n_events, a.total
        |      FROM g LEFT JOIN a ON g.user_id = a.user_id
        |                        AND g.bin_us = a.bin_us)
        |SELECT user_id, bin_us, n_events,
        | round(CAST(total AS DOUBLE), 4) AS total_value,
        | round(CAST(last_value(total IGNORE NULLS) OVER
        |   (PARTITION BY user_id ORDER BY bin_us
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE), 4) AS ffill_value,
        | total IS NULL AS filled
        |FROM j ORDER BY user_id, bin_us""".stripMargin,
    "asof_join" ->
      """SELECT o_orderkey, o_custkey,
        | epoch_us(o_orderdate) AS order_date_us,
        | max(epoch_us(o_orderdate)) OVER w AS prev_order_date_us,
        | count(*) OVER w AS n_prior
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
        |             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |ORDER BY o_orderkey""".stripMargin,
    "range_join" ->
      """SELECT a.user_id, a.event_id AS e1, b.event_id AS e2,
        | epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        |FROM events a JOIN events b ON a.user_id = b.user_id
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
        | AND a.event_id <> b.event_id
        |ORDER BY e1, e2""".stripMargin,
    "q_scd2" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER w AS prev_attr,
        |    lag(1) OVER w AS has_prev
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |ch AS (
        |  SELECT user_id, event_type, ts, event_id FROM o
        |  WHERE has_prev IS NULL OR prev_attr IS DISTINCT FROM event_type)
        |SELECT user_id, event_type,
        |  epoch_us(ts) AS from_us,
        |  epoch_us(lead(ts) OVER w2) AS to_us,
        |  (lead(ts) OVER w2) IS NULL AS is_current
        |FROM ch
        |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, from_us""".stripMargin)
}
