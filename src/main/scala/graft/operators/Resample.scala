package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Regular-grid time-series resampling with gap fill — the shape every
 * metrics/feature pipeline runs before a model sees a series: bucket
 * irregular observations onto a fixed step, materialize the EMPTY
 * buckets between a key's first and last observation, and carry the
 * last observed value forward across the gaps.
 *
 * Scale shape (100 TB of events, fixed step):
 *  - the observation aggregate is ONE keyed shuffle on (key, bin),
 *    partial-aggregated map-side;
 *  - the grid is generated per key from that aggregate's (min, max)
 *    bins — `sequence` + `explode`, sized by span/step per key, never
 *    a cross join against a global calendar;
 *  - the forward fill is a running `last(ignoreNulls)` window keyed
 *    by the series key — state is one value per key, and the window
 *    partitioning is the same key the grid join just shuffled on;
 *  - sums travel as DECIMAL (partitioning-independent exactness),
 *    surfacing as rounded doubles at the edge.
 * A key whose span/step is pathological (one key spanning years at
 * 1s step) grows only ITS OWN grid rows — skew isolates per key, and
 * the explode never amplifies other keys.
 */
object Resample {

  /**
   * @param stepUs grid step in microseconds
   * @return one row per (key, bin): n_events (0 on filled bins),
   *         total_value (null on filled bins), ffill_value (last
   *         observed total carried forward), filled flag
   */
  def resample(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    val us: Column = unix_micros(col(tsCol))
    val bin = (us - pmod(us, lit(stepUs))).as("bin_us")
    val agg = df
      .select(col(keyCol).as("k"), bin,
        col(valCol).cast("decimal(12,2)").as("v"))
      .groupBy(col("k"), col("bin_us"))
      .agg(count(lit(1)).as("n_events"), sum(col("v")).as("total"))
    val spans = agg.groupBy(col("k"))
      .agg(min(col("bin_us")).as("b0"), max(col("bin_us")).as("b1"))
    val grid = spans.select(col("k"),
      explode(sequence(col("b0"), col("b1"), lit(stepUs))).as("bin_us"))
    val byKey = Window.partitionBy(col("k")).orderBy(col("bin_us"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(agg, Seq("k", "bin_us"), "left")
      .select(col("k").as(keyCol), col("bin_us"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        round(col("total").cast("double"), 4).as("total_value"),
        round(last(col("total"), ignoreNulls = true).over(byKey)
          .cast("double"), 4).as("ffill_value"),
        col("total").isNull.as("filled"))
      .orderBy(col(keyCol), col("bin_us"))
  }
}
