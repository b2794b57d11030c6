package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact distributed percentiles. Spark's `percentile()` aggregate is
 * exact but buffers EVERY value of a group in one aggregation buffer —
 * with few groups and 100 TB of rows that is a per-reducer memory bomb
 * (the whole group's column on one executor), the same shape
 * ScaleGuard exists to refuse. This operator computes the same
 * interpolated order statistics with nothing larger than a partition
 * ever resident:
 *
 *  1. assign each row a DETERMINISTIC range-slice id from
 *     driver-sampled literal bounds on (group, value) — see
 *     [[RangeSlice]]. The id is a pure function of the row, so every
 *     plan branch recomputes the SAME slicing: no pinned partition
 *     ids, no checkpoint, no full-table materialization, and executor
 *     loss just recomputes (fault-tolerant at 1000 executors). The
 *     recompute-safety inherits RangeSlice's precondition: the input
 *     must have deterministic lineage — persist first if it doesn't;
 *  2. global rank within each group = per-(slice, group) counts
 *     (a slices×groups-sized aggregate) cumulated into offsets +
 *     a slice-local row_number — the seq_pack/q_ntile_spread
 *     prefix-sum pattern, no single-partition sort anywhere;
 *  3. each quantile q needs only ranks ⌊(n−1)q⌋+1 and ⌈(n−1)q⌉+1:
 *     a broadcast join on the group key + a residual rank predicate
 *     keeps ~2·|quantiles| rows per group, and the interpolation
 *     v_lo + frac·(v_hi − v_lo) happens on those.
 *
 * Semantics match `percentile()` / DuckDB `quantile_cont` (linear
 * interpolation at position (n−1)·q over the 0-indexed sorted values):
 *  - NULL values are ignored (filtered before ranking, exactly as the
 *    aggregate ignores them);
 *  - a NULL group key is a group like any other (all joins on the
 *    group key are null-safe);
 *  - the one documented divergence: a group whose values are ALL null
 *    is omitted from the output, where `percentile()` would emit the
 *    group with a NULL percentile (keeping it would cost a distinct
 *    over the pre-filter data for an edge case callers can left-join
 *    back themselves).
 *
 * Slice bounds deliberately cover (group, value) but NOT the tie
 * columns: rows with equal (group, value) always share a slice, so tie
 * order never crosses a slice boundary — tie columns only make the
 * within-slice sort total for bit-reproducible intermediates (equal
 * values make the order statistics themselves tie-insensitive), and a
 * NULL tie value can never scatter a group across slices.
 */
object Quantiles {

  /**
   * One row per group: the named exact interpolated percentiles of
   * `valueCol` (read as double).
   *
   * @param tieCols extra order columns making the within-group sort
   *                total, so reruns rank identically (ties in the
   *                value column never change the order statistics
   *                themselves)
   * @param quantiles (output column name, q in [0,1]) pairs
   */
  def exactPercentilesByGroup(df: DataFrame, groupCol: String,
      valueCol: String, tieCols: Seq[String],
      quantiles: Seq[(String, Double)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (name, q) =>
      require(q >= 0.0 && q <= 1.0, s"quantile $name: q=$q outside [0, 1]")
    }
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // percentile() ignores NULL values; tieCols keep their original
    // names (must not be named g/v/sid)
    val base = df
      .filter(col(valueCol).isNotNull)
      .select((col(groupCol).as("g") +: col(valueCol).cast("double").as("v") +:
        tieCols.map(col)): _*)
    val sliced = RangeSlice.withSliceId(base, Seq(col("g"), col("v")), parts, "sid")
    val orderCols = col("v") +: tieCols.map(col)
    // slices×groups rows: per-slice counts → per-group slice offsets;
    // the same tiny aggregate also yields per-group totals (ONE
    // data-sized aggregation feeds both, recomputed deterministically)
    val sliceCounts = sliced.groupBy(col("sid"), col("g"))
      .agg(count(lit(1)).as("cnt"))
    val wOff = Window.partitionBy(col("g")).orderBy(col("sid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val slices = sliceCounts
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("sid").as("s_sid"), col("g").as("s_g"), col("off"))
    // groups×quantiles rows: the two ranks each quantile needs
    val qArr = array(quantiles.map { case (n, q) =>
      struct(lit(n).as("qname"), lit(q).as("q")) }: _*)
    val nByGroup = sliceCounts.groupBy(col("g")).agg(sum(col("cnt")).as("n_g"))
    val want = nByGroup
      .select(col("g"), col("n_g"), explode(qArr).as("qq"))
      .select(col("g"), col("n_g"),
        col("qq.qname").as("qname"), col("qq.q").as("q"))
      .withColumn("pos", (col("n_g") - 1) * col("q"))
      .withColumn("lo_rank", floor(col("pos")).cast("long") + 1)
      .withColumn("hi_rank", ceil(col("pos")).cast("long") + 1)
      .withColumn("frac", col("pos") - floor(col("pos")))
      .select(col("g").as("w_g"), col("qname"), col("lo_rank"),
        col("hi_rank"), col("frac"))
    val wLocal = Window.partitionBy(col("sid"), col("g"))
      .orderBy(orderCols: _*)
    // null-safe on g throughout: a NULL group ranks, offsets, and
    // emits like any other (percentile() groupBy keeps the null group)
    val ranked = sliced.join(broadcast(slices),
        col("sid") === col("s_sid") && col("g") <=> col("s_g"))
      .withColumn("rnk", col("off") + row_number().over(wLocal))
    ranked.join(broadcast(want),
        col("g") <=> col("w_g") &&
          (col("rnk") === col("lo_rank") || col("rnk") === col("hi_rank")))
      .select(col("g"), col("qname"), col("frac"), col("v"),
        col("rnk"), col("lo_rank"), col("hi_rank"))
      .groupBy(col("g"), col("qname"), col("frac"))
      .agg(max(when(col("rnk") === col("lo_rank"), col("v"))).as("v_lo"),
        max(when(col("rnk") === col("hi_rank"), col("v"))).as("v_hi"))
      .withColumn("pct", col("v_lo") + col("frac") * (col("v_hi") - col("v_lo")))
      .groupBy(col("g"))
      .pivot("qname", quantiles.map(_._1))
      .agg(first(col("pct")))
      .withColumnRenamed("g", groupCol)
  }
}
