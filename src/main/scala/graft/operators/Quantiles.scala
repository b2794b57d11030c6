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
 *  1. range-partition rows by (group, value, ties) — Spark samples
 *     range bounds, so partitions are balanced regardless of group
 *     skew and a group may span many partitions;
 *  2. global rank within each group = per-(partition, group) counts
 *     (a partitions×groups-sized aggregate) cumulated into offsets +
 *     a partition-local row_number — the seq_pack/q_ntile_spread
 *     prefix-sum pattern, no single-partition sort anywhere;
 *  3. each quantile q needs only ranks ⌊(n−1)q⌋+1 and ⌈(n−1)q⌉+1:
 *     a broadcast join on the group key + a residual rank predicate
 *     keeps ~2·|quantiles| rows per group, and the interpolation
 *     v_lo + frac·(v_hi − v_lo) happens on those.
 *
 * Semantics match `percentile()` / DuckDB `quantile_cont` (linear
 * interpolation at position (n−1)·q over the 0-indexed sorted values).
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
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // checkpoint pins partition ids: the offsets branch and the ranking
    // branch must observe the SAME range partitioning. tieCols must not
    // be named g/v/pid (they keep their original names here).
    val base = df
      .select((col(groupCol).as("g") +: col(valueCol).cast("double").as("v") +:
        tieCols.map(col)): _*)
    val orderCols = col("v") +: tieCols.map(col)
    val repartitioned = base
      .repartitionByRange(parts, (col("g") +: orderCols): _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    // partitions×groups rows: per-slice counts → per-group slice
    // offsets; the same tiny table also yields per-group totals (ONE
    // data-sized aggregation feeds both)
    val wOff = Window.partitionBy(col("g")).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sliceCounts = repartitioned.groupBy(col("pid"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // tiny; read by both branches below
    val slices = sliceCounts
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("pid"), col("g"), col("off"))
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
      .select(col("g"), col("qname"), col("lo_rank"), col("hi_rank"),
        col("frac"))
    val wLocal = Window.partitionBy(col("pid"), col("g"))
      .orderBy(orderCols: _*)
    val ranked = repartitioned.join(broadcast(slices), Seq("pid", "g"))
      .withColumn("rnk", col("off") + row_number().over(wLocal))
    ranked.join(broadcast(want),
        ranked("g") === want("g") &&
          (col("rnk") === col("lo_rank") || col("rnk") === col("hi_rank")))
      .select(ranked("g"), col("qname"), col("frac"), col("v"),
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
