package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/**
 * Banded range join: `left ⋈ right ON key AND right.time ∈
 * [left.time, left.time + window]`.
 *
 * Spark plans a raw range predicate as a broadcast-nested-loop (or
 * per-key cartesian) — quadratic in rows per key. Bucketizing both
 * sides to window-sized bands turns it into an equi-join on
 * (key, band): each left row probes its own band and the next one,
 * then the exact predicate refines. Shuffle is keyed and linear; the
 * quadratic blowup is confined to rows sharing a band.
 *
 * This is deliberately tier-(a) of the custom-operator ladder —
 * composition of built-ins — because the semantics ARE expressible;
 * a custom SparkPlan would buy nothing Catalyst doesn't already do
 * for the equi-join.
 */
object RangeJoin {

  def within(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, windowUs: Long): DataFrame = {
    val lb = left
      .withColumn("_lt", unix_micros(col(leftTime).cast("timestamp")))
      .withColumn("_band", explode(array(
        (col("_lt") / windowUs).cast("long"),
        (col("_lt") / windowUs).cast("long") + 1)))
    val rb = right
      .withColumn("_rt", unix_micros(col(rightTime).cast("timestamp")))
      .withColumn("_band", (col("_rt") / windowUs).cast("long"))
    lb.join(rb, Seq(key, "_band"))
      .filter(col("_rt") >= col("_lt") && col("_rt") <= col("_lt") + windowUs)
      .drop("_band")
  }
}
