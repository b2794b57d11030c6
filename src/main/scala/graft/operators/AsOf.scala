package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * As-of (point-in-time) joins — the enrichment shape a streaming
 * pipeline needs when attaching "the latest dimension row as of this
 * event's time".
 *
 * Both forms are single-shuffle: rows are co-partitioned on the join
 * key and ordered by time within partitions; the match is a running
 * window aggregate, never a per-row probe. This is the sort-merge
 * as-of strategy — it scales linearly in rows per key and never
 * broadcasts the fact side.
 */
object AsOf {

  /**
   * Self as-of: for each row, the most recent *earlier* time in the
   * same partition (strictly earlier — ties excluded via a range frame
   * ending at -1), plus how many earlier rows exist. Deterministic
   * under duplicate timestamps.
   */
  def selfAsOf(df: DataFrame, partCol: String, timeCol: String): DataFrame = {
    // cast: parquet TIMESTAMP_NTZ columns aren't accepted by unix_micros
    val tUs = unix_micros(col(timeCol).cast("timestamp"))
    val w = Window.partitionBy(col(partCol)).orderBy(tUs)
      .rangeBetween(Window.unboundedPreceding, -1)
    df.withColumn("prev_time_us", max(tUs).over(w))
      .withColumn("n_prior", count(lit(1)).over(w))
  }

  /**
   * General as-of join: enrich each left row with the value column of
   * the latest right row (same key, right.time <= left.time).
   * Implemented as union + running last-non-null — one shuffle on the
   * key, no correlated probes. At equal times the right row wins
   * (is_right sorts first).
   */
  def asOfJoin(left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val l = left.withColumn("_t", unix_micros(col(leftTime).cast("timestamp")))
      .withColumn("_is_right", lit(1))
    val leftCols = left.columns
    val r = right.select(
      (col(key) +: col(rightTime).as(leftTime) +: valueCols.map(col)): _*)
      .withColumn("_t", unix_micros(col(leftTime).cast("timestamp")))
      .withColumn("_is_right", lit(0))
    val unioned = l.select(
        (leftCols.map(col) :+ col("_t") :+ col("_is_right")) ++
          valueCols.map(c => lit(null).cast(r.schema(c).dataType).as(c)): _*)
      .unionByName(
        r.select(
          (leftCols.map(c => if (c == key || c == leftTime) col(c)
            else lit(null).cast(l.schema(c).dataType).as(c)) :+
            col("_t") :+ col("_is_right")) ++ valueCols.map(col): _*))
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_is_right"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_is_right") === 1).drop("_t", "_is_right")
  }
}
