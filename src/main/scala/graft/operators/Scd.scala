package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension builders — turning an append-only event
 * log into the validity-interval table (SCD Type 2) that dimension
 * joins and as-of lookups consume. The reference pipeline stops at
 * append-only tables (`FileOutput.py` writes immutable slot ranges);
 * interval-izing a change log is the downstream step every warehouse
 * consumer of it performs.
 *
 * Scale shape: both stages are windows partitioned by the entity key
 * and ordered by time — ONE hash shuffle on the key, no joins, no
 * global sort. Per-key history is bounded by that key's own event
 * count, so 1000 executors split the key space evenly and a skewed
 * entity is bounded by its log length, not the corpus.
 */
object Scd {

  /**
   * SCD Type-2 interval build: collapse consecutive rows with the same
   * tracked attribute value into one row per value-run, stamped with
   * `[effective_from, effective_to)` and an `is_current` flag for the
   * open interval.
   *
   * Change detection is `lag` over (key, time, tie) — the tie column
   * makes the order total so reruns and repartitioning reproduce the
   * same intervals bit-for-bit. `effective_to` is the NEXT change's
   * start (`lead` over the filtered change rows), half-open so
   * interval joins never double-count a boundary instant.
   *
   * @param df     change log
   * @param keyCol entity key column
   * @param attrCol tracked attribute (a new interval starts when it changes)
   * @param tsCol  event-time column (any orderable type)
   * @param tieCol total-order tie-break within equal timestamps
   */
  def scd2(df: DataFrame, keyCol: String, attrCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val changes = df
      .withColumn("prev_attr", lag(col(attrCol), 1).over(order))
      // first row per key always opens an interval; a null attribute is
      // a legal tracked value, so detect "has a predecessor" with a
      // constant-lag marker instead of prev_attr's own nullness
      .withColumn("has_prev", lag(lit(1), 1).over(order).isNotNull)
      .filter(!col("has_prev") || !(col("prev_attr") <=> col(attrCol)))
    changes
      .withColumn("effective_to", lead(col(tsCol), 1).over(order))
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("effective_from"), col("effective_to"))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
