package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

/**
 * Deterministic range slicing via driver-sampled LITERAL bounds — the
 * fault-tolerant replacement for the "repartitionByRange +
 * spark_partition_id + localCheckpoint" pattern the distributed
 * prefix-sum operators (exact percentiles, ntile spread, sequence
 * packing) used through round 6.
 *
 * That pattern had a scale-killer hiding in it: the checkpoint was
 * load-bearing (two plan branches had to observe the SAME physical
 * partition ids, and `spark_partition_id()` is nondeterministic across
 * recomputes), so the ENTIRE table was materialized into
 * executor-local storage, and losing one executor afterwards killed
 * the job — a near-certainty for long jobs on 1000 executors.
 *
 * This helper makes the slice id a PURE FUNCTION of the row instead of
 * an artifact of physical execution:
 *
 *  1. sample up to `sampleSize` rows of the key columns — chosen by
 *     hash order (`xxhash64`), so the sample is pseudo-random yet
 *     fully deterministic: same data → same sample → same bounds →
 *     same plan literals (plan-fingerprint stable, no RNG);
 *  2. pick `slices − 1` evenly spaced order statistics of the sample
 *     as inclusive upper bounds — collected driver-side, they are
 *     model parameters (≤ a few KB), exactly like k-means centroids
 *     or CMS blobs elsewhere in this library;
 *  3. emit a balanced `when`-tree binary search over literal struct
 *     bounds: O(log slices) comparisons per row, whole-stage codegen,
 *     no shuffle, no checkpoint, recompute-safe.
 *
 * Ordering contract: for non-null keys, `key(r1) < key(r2)` (Spark
 * struct ordering) implies `slice(r1) <= slice(r2)`. Rows with a NULL
 * in any key column all land in slice 0, consistent with Spark's
 * default ascending nulls-first sort — so "slice id, then an ORDER BY
 * within the slice" still walks rows in global sort order.
 *
 * Bounds quality affects only BALANCE, never correctness: with no
 * usable sample (empty input) everything lands in slice 0 and
 * downstream windows degrade to one partition — correct, just serial.
 *
 * NOTE: calling this runs a small Spark job (the sample collect) at
 * DataFrame-CONSTRUCTION time — the established model-parameter
 * pattern (cf. heavyHitters, ivfProbe); plan-only consumers pay one
 * bounded sample job.
 */
object RangeSlice {

  /**
   * A deterministic slice id in [0, slices) for each row of `df`,
   * monotone in the struct order of `keys`.
   *
   * @param keys    key columns defining the order (null keys → slice
   *                0); atomic orderable types (string / numeric /
   *                date / timestamp / binary)
   * @param slices  target slice count — typically
   *                spark.sql.shuffle.partitions
   */
  def sliceExpr(df: DataFrame, keys: Seq[Column], slices: Int,
      sampleSize: Int = 8192): Column = {
    require(keys.nonEmpty, "need at least one key column")
    require(slices >= 1, s"slices must be >= 1, got $slices")
    val named = keys.zipWithIndex.map { case (c, i) => c.as(s"k$i") }
    val kRefs = keys.indices.map(i => col(s"k$i"))
    // deterministic pseudo-random sample: global top-N by key hash
    // (TakeOrderedAndProject — one scan, per-partition top-N, driver
    // merge of N rows); the trailing key columns make the order total
    // so hash ties can't make the sample run-dependent
    val sampled = df.select(named: _*)
      .filter(kRefs.map(_.isNotNull).reduce(_ && _))
      .orderBy((xxhash64(kRefs: _*) +: kRefs): _*)
      .limit(sampleSize)
    // rank the sample by the keys with Spark's OWN ordering semantics
    // (single-partition window over <= sampleSize rows — a sample,
    // never the data), so driver code needs no Ordering for the types
    val ranked = sampled
      .withColumn("rn", row_number().over(Window.orderBy(kRefs: _*)))
      .orderBy(col("rn"))
      .collect()
    val n = ranked.length
    val fieldTypes = keys.indices.map(i => sampled.schema(s"k$i").dataType)
    // slices-1 evenly spaced order statistics; consecutive duplicates
    // collapse (heavy ties → fewer, still strictly increasing bounds)
    val boundRows = (1 until slices).iterator
      .map(j => (j.toLong * n / slices).toInt)
      .filter(i => i >= 0 && i < n)
      .map(ranked(_))
      .toSeq.distinct
    val kStruct = struct(named: _*)
    val bounds = boundRows.map { r =>
      struct(fieldTypes.zipWithIndex.map { case (dt, i) =>
        ColumnBridge.column(Literal.create(r.get(i), dt)).as(s"k$i")
      }: _*)
    }
    // balanced binary search: slice i owns keys in (bounds(i-1), bounds(i)]
    def tree(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo)
      else {
        val mid = (lo + hi) / 2
        when(kStruct <= bounds(mid), tree(lo, mid)).otherwise(tree(mid + 1, hi))
      }
    val body = if (bounds.isEmpty) lit(0) else tree(0, bounds.length)
    when(keys.map(_.isNull).reduce(_ || _), lit(0)).otherwise(body)
  }
}
