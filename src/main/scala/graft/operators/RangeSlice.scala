package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

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
 *  1. sample up to `sampleSize` rows — chosen by a ROW-uniform hash
 *     order (`xxhash64` over every hashable column of `df`, not just
 *     the keys), so duplicate-heavy keys are represented
 *     proportionally to their row counts: the evenly spaced order
 *     statistics below are then COUNT-WEIGHTED, and a key holding half
 *     the rows gets half the slices' worth of the bound budget instead
 *     of collapsing the sample to a handful of distinct keys. The
 *     sample stays fully deterministic: same data → same sample →
 *     same bounds → same plan literals (no RNG);
 *  2. pick `slices − 1` evenly spaced order statistics of the sample
 *     as inclusive upper bounds — collected driver-side, they are
 *     model parameters (≤ a few KB), exactly like k-means centroids
 *     or CMS blobs elsewhere in this library. A key heavy enough to
 *     claim several bound positions is ISOLATED: its predecessor key
 *     is emitted as an extra bound so the heavy key occupies a slice
 *     alone (equal keys can never be split, but they need not drag
 *     their neighbors in). Bound count stays < 2·slices;
 *  3. project the key struct ONCE (a bound attribute, so codegen
 *     builds it once per row, and the tree's expression size is
 *     O(slices), not O(slices × key width)), then emit a balanced
 *     `when`-tree binary search over the literal struct bounds:
 *     O(log slices) comparisons per row, whole-stage codegen, no
 *     shuffle, no checkpoint, recompute-safe.
 *
 * Ordering contract (exact, all null patterns): `slice(r)` is
 * monotone in Spark's struct ordering of the key columns, which
 * compares field by field with nulls FIRST — struct comparisons
 * against the bound literals return true/false (never null) even when
 * individual key fields are null, so a row like `('m', NULL)` lands
 * exactly where the global nulls-first sort places it (start of group
 * 'm'), not in an arbitrary escape slice. "Slice id, then an ORDER BY
 * within the slice" therefore walks rows in global sort order for ANY
 * mix of null keys.
 *
 * Bounds quality affects only BALANCE, never correctness: with no
 * usable sample (empty input) everything lands in slice 0 and
 * downstream windows degrade to one partition — correct, just serial.
 *
 * PRECONDITIONS (same class Spark itself has for recompute):
 *  - `df`'s lineage must be DETERMINISTIC. The slice id is recomputed
 *    independently by every plan branch that uses it; if `df` contains
 *    `rand()`/`sample()`/a non-idempotent source, branches can observe
 *    different rows and downstream offsets/ranks silently diverge.
 *    Persist or materialize nondeterministic inputs first.
 *  - The sample job reads every hashable column of `df` (that is what
 *    makes it row-uniform). Callers are expected to pass a NARROW
 *    projection — all three in-repo callers do — so the construction
 *    scan prunes to the columns the operator touches anyway.
 *
 * NOTE: calling this runs a small Spark job (the sample collect) at
 * DataFrame-CONSTRUCTION time — the established model-parameter
 * pattern (cf. heavyHitters, ivfProbe); plan-only consumers pay one
 * bounded sample job.
 */
object RangeSlice {

  /** Map types are not hashable in Spark (and need no legacy flag
   *  here): exclude them — recursively — from the row-uniform hash. */
  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType    => false
    case s: StructType => s.fields.forall(f => hashable(f.dataType))
    case a: ArrayType  => hashable(a.elementType)
    case _             => true
  }

  /**
   * `df` plus a deterministic slice-id column `out` in [0, slices),
   * monotone in the struct order of `keys`.
   *
   * @param keys    key columns defining the order; atomic orderable
   *                types (string / numeric / date / timestamp /
   *                binary), nullable fine (nulls-first, see above)
   * @param slices  target slice count — typically
   *                spark.sql.shuffle.partitions
   */
  def withSliceId(df: DataFrame, keys: Seq[Column], slices: Int,
      out: String, sampleSize: Int = 8192): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(slices >= 1, s"slices must be >= 1, got $slices")
    val named = keys.zipWithIndex.map { case (c, i) => c.as(s"k$i") }
    val kRefs = keys.indices.map(i => col(s"k$i"))
    // row-uniform deterministic sample: global top-N by a hash of the
    // WHOLE row (TakeOrderedAndProject — one scan, per-partition
    // top-N, driver merge of N rows). The trailing key columns break
    // hash ties across distinct keys; rows equal in (hash, keys) are
    // interchangeable w.r.t. the bounds, so the sample content is
    // deterministic either way.
    val discCols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => col(f.name))
    val sampled = df
      .select((named :+ xxhash64(discCols: _*).as("_rs_h")): _*)
      .orderBy((col("_rs_h") +: kRefs): _*)
      .limit(sampleSize)
      .drop("_rs_h")
    // rank the sample by the keys with Spark's OWN ordering semantics
    // (single-partition window over <= sampleSize rows — a sample,
    // never the data), so driver code needs no Ordering for the types
    val ranked = sampled
      .withColumn("rn", row_number().over(Window.orderBy(kRefs: _*)))
      .orderBy(col("rn"))
      .collect()
    val n = ranked.length
    val fieldTypes = keys.indices.map(i => sampled.schema(s"k$i").dataType)
    // slices-1 evenly spaced order statistics, deduped per KEY-run,
    // with HEAVY-KEY ISOLATION: when two or more bound positions land
    // inside one key's run (a key owning >= 1/slices of the rows),
    // equal keys can't be split — but the key CAN be isolated into its
    // own slice by also emitting its predecessor key as a bound.
    // Without this, a 95%-key drags everything below it into one slice
    // and the whole point (full parallelism) is lost.
    def keyEq(a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row): Boolean =
      keys.indices.forall { i =>
        (a.get(i), b.get(i)) match {
          case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
          case (x, y) => x == y
        }
      }
    def runStart(p: Int): Int = {
      var s = p
      while (s > 0 && keyEq(ranked(s - 1), ranked(p))) s -= 1
      s
    }
    val chosen = scala.collection.mutable.SortedSet[Int]()
    var prevStart = -1
    (1 until slices).iterator
      .map(j => (j.toLong * n / slices).toInt)
      .filter(i => i >= 0 && i < n)
      .foreach { p =>
        val s = runStart(p)
        // second+ hit on the same run: bound the predecessor key so
        // the heavy key's slice contains the heavy key alone
        if (s == prevStart && s > 0) chosen += runStart(s - 1)
        chosen += s
        prevStart = s
      }
    val boundRows = chosen.toSeq.map(ranked(_))
    val bounds = boundRows.map { r =>
      struct(fieldTypes.zipWithIndex.map { case (dt, i) =>
        ColumnBridge.column(Literal.create(r.get(i), dt)).as(s"k$i")
      }: _*)
    }
    // the key struct is projected ONCE and referenced by attribute in
    // every tree node — without this the struct construction would be
    // repeated O(slices) times inside one expression
    val kField = "_rs_key"
    val kCol = col(kField)
    // balanced binary search: slice i owns keys in (bounds(i-1), bounds(i)]
    def tree(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo)
      else {
        val mid = (lo + hi) / 2
        when(kCol <= bounds(mid), tree(lo, mid)).otherwise(tree(mid + 1, hi))
      }
    val body = if (bounds.isEmpty) lit(0) else tree(0, bounds.length)
    df.withColumn(kField, struct(named: _*))
      .withColumn(out, body)
      .drop(kField)
  }
}
