package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Snapshot reconciliation by bucketed checksums — the "did the copy
 * drift" primitive for replicated/derived tables. Comparing two 100 TB
 * snapshots row-by-row is a full shuffle join of both; comparing
 * per-bucket (count, checksum-sum) aggregates touches each side once
 * with map-side partial aggregation and ships O(buckets) rows. A
 * mismatched bucket then scopes the expensive row-level diff to
 * 1/buckets of the data.
 *
 * The checksum must be per-row deterministic and ADDITIVE (sums
 * commute), so a plain arithmetic fold over the row's fields works and
 * any engine can recompute it — the DuckDB oracle mirrors it in SQL.
 *
 * The bucket sum accumulates in DECIMAL(38,0) and is reduced
 * `pmod 2⁶¹−1` into the published long: a raw long sum of per-row
 * checksums OVERFLOWS once buckets hold ~10⁴+ rows of ~10¹⁵ row
 * checksums (found by the sf10 sweep — 234k-row buckets at
 * production-sized keys threw ARITHMETIC_OVERFLOW under ANSI).
 * Decimal partial aggregation is map-side combinable like any sum,
 * the 128-bit accumulator holds ~10²³ row-checksums per bucket, and
 * the Mersenne-prime modulus keeps the reduction additive and
 * portable: any engine that sums exactly (DuckDB HUGEINT, Spark
 * decimal) lands on the same residue for nonnegative checksums.
 */
object Reconcile {

  /** 2⁶¹ − 1 (Mersenne prime): checksum sums are published mod this. */
  val ChecksumMod = 2305843009213693951L

  /**
   * Per-bucket (row count, checksum sum mod 2⁶¹−1) for one snapshot.
   *
   * @param df snapshot
   * @param keyCol long key column; `key % buckets` is the bucket
   * @param checksum per-row nonnegative checksum expression
   *                 (engine-portable arithmetic, e.g.
   *                 key * prime + value-in-cents; cast to decimal
   *                 inside the expression if a single row can exceed
   *                 long range)
   */
  def bucketSummary(df: DataFrame, keyCol: String, checksum: Column,
      buckets: Int): DataFrame =
    df.groupBy(pmod(col(keyCol), lit(buckets.toLong)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        pmod(sum(checksum.cast("decimal(38,0)")), lit(ChecksumMod))
          .cast("long").as("checksum"))

  /**
   * Buckets where two snapshots disagree, with both sides' counts and
   * checksums and a coarse diff kind (`rows` = cardinality changed,
   * `content` = same rows count but different values).
   *
   * Implementation note: the two summaries are UNIONed with a side tag
   * and re-aggregated by bucket rather than joined — both summaries
   * are O(buckets) rows, i.e. both under any broadcast threshold, and
   * a tiny-vs-tiny join lets AQE pick the build side by stage-arrival
   * order (a real run-to-run plan flip; see dedup_components). The
   * union form is one deterministic shuffle on `bucket` and stays the
   * right plan at every scale.
   */
  def diff(base: DataFrame, current: DataFrame, keyCol: String,
      checksum: Column, buckets: Int): DataFrame = {
    val b = bucketSummary(base, keyCol, checksum, buckets)
      .select(col("bucket"), lit("b").as("side"), col("n"), col("checksum"))
    val c = bucketSummary(current, keyCol, checksum, buckets)
      .select(col("bucket"), lit("c").as("side"), col("n"), col("checksum"))
    b.unionByName(c)
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("side") === "b", col("n"))).as("base_n"),
        sum(when(col("side") === "c", col("n"))).as("cur_n"),
        sum(when(col("side") === "b", col("checksum"))).as("base_checksum"),
        sum(when(col("side") === "c", col("checksum"))).as("cur_checksum"))
      .select(col("bucket"),
        coalesce(col("base_n"), lit(0L)).as("base_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"),
        coalesce(col("base_checksum"), lit(0L)).as("base_checksum"),
        coalesce(col("cur_checksum"), lit(0L)).as("cur_checksum"))
      .filter(col("base_n") =!= col("cur_n") ||
        col("base_checksum") =!= col("cur_checksum"))
      .withColumn("diff_kind",
        when(col("base_n") =!= col("cur_n"), lit("rows"))
          .otherwise(lit("content")))
      .orderBy(col("bucket"))
  }
}
