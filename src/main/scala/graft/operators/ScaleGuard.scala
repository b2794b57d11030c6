package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Fail-fast guard for the exact all-pairs operators. Three registry
 * queries (`knn_join`, `dedup_embedding`, `dedup_semantic`'s pair
 * stage) are intentionally quadratic: they are the oracle anchors the
 * blocked/LSH siblings are measured against. At test SF they are the
 * correctness evidence; at corpus scale they are the queries a user
 * must NOT run — n²/2 dot products over 10⁹ rows is not a slow query,
 * it's a cluster outage.
 *
 * So the anchors refuse to start above a row threshold, naming the
 * blocked sibling that computes the same thing with candidate
 * generation by equi-join. The threshold is a session conf
 * (`spark.graft.allPairs.maxRows`, default 100k ≈ 5·10⁹ candidate
 * pairs — already generous); set it to -1 to disable (e.g. for an
 * intentional exact sweep on a sized-for-it cluster).
 *
 * The guard costs one `count()` of the input, executed EAGERLY at
 * DataFrame-construction time (so even building the plan runs a job —
 * ScaleGuardSpec pins it at exactly one). Against a bare parquet
 * source that count is metadata-cheap (row-group counts, no data
 * read); against a DERIVED frame it re-executes the upstream plan —
 * a caller composing an anchor over an expensive pipeline should
 * `.persist()` the input first (the count then doubles as the
 * materializing action) or disable the guard for that call. With the
 * guard disabled (-1), construction runs NO job at all — the fan-out
 * repartition below is lazy.
 */
object ScaleGuard {

  val ConfKey = "spark.graft.allPairs.maxRows"
  val DefaultMaxRows = 100000L

  /** Returns `df` (repartitioned for the pair stage, see below) if it
    * is small enough for an all-pairs stage; throws (naming
    * `scaleSibling`) otherwise. */
  def allPairs(df: DataFrame, op: String, scaleSibling: String): DataFrame = {
    val max = Budget.long(df.sparkSession, Budget.AllPairsMaxRows,
      DefaultMaxRows, legacyKey = Some(ConfKey))
    if (max >= 0L) {
      val n = df.count()
      if (n > max) throw new IllegalStateException(
        s"$op is exact all-pairs (O(n²)) and its input has $n rows " +
          s"(limit $max). It exists as the oracle anchor for " +
          s"'$scaleSibling' — use that blocked form at this scale, or " +
          s"raise/disable the limit via spark conf '$ConfKey'.")
    }
    // The pair stage is quadratic in ROWS but its task count is
    // inherited from the INPUT partitioning: a guard-sized table is
    // typically ONE parquet file, so the n²/2 nested loop would run on
    // 1-2 tasks regardless of cores (observed: 20k vectors = 200M pairs
    // on 2 of 32 cores, ~10 min). Fan the stream side out to the
    // session's parallelism — UNCONDITIONALLY and LAZILY: probing the
    // current partition count via Dataset.rdd would force AQE to
    // materialize every upstream stage at construction time (re-running
    // derived inputs, and defeating the max=-1 escape hatch entirely),
    // whereas an occasionally-redundant repartition of a guard-sized
    // input is a row-count-sized shuffle — noise next to the n² work
    // it parallelizes.
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
  }
}
