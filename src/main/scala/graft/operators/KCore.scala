package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * k-core peeling over an undirected graph — the degeneracy screen
 * graph pipelines run before community/fraud analysis: repeatedly
 * remove every node with fewer than k live neighbors until the
 * remaining subgraph (the k-core) is stable, and report WHEN each
 * node fell (its peel round), which orders the periphery by how
 * tenuously it was attached.
 *
 * Iterative DataFrame loop, one round = one degree aggregate over the
 * live edge set + one anti-join (the CC/PageRank loop shape — all
 * shuffles keyed on node, no driver-side graph, loop state
 * materialized through [[Dedup.materializeLoop]] so the
 * `spark.graft.checkpointDir` durability conf covers it). Rounds are
 * data-dependent but each is strictly smaller than the last; the
 * per-round convergence probe is one count on the (checkpointed,
 * node-sized) survivor set the degree aggregate already produced — a
 * round costs exactly two checkpoint jobs plus that count, and the
 * peeled accumulator is never re-materialized (per-round dead sets
 * are disjoint and union lazily at the end). Skew-safe by construction: unlike wedge/triangle generation
 * nothing here is quadratic in degree — a celebrity node costs its
 * degree in edge rows, never degree².
 *
 * `maxRounds` bounds the loop: nodes still alive after it report
 * peel round 0 ("in the core as of R rounds"), which makes the
 * output EXACT for any R — the registry query pins R so the DuckDB
 * oracle can unroll the same number of rounds; a converged run
 * (every tested SF converges well inside it) reports the true
 * k-core.
 */
object KCore {

  /**
   * @param pairs undirected edges, one row per edge (endpoints in
   *              `aCol`/`bCol`; self-loops dropped, duplicates merged)
   * @return (node, peeled_round): 1-based round the node was peeled,
   *         0 for k-core members
   */
  def kCorePeel(pairs: DataFrame, aCol: String, bCol: String, k: Int,
      maxRounds: Int = 64): DataFrame = {
    val spark = pairs.sparkSession
    val edges = Dedup.materialize(pairs
      .select(col(aCol).cast("string").as("u"), col(bCol).cast("string").as("v"))
      .filter(col("u") =!= col("v")).distinct())
    // directed adjacency (both directions): degree = count of out rows
    var live = Dedup.materialize(
      edges.union(edges.select(col("v"), col("u"))))
    var alive = Dedup.materializeLoop(
      live.select(col("u").as("node")).distinct())
    var aliveCount = alive.count()
    // the per-round dead sets are DISJOINT by construction (each is a
    // subset of the previous alive minus the next), so they accumulate
    // lazily — plans rooted at the two checkpointed frontiers they
    // anti-join — and union ONCE at the end. Checkpointing the monotone
    // accumulator every round (the pre-r10 shape) paid
    // O(rounds × peeled-size) checkpoint I/O for state the frontiers
    // already determine.
    var deadSets = List.empty[DataFrame]
    var round = 1
    var converged = false
    while (!converged && round <= maxRounds) {
      val survivors = Dedup.materializeLoop(
        live.groupBy(col("u").as("node"))
          .agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select(col("node")))
      // convergence from the survivor count the degree aggregate just
      // computed (a metadata-cheap count on the checkpointed result) —
      // no separate dead.isEmpty job per round
      val survivorCount = survivors.count()
      if (survivorCount == aliveCount) converged = true
      else {
        // shuffle-hash-pinned: node-sized vs node-sized, the AQE
        // build-side plan-flip class
        deadSets ::= alive
          .join(survivors.hint("shuffle_hash"), Seq("node"), "left_anti")
          .withColumn("peeled_round", lit(round))
        alive = survivors
        aliveCount = survivorCount
        // edges survive iff BOTH endpoints do (two keyed semi joins)
        live = Dedup.materializeLoop(live
          .join(alive.withColumnRenamed("node", "u").hint("shuffle_hash"),
            Seq("u"), "left_semi")
          .join(alive.withColumnRenamed("node", "v").hint("shuffle_hash"),
            Seq("v"), "left_semi"))
        round += 1
      }
    }
    deadSets.foldLeft(alive.withColumn("peeled_round", lit(0)))(
      _ unionByName _).orderBy(col("node"))
  }
}
