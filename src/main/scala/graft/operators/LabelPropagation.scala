package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Synchronous label propagation (LPA, Raghavan et al. 2007) —
 * community detection by neighbor-majority vote: each round, every
 * node adopts the most frequent label among its neighbors, ties
 * broken to the smallest label. A FIXED round count with synchronous
 * updates keeps the result deterministic (asynchronous/converging
 * variants depend on visit order and scheduling — unacceptable for a
 * registry whose contract is bit-identical reruns) and lets an oracle
 * unroll the rounds as CTEs.
 *
 * Scale shape: a round is one keyed join (labels onto edge
 * endpoints), one (node,label) count with map-side partials, and one
 * per-node argmax window — all shuffles on node keys; the label
 * relation stays node-sized and the window partitions by node (its
 * group is bounded by the node's distinct neighbor labels, never
 * global). Node-sized joins are shuffle-hash-pinned: both sides can
 * sit under the broadcast threshold at test SF, and AQE would
 * otherwise pick the build side by stage completion order — a
 * run-to-run plan flip; at corpus scale node relations are never
 * broadcastable anyway and hash beats merge (no per-round sorts).
 */
object LabelPropagation {

  /**
   * @param edges  undirected edge list, one row per edge (both
   *               orientations are derived internally; self-loops and
   *               duplicate rows are fine — duplicates act as edge
   *               weights in the vote)
   * @param rounds fixed synchronous rounds (plan depth grows linearly;
   *               callers running many rounds should truncate lineage
   *               with [[Dedup.materializeLoop]] every ~8 rounds, the
   *               graphPageRank pattern)
   * @return (node, label) — the label after `rounds` rounds; initial
   *         label = the node id itself
   */
  def lpa(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame =
    lpaLabels(edges, srcCol, dstCol, rounds).orderBy(col("node"))

  /** [[lpa]] without the presentation sort — the form downstream
    * consumers (modularity scoring) compose with, so no global sort
    * executes mid-plan just to be discarded by the next shuffle. */
  def lpaLabels(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val und = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
    var labels = und.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      val cnt = und
        .join(labels.withColumnRenamed("node", "b").hint("shuffle_hash"), "b")
        .groupBy(col("a").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("node"))
        .orderBy(col("c").desc, col("label"))
      labels = cnt.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("node"), col("label"))
    }
    labels
  }
}
