package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Triangle counting over an undirected pair graph — the cluster-
 * cohesion metric for a near-dup graph (a dup cluster whose pairs
 * close into triangles is a true clique of rewrites; a triangle-free
 * star is one template plus satellites), and the classic test of
 * whether a graph operator survives skew.
 *
 * Degree-ordered orientation (the standard scalable shape): rank
 * every node by (degree, id), orient each edge from the lower to the
 * higher rank, generate wedges from each node's ORIENTED out-edges
 * only, and close them against the oriented edge set. Oriented
 * out-degree is O(√m) regardless of raw degree — a celebrity node of
 * raw degree d contributes d·(d−1)/2 raw wedges but only its
 * low-ranked neighbors generate from it — so the wedge join cannot
 * explode on skew the way a naive neighbor self-join does. Each
 * triangle is generated EXACTLY once (from its lowest-ranked vertex).
 *
 * The wedge total Σ d_o·(d_o−1)/2 is computed eagerly BEFORE the
 * join is planned and refused over `maxWedges` BY NAME — the
 * ScaleGuard contract shared with `graph_butterflies`.
 */
object Triangles {

  /** @return one row: n_nodes, n_edges, n_wedges (oriented),
    *         n_triangles */
  def triangleCount(pairs: DataFrame, aCol: String, bCol: String,
      maxWedges: Long = -2L): DataFrame = {
    // default (-2 sentinel) resolves through the unified budget
    // namespace; an explicit param still wins for programmatic callers
    val wedgeBudget =
      if (maxWedges != -2L) maxWedges
      else Budget.long(pairs.sparkSession, Budget.MaxWedges, 2000000000L)
    val edges = Dedup.materialize(pairs.select(
        least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct())
    val deg = edges.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient by (degree, id); carry the hi endpoint's rank so the
    // wedge join can order its two legs without re-joining degrees
    val oriented = Dedup.materialize(edges
      .join(deg.select(col("n").as("u"), col("d").as("du"))
        .hint("shuffle_hash"), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv"))
        .hint("shuffle_hash"), "v")
      .select(when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("lo"), col("v").as("hi"),
            struct(col("dv").as("rd"), col("v").as("rn")).as("hiR")))
        .otherwise(struct(col("v").as("lo"), col("u").as("hi"),
          struct(col("du").as("rd"), col("u").as("rn")).as("hiR"))).as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"), col("e.hiR").as("hiR")))
    // eager wedge guard — refuse over-budget inputs BY NAME before
    // the quadratic stage is planned (ScaleGuard contract)
    val guard = oriented.groupBy(col("lo")).agg(count(lit(1)).as("d"))
      .agg(coalesce(sum(expr("d * (d - 1) div 2")), lit(0L)).as("nw"))
      .head().getLong(0)
    // -1 disables the guard, per the Budget-namespace contract every
    // other guard in the repo honors (ScaleGuard, Multimodal)
    if (wedgeBudget >= 0L) require(guard <= wedgeBudget,
      s"triangleCount: $guard oriented wedges exceeds maxWedges=$wedgeBudget" +
        " — raise the budget explicitly or pre-filter the pair graph")
    val wedges = oriented.select(col("lo").as("x"), col("hi").as("y"),
        col("hiR").as("yR"))
      .join(oriented.select(col("lo").as("x"), col("hi").as("z"),
        col("hiR").as("zR")).hint("shuffle_hash"), "x")
      .filter(col("yR") < col("zR"))
      .select(col("y").as("lo"), col("z").as("hi"))
    val tri = wedges.join(oriented.select(col("lo"), col("hi"))
        .hint("shuffle_hash"), Seq("lo", "hi"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val counts = edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
    counts.crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), lit(guard).as("n_wedges"),
        col("n_triangles"))
  }
}
