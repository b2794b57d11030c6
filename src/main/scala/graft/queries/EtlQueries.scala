package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Reconcile

/**
 * §B — the reference's ETL semantics (zuyezheng/solana-etl) re-expressed
 * as declarative Spark plans over the testdata star schema.
 *
 * The reference walks nested block JSON imperatively (Python object
 * model, per-row loops: `src/load/TransformTask.py:19-103`,
 * `src/transform/Transaction.py`, `src/transform/Transfer.py`). Here
 * each of those semantics is a whole-relation DataFrame transform —
 * grouped/conditional aggregation, typed sub-record filtering,
 * explode-with-position — which Catalyst turns into shuffles keyed
 * exactly on the entity key (order/user/month), with map-side partial
 * aggregation. No driver-side iteration anywhere.
 */
object EtlQueries {

  /**
   * Per-parent enrichment ≈ `block_to_transactions`
   * (`TransformTask.py:19-51`): per transaction the reference counts
   * instructions/accounts, serializes the distinct program set, and
   * totals signed balance changes IN vs OUT. Mirrored per-order:
   * item counts, distinct-supplier set (sorted, joined — the
   * JSON-array analog), and IN/OUT value totals where returned items
   * ('R') are outflows.
   */
  def txEnrich(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val li  = Tables.lineitem(spark, dir)
    // money carried as DECIMAL(12,2): the signed IN/OUT sums are exact
    // integer math at any partitioning (no summation-order drift vs the
    // oracle), floated only at the output edge
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val dzero = lit(0).cast("decimal(12,2)")
    val signed = li.withColumn("signed_value",
      when(col("l_returnflag") === "R", -price).otherwise(price))
    // aggregate BELOW the join: every measure is a function of
    // lineitem columns alone, so grouping the fact table first (narrow
    // rows, one shuffle on l_orderkey) and joining the order-sized
    // result beats shuffling the wide joined rows a second time. The
    // agg output is hash-partitioned on the join key already, so the
    // sort-merge join adds no exchange on that side. num_suppliers is
    // size(collect_set) — same value as countDistinct without the
    // two-phase distinct expand.
    val itemAgg = signed.groupBy(col("l_orderkey"))
      .agg(
        count(col("l_partkey")).as("li_num_items"),
        round(sum(col("l_quantity")), 4).as("li_sum_qty"),
        sort_array(collect_set(col("l_suppkey"))).as("supp_set"),
        round(sum(when(col("signed_value") > 0, col("signed_value")).otherwise(dzero)).cast("double"), 4).as("li_value_in"),
        round(sum(when(col("signed_value") < 0, col("signed_value")).otherwise(dzero)).cast("double"), 4).as("li_value_out"))
    ord.join(itemAgg, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        coalesce(col("li_num_items"), lit(0L)).as("num_items"),
        coalesce(col("li_sum_qty"), lit(0.0)).as("sum_qty"),
        coalesce(size(col("supp_set")).cast("long"), lit(0L)).as("num_suppliers"),
        coalesce(array_join(transform(col("supp_set"), _.cast("string")), ","),
          lit("")).as("suppliers"),
        coalesce(col("li_value_in"), lit(0.0)).as("value_in"),
        coalesce(col("li_value_out"), lit(0.0)).as("value_out"))
      .orderBy(col("o_orderkey"))
  }

  /**
   * Typed sub-record extraction ≈ CoinTransfer/TokenTransfer
   * (`Transfer.py:24-72`, `Interactions.py:23-38`): filter records of
   * one (program, type), project source/destination/mint, and keep the
   * amount UNSCALED with an adjacent scale column (`NumberWithScale`).
   */
  def transferExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"),
        col("user_id").as("source"),
        get_json_object(col("props"), "$.k").cast("int").as("destination"),
        lit("credits").as("mint"),
        round(col("value") * 100, 0).cast("long").as("value"),
        lit(2).as("scale"))
      .orderBy(col("event_id"))

  /**
   * Per-group split metrics ≈ `block_info` (`TransformTask.py:84-103`):
   * the reference emits one row per block with every metric computed
   * separately over successful vs errored transactions. Mirrored
   * per-month over orders with the O/F/P status split: counts, value
   * totals, and distinct-entity counts per class — one shuffle, all
   * conditional aggregates.
   */
  def blockMetrics(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .withColumn("month", date_trunc("month", col("o_orderdate")))
    def cnt(status: String) =
      count(when(col("o_orderstatus") === status, lit(1))).as(s"n_${status.toLowerCase}")
    def value(status: String) =
      round(sum(when(col("o_orderstatus") === status, col("o_totalprice")).otherwise(0.0)), 4)
        .as(s"value_${status.toLowerCase}")
    val base = ord.groupBy(col("month"))
      .agg(count(lit(1)).as("n_orders"),
        cnt("O"), value("O"),
        cnt("F"), value("F"),
        cnt("P"), value("P"),
        count(when(col("o_orderpriority") === "1-URGENT", lit(1))).as("n_urgent"))
    // distinct customers per (month, status) WITHOUT the multi-distinct
    // aggregate rewrite: three countDistinct(when(status, custkey)) in
    // one agg go through RewriteDistinctAggregates, whose hash-map
    // group numbering permutes across sessions (the same bistable-plan
    // class profileTable hit — caught by PlanFingerprintSpec's
    // two-run check). One (month, status, custkey) dedup + plain
    // conditional counts computes the same thing deterministically,
    // and replaces the 4× Expand row multiplication with a single
    // narrow pre-aggregation.
    val custs = ord
      .select(col("month"), col("o_orderstatus"), col("o_custkey"))
      .distinct()
      .groupBy(col("month"))
      .agg(
        count(when(col("o_orderstatus") === "O", lit(1))).as("custs_o"),
        count(when(col("o_orderstatus") === "F", lit(1))).as("custs_f"),
        count(when(col("o_orderstatus") === "P", lit(1))).as("custs_p"))
    base.join(custs, Seq("month"))
      .select(col("month"), col("n_orders"),
        col("n_o"), col("value_o"), col("custs_o"),
        col("n_f"), col("value_f"), col("custs_f"),
        col("n_p"), col("value_p"), col("custs_p"),
        col("n_urgent"))
      .orderBy(col("month"))
  }

  /**
   * Signed flow aggregation ≈ `BalanceChangeAgg` ALL/ABS/IN/OUT
   * (`BalanceChange.py:43-63`): purchases flow in (+), errors flow
   * out (−); one pass computes all four aggregates per user.
   */
  def balanceInOut(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("signed",
      when(col("event_type") === "purchase", col("value"))
        .when(col("event_type") === "error", -col("value"))
        .otherwise(lit(0.0)))
    ev.groupBy(col("user_id"))
      .agg(
        round(sum(when(col("signed") > 0, col("signed")).otherwise(0.0)), 4).as("value_in"),
        round(sum(when(col("signed") < 0, col("signed")).otherwise(0.0)), 4).as("value_out"),
        round(sum(col("signed")), 4).as("value_all"),
        round(sum(abs(col("signed"))), 4).as("value_abs"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /**
   * The same IN/OUT aggregation via skew-resistant two-phase salting
   * (`operators.Salt`) — identical results, but the hot-key shuffle is
   * spread over `salts` sub-keys first. user_id has ~15 distinct
   * values: exactly the shape that serializes onto 15 reducers at
   * 100 TB without salting.
   */
  def balanceInOutSalted(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("signed",
      when(col("event_type") === "purchase", col("value"))
        .when(col("event_type") === "error", -col("value"))
        .otherwise(lit(0.0)))
    graft.operators.Salt.saltedAgg(ev, Seq("user_id"), salts = 32)(Seq(
      sum(when(col("signed") > 0, col("signed")).otherwise(0.0)).as("in_p"),
      sum(when(col("signed") < 0, col("signed")).otherwise(0.0)).as("out_p"),
      sum(col("signed")).as("all_p"),
      sum(abs(col("signed"))).as("abs_p"),
      count(lit(1)).as("n_p")))(Seq(
      round(sum(col("in_p")), 4).as("value_in"),
      round(sum(col("out_p")), 4).as("value_out"),
      round(sum(col("all_p")), 4).as("value_all"),
      round(sum(col("abs_p")), 4).as("value_abs"),
      sum(col("n_p")).as("n_events")))
      .orderBy(col("user_id"))
  }

  /**
   * Scaled-integer arithmetic ≈ `NumberWithScale` (`NumberWithScale.py`):
   * money carried as integer cents + scale, summed exactly as int64
   * (associative, drift-free at any parallelism), floated only at the
   * output edge.
   */
  def scaledDecimal(spark: SparkSession, dir: String): DataFrame = {
    // decimal-cast, not round(double*100): the double→decimal cast is the
    // single rounding step, then ×100 and the sum are exact integer math
    val cents = Tables.lineitem(spark, dir)
      .withColumn("cents",
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"))
    cents.groupBy(col("l_returnflag"))
      .agg(sum(col("cents")).as("cents_total"),
        count(lit(1)).as("n_items"))
      .withColumn("scale", lit(2))
      .withColumn("value_scaled", round(col("cents_total") / 100.0, 2))
      .orderBy(col("l_returnflag"))
  }

  /**
   * Entity classification ≈ `accounts_by_type`
   * (`Transaction.py:160-178`): rule-ordered CASE classification into
   * types, then per-type membership metrics.
   */
  def entityClassify(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .withColumn("account_type",
        when(col("c_acctbal") < 0, "delinquent")
          .when(col("c_acctbal") > 7000, "premium")
          .when(col("c_mktsegment").isin("BUILDING", "MACHINERY"), "industrial")
          .otherwise("retail"))
      .groupBy(col("account_type"))
      .agg(count(lit(1)).as("n_accounts"),
        countDistinct(col("c_nationkey")).as("n_nations"),
        round(sum(col("c_acctbal")), 4).as("total_balance"))
      .orderBy(col("account_type"))

  /**
   * Weighted edge-list aggregation ≈ `GraphBuilder` coin-transfer graph
   * (`GraphBuilder.py:1-16`): (src, dst) edges with interaction count
   * and total value. At scale this is one shuffle on the composite
   * edge key with partial aggregation.
   */
  def graphEdges(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      .agg(count(lit(1)).as("n_interactions"),
        // DECIMAL sum: exact at any partitioning, floated at the edge
        round(sum((col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(12,2)"))).cast("decimal(18,4)"))
          .cast("double"), 4).as("total_value"))
      .orderBy(col("src"), col("dst"))

  /**
   * Node degree metrics over the interaction graph ≈ what the
   * reference's `GraphBuilder` (`GraphBuilder.py:1-16`) loads into
   * neo4j: per node, in/out degree and flow totals, from the edge
   * list. One union + one keyed aggregation.
   */
  def graphDegrees(spark: SparkSession, dir: String): DataFrame = {
    // flow weights carried as DECIMAL(18,4): the sum is exact integer
    // math at any partitioning, so no summation-order drift vs the
    // oracle; floated only at the output edge
    val w = (col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1) - col("l_discount").cast("decimal(12,2)"))).cast("decimal(18,4)")
    val zero = lit(0).cast("decimal(18,4)")
    val edges = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"), w.as("w"))
    // one endpoint row per side via explode, NOT a two-branch union:
    // a union would recompute the lineitem ⋈ orders join once per
    // branch; the explode reads the joined edges once and doubles the
    // rows in-place (generator, no shuffle)
    val endpoints = edges.select(explode(array(
      struct(col("src").as("node"), lit("cust").as("side"),
        lit(1L).as("out_n"), col("w").as("out_w"),
        lit(0L).as("in_n"), zero.as("in_w")),
      struct(col("dst").as("node"), lit("supp").as("side"),
        lit(0L).as("out_n"), zero.as("out_w"),
        lit(1L).as("in_n"), col("w").as("in_w")))).as("e"))
      .select(col("e.*"))
    endpoints
      .groupBy(col("node"), col("side"))
      .agg(sum(col("out_n")).as("out_degree"),
        round(sum(col("out_w")).cast("double"), 4).as("out_value"),
        sum(col("in_n")).as("in_degree"),
        round(sum(col("in_w")).cast("double"), 4).as("in_value"))
      .orderBy(col("side"), col("node"))
  }

  /**
   * Schema'd JSON extraction ≈ `Block`/`Instruction` JSON parsing
   * (`Block.py`, `Instruction.py:150-210`): pull typed fields out of a
   * JSON string column. Codegen'd path expression, no UDF.
   */
  /**
   * Butterfly (4-cycle) counting over the bipartite interaction graph
   * — the bipartite analogue of triangle counting (the graph here is
   * customer–supplier, so triangles cannot exist; butterflies — two
   * customers sharing two suppliers — are its clustering motif, the
   * basis of bipartite clustering coefficients and community
   * detection). Exact motif counts from keyed equi-joins only:
   * wedges are generated by self-joining the DISTINCT edge set on the
   * customer side (rows = Σ_c C(deg_c, 2) — the side is chosen
   * because customer degrees are bounded by a customer's supplier
   * diversity, while supplier degrees grow with the customer
   * population), and butterflies fold per supplier-pair as C(m, 2).
   *
   * Scale contract (the ScaleGuard eager-count pattern): the wedge
   * total is computed FIRST from the degree table — a tiny
   * aggregation — and the operator refuses to plan a wedge join
   * bigger than `maxWedges`. At 100 TB the mitigations are
   * degree-capped vertex sampling or per-key wedge caps; the refusal
   * names the knob instead of silently melting the cluster.
   */
  def graphButterflies(spark: SparkSession, dir: String,
      maxWedges: Long = 2000000000L): DataFrame = {
    // materialized (conf-gated): the degree pass plus BOTH sides of
    // the wedge self-join re-derive the distinct edge list — six
    // fact-join scans in the executed plan without it, one with
    val edges = graft.operators.Dedup.materialize(
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct())
    // degree pass: n_edges + the exact wedge total (model-parameter
    // sized result, one bounded job at construction)
    val degRow = edges.groupBy(col("c")).agg(count(lit(1)).as("d"))
      .agg(sum(col("d")).as("n_edges"),
        sum(expr("d * (d - 1) div 2")).as("n_wedges"))
      .head()
    val (nEdges, nWedges) = (degRow.getLong(0), degRow.getLong(1))
    require(nWedges <= maxWedges,
      s"butterfly wedge join would generate $nWedges rows (> $maxWedges); " +
        "cap degrees or sample vertices before counting")
    // wedge join pinned shuffle-hash: both sides are the same relation
    // (identical size estimates), so an unhinted join lets AQE pick
    // the build side by stage-arrival order — a run-to-run plan flip
    val wedges = edges.join(
      edges.select(col("c"), col("s").as("s2")).hint("shuffle_hash"), "c")
      .filter(col("s") < col("s2"))
    wedges.groupBy(col("s"), col("s2")).agg(count(lit(1)).as("m"))
      .agg(count(lit(1)).as("n_supp_pairs"),
        sum(expr("m * (m - 1) div 2")).as("n_butterflies"))
      .select(lit(nEdges).as("n_edges"), lit(nWedges).as("n_wedges"),
        col("n_supp_pairs"), col("n_butterflies"))
  }

  /**
   * PageRank (damping 0.85, 5 fixed iterations) over the interaction
   * graph — the analytics step past `GraphBuilder`'s edge loading:
   * rank the graph instead of shipping it to neo4j. Iterative
   * DataFrame form: edges/out-degrees materialize once
   * (localCheckpoint), each round is one keyed join + aggregation +
   * left join back to the node set — all shuffles on node keys, no
   * driver-side graph. Fixed iteration count keeps the plan finite
   * and the oracle expressible (unrolled CTEs).
   */
  def graphPageRank(spark: SparkSession, dir: String): DataFrame = {
    // Conf-gated like every other multi-consumer materialization:
    // `spark.graft.materialize=none` keeps the lineage (fully
    // fault-tolerant recompute per consumer) for cluster deployments.
    val edges = graft.operators.Dedup.materialize(
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct())
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    // lineage is truncated every `checkpointEvery` rounds: plan depth
    // stays bounded at any iteration count (50 iterations plan like 5),
    // while short runs pay ZERO materializations — per-round eager
    // checkpoints would serialize one blocking job per iteration where
    // the windowed lineage executes as a single fused DAG (measured 3×
    // slower per-round at 5 iterations).
    val iterations = 5
    val checkpointEvery = 8
    // Join-strategy determinism: every node×node join here has BOTH
    // sides under the broadcast threshold at test SF, so AQE picks the
    // build side by whichever query stage materializes first — a
    // genuine run-to-run plan flip (BuildLeft ↔ BuildRight, caught by
    // the bench fingerprints). The `shuffle_hash` hint pins both the
    // strategy and the build side (the hinted relation builds), and is
    // the shape these joins need at corpus scale anyway (node-sized
    // relations are never broadcastable; hash beats merge here — no
    // per-iteration sorts of the rank/edge tables).
    // The out-degree join is LOOP-INVARIANT, so ranks carries `odeg`
    // as a column from the start instead of re-joining per iteration —
    // one join replaces `iterations` of them.
    var ranks = nodes
      .join(outdeg.withColumnRenamed("src", "node").hint("shuffle_hash"),
        Seq("node"), "left")
      .select(col("node"), lit(1.0).as("rank"),
        coalesce(col("odeg"), lit(0L)).as("odeg"))
    for (i <- 1 to iterations) {
      val contrib = ranks.withColumnRenamed("node", "src")
        .join(edges.hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("odeg")).as("c"))
      ranks = ranks.drop("rank").join(contrib.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"),
          (lit(0.15) + lit(0.85) * coalesce(col("c"), lit(0.0))).as("rank"),
          col("odeg"))
      if (i % checkpointEvery == 0)
        ranks = graft.operators.Dedup.materializeLoop(ranks, eager = false)
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
      .orderBy(col("node"))
  }

  /**
   * Synchronous label propagation (LPA, Raghavan et al. 2007) over the
   * interaction graph — community detection by the dynamics real
   * pipelines run between CC (pure reachability) and modularity
   * methods: each round, every node adopts the most frequent label
   * among its neighbors, ties broken to the smallest label. A FIXED
   * round count (3) with synchronous updates keeps the result
   * deterministic and the oracle expressible (unrolled CTEs);
   * convergence detection would make output depend on scheduling.
   *
   * Scale shape: a round is one keyed join (labels onto edge
   * endpoints) + one (node,label) count + one per-node argmax window —
   * all shuffles on node keys, label relation is node-sized, the
   * window partitions by node (bounded by degree, never global). The
   * node-sized joins are shuffle-hash-pinned for the same AQE
   * build-side determinism reason as graphPageRank.
   */
  def graphLpa(spark: SparkSession, dir: String): DataFrame = {
    val edges = graft.operators.Dedup.materialize(
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct())
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .union(edges.select(col("dst").as("a"), col("src").as("b")))
    var labels = und.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    val rounds = 3
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
    labels.orderBy(col("node"))
  }

  /**
   * Newman modularity of the [[graphLpa]] labeling — the "are these
   * communities better than chance?" score that turns LPA's output
   * into a defensible claim: Q = Σ_c [m_c/m − (d_c/2m)²], internal
   * edge fraction minus the random-graph expectation at the same
   * degree sequence. One row: community count, edge count, Q.
   *
   * Scale shape: labels join onto both edge endpoints (node-keyed,
   * shuffle-hash-pinned), then everything collapses to
   * community-count-sized relations (internal-edge counts, degree
   * sums) and a single-row aggregate; m rides along as a broadcast
   * 1-row relation. Determinism: per-community terms are IEEE-exact
   * from integer counts (explicit x·x, no pow); only the final
   * community sum is order-sensitive, absorbed by round 6.
   */
  def graphModularity(spark: SparkSession, dir: String): DataFrame = {
    val edges = graft.operators.Dedup.materialize(
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct())
    // node-sized, consumed three times (both endpoint joins + the
    // degree sum) — materialized so the 3-round LPA loop runs once,
    // not once per consumer; conf-gated like every multi-consumer
    // materialization
    val lab = graft.operators.Dedup.materialize(
      graft.operators.LabelPropagation
        .lpaLabels(edges, "src", "dst", rounds = 3))
    val m = edges.agg(count(lit(1)).as("m"))
    val internal = edges
      .join(lab.withColumnRenamed("node", "src")
        .withColumnRenamed("label", "l1").hint("shuffle_hash"), "src")
      .join(lab.withColumnRenamed("node", "dst")
        .withColumnRenamed("label", "l2").hint("shuffle_hash"), "dst")
      .filter(col("l1") === col("l2"))
      .groupBy(col("l1").as("label")).agg(count(lit(1)).as("mc"))
    val deg = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))
    val dsum = deg.join(lab.hint("shuffle_hash"), "node")
      .groupBy(col("label")).agg(sum(col("dg")).as("dc"))
    val ratio = col("dc").cast("double") / (col("m") * 2)
    dsum.join(internal.hint("shuffle_hash"), Seq("label"), "left")
      .select(col("label"), coalesce(col("mc"), lit(0L)).as("mc"), col("dc"))
      .crossJoin(broadcast(m))
      .agg(count(lit(1)).as("n_communities"), min(col("m")).as("m_edges"),
        round(sum(col("mc").cast("double") / col("m") - ratio * ratio), 6)
          .as("modularity"))
  }

  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .withColumn("k_bucket", pmod(col("k"), lit(10)))
      .orderBy(col("event_id"))

  /**
   * Positional explode ≈ `Instructions.flatten` + `set_ids`
   * (`Instruction.py:64-76, 250-262`): nested children flattened to
   * rows with dotted positional ids ("orderkey.pos"). Built by
   * collecting each order's items into a sorted array and exploding
   * with position — the same array-of-struct shape the reference walks.
   */
  def instrFlatten(spark: SparkSession, dir: String): DataFrame = {
    // positional ids via a row_number window, NOT collect_list +
    // posexplode: same one shuffle on the parent key, but no per-group
    // array ever materializes — a parent with millions of children
    // costs partition space, not one aggregation buffer
    val byOrder = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_quantity"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"))
      .withColumn("pos", row_number().over(byOrder).cast("int") - 1)
      .select(
        col("l_orderkey"),
        col("pos"),
        col("l_partkey"),
        col("l_quantity"),
        concat_ws(".", col("l_orderkey"), col("pos")).as("gen_id"))
      .orderBy(col("l_orderkey"), col("pos"))
  }

  /**
   * Per-sub-entity flag surface ≈ the per-account Account rows
   * (`Account.py:14-27`) the reference carries on every transaction:
   * positional explode of an entity's sub-records with boolean role
   * flags (signer/writable ≈ first-position/returned), a rule-ordered
   * type classification (`Transaction.py:160-178` shape), and the
   * sub-record's signed value delta. One shuffle to build the nested
   * array, one codegen'd explode — same plan shape as the real
   * `SolanaTransforms.accounts`.
   */
  def accountFlags(spark: SparkSession, dir: String): DataFrame = {
    // row_number window instead of collect_list + posexplode — see
    // instrFlatten; same order key shuffle, no per-group array
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val byOrder = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_returnflag"),
        col("price"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_returnflag"), price.as("price"))
      .withColumn("pos", (row_number().over(byOrder) - 1).cast("long"))
      .select(
        col("l_orderkey"),
        col("pos"),
        col("l_partkey").as("key"),
        (col("pos") === 0).as("signer"),
        (col("l_returnflag") === "R").as("writable"),
        when(col("l_returnflag") === "R", "RETURNED")
          .when(col("price") > 50000, "LARGE")
          .otherwise("STANDARD").as("account_type"),
        round(when(col("l_returnflag") === "R", -col("price"))
          .otherwise(col("price")).cast("double"), 2).as("value_change"))
      .orderBy(col("l_orderkey"), col("pos"))
  }

  /**
   * Valid/error row routing ≈ the ResultsAndErrors side-channel
   * (`FileOutput.py:66-90`, `TransformTask.py:19-51`): every transform
   * emits good rows plus an error table; here one pass routes each
   * record with a reason, no second scan.
   */
  def errorSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("route",
        when(col("event_type") === "error", "error")
          .when(col("k").isNull, "error")
          .otherwise("ok"))
      .withColumn("reason",
        when(col("event_type") === "error", "upstream_error")
          .when(col("k").isNull, "bad_props"))
      .select(col("event_id"), col("route"), col("reason"), col("event_type"), col("k"))
      .orderBy(col("event_id"))

  /**
   * Snapshot reconciliation (operators/Reconcile.scala): the orders
   * table versus a deterministically drifted copy (every 97th key
   * deleted, every 89th key's price bumped one cent) compared by
   * 64-bucket (count, checksum) summaries — each side scanned once
   * with map-side partial aggregation, O(buckets) rows compared. The
   * checksum is portable integer arithmetic (key·1000003 + cents) so
   * the DuckDB oracle rebuilds both sides from the same base table.
   */
  def tableDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir).withColumn("cents",
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
    val current = base
      .filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("cents", col("cents") +
        when(col("o_orderkey") % 89 === 0, 1L).otherwise(0L))
    val checksum = col("o_orderkey") * lit(1000003L) + col("cents")
    Reconcile.diff(base, current, "o_orderkey", checksum, buckets = 64)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_table_diff" -> tableDiff _,
    "tx_enrich" -> txEnrich _,
    "transfer_extract" -> transferExtract _,
    "block_metrics" -> blockMetrics _,
    "balance_inout" -> balanceInOut _,
    "balance_inout_salted" -> balanceInOutSalted _,
    "scaled_decimal" -> scaledDecimal _,
    "entity_classify" -> entityClassify _,
    "graph_edges" -> graphEdges _,
    "graph_degrees" -> graphDegrees _,
    "graph_butterflies" -> ((s, d) => graphButterflies(s, d)),
    "graph_pagerank" -> graphPageRank _,
    // k=16 peels a nontrivial periphery at every tested SF; maxRounds
    // pinned to the oracle's unroll depth (output is exact for ANY
    // depth — survivors report round 0 "in core as of R rounds")
    "graph_kcore" -> ((s, d) => {
      val edges = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      graft.operators.KCore.kCorePeel(edges, "src", "dst", k = 16,
        maxRounds = 12)
    }),
    "graph_lpa" -> graphLpa _,
    "graph_modularity" -> graphModularity _,
    "json_extract" -> jsonExtract _,
    "instr_flatten" -> instrFlatten _,
    "account_flags" -> accountFlags _,
    "error_split" -> errorSplit _)

  // shared CTE prefix of the graph_lpa / graph_modularity oracles: the
  // synchronous LPA rounds unrolled
  private def lpaOracleCtes(rounds: Int): String = {
    val head =
      """WITH e AS MATERIALIZED (SELECT DISTINCT 'c'||o_custkey AS src, 's'||l_suppkey AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |und AS MATERIALIZED (SELECT src AS a, dst AS b FROM e UNION ALL SELECT dst, src FROM e),
        |l0 AS (SELECT DISTINCT a AS node, a AS label FROM und)""".stripMargin
    val iters = (1 to rounds).map { i =>
      s"""c$i AS (SELECT u.a AS node, l.label, count(*) AS c
         |  FROM und u JOIN l${i - 1} l ON u.b = l.node GROUP BY 1, 2),
         |l$i AS MATERIALIZED (SELECT node, label FROM c$i
         |  QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, label) = 1)""".stripMargin
    }.mkString(",\n")
    head + ",\n" + iters
  }

  val oracleSql: Map[String, String] = Map(
    "q_table_diff" ->
      """WITH b AS (
        |  SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |c AS (
        |  SELECT o_orderkey,
        |    cents + CASE WHEN o_orderkey % 89 = 0 THEN 1 ELSE 0 END AS cents
        |  FROM b WHERE o_orderkey % 97 <> 0),
        |sb AS (SELECT o_orderkey % 64 AS bucket, count(*) AS n,
        |         CAST(sum(o_orderkey * 1000003 + cents) % 2305843009213693951 AS BIGINT) AS checksum
        |       FROM b GROUP BY 1),
        |sc AS (SELECT o_orderkey % 64 AS bucket, count(*) AS n,
        |         CAST(sum(o_orderkey * 1000003 + cents) % 2305843009213693951 AS BIGINT) AS checksum
        |       FROM c GROUP BY 1)
        |SELECT sb.bucket,
        |  sb.n AS base_n, coalesce(sc.n, 0) AS cur_n,
        |  sb.checksum AS base_checksum,
        |  coalesce(sc.checksum, 0) AS cur_checksum,
        |  CASE WHEN sb.n <> coalesce(sc.n, 0) THEN 'rows'
        |       ELSE 'content' END AS diff_kind
        |FROM sb LEFT JOIN sc USING (bucket)
        |WHERE sb.n <> coalesce(sc.n, 0)
        |   OR sb.checksum <> coalesce(sc.checksum, 0)
        |ORDER BY sb.bucket""".stripMargin,
    "tx_enrich" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | count(l_partkey) AS num_items,
        | coalesce(round(sum(l_quantity), 4), 0.0) AS sum_qty,
        | count(DISTINCT l_suppkey) AS num_suppliers,
        | coalesce(array_to_string(list_sort(list(DISTINCT l_suppkey) FILTER (l_suppkey IS NOT NULL)), ','), '') AS suppliers,
        | coalesce(round(CAST(sum(CASE WHEN signed_value > 0 THEN signed_value ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE), 4), 0.0) AS value_in,
        | coalesce(round(CAST(sum(CASE WHEN signed_value < 0 THEN signed_value ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE), 4), 0.0) AS value_out
        |FROM orders LEFT JOIN (
        |  SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
        |    CASE WHEN l_returnflag = 'R' THEN -CAST(l_extendedprice AS DECIMAL(12,2))
        |         ELSE CAST(l_extendedprice AS DECIMAL(12,2)) END AS signed_value
        |  FROM lineitem) li ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey, o_custkey, o_orderstatus
        |ORDER BY o_orderkey""".stripMargin,
    "transfer_extract" ->
      """SELECT event_id, user_id AS source,
        | CAST(props->>'$.k' AS INTEGER) AS destination,
        | 'credits' AS mint,
        | CAST(round(value * 100, 0) AS BIGINT) AS value,
        | 2 AS scale
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "block_metrics" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        | count(*) AS n_orders,
        | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        | round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 4) AS value_o,
        | count(DISTINCT CASE WHEN o_orderstatus = 'O' THEN o_custkey END) AS custs_o,
        | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 4) AS value_f,
        | count(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END) AS custs_f,
        | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
        | round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 4) AS value_p,
        | count(DISTINCT CASE WHEN o_orderstatus = 'P' THEN o_custkey END) AS custs_p,
        | count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent
        |FROM orders
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "balance_inout" ->
      """SELECT user_id,
        | round(sum(CASE WHEN signed > 0 THEN signed ELSE 0 END), 4) AS value_in,
        | round(sum(CASE WHEN signed < 0 THEN signed ELSE 0 END), 4) AS value_out,
        | round(sum(signed), 4) AS value_all,
        | round(sum(abs(signed)), 4) AS value_abs,
        | count(*) AS n_events
        |FROM (SELECT user_id,
        |        CASE WHEN event_type = 'purchase' THEN value
        |             WHEN event_type = 'error' THEN -value
        |             ELSE 0 END AS signed
        |      FROM events) t
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // identical semantics to balance_inout — the salted plan must
    // produce the same answer
    "balance_inout_salted" ->
      """SELECT user_id,
        | round(sum(CASE WHEN signed > 0 THEN signed ELSE 0 END), 4) AS value_in,
        | round(sum(CASE WHEN signed < 0 THEN signed ELSE 0 END), 4) AS value_out,
        | round(sum(signed), 4) AS value_all,
        | round(sum(abs(signed)), 4) AS value_abs,
        | count(*) AS n_events
        |FROM (SELECT user_id,
        |        CASE WHEN event_type = 'purchase' THEN value
        |             WHEN event_type = 'error' THEN -value
        |             ELSE 0 END AS signed
        |      FROM events) t
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // CAST(sum(...) AS BIGINT): DuckDB's sum over BIGINT is HUGEINT,
    // which pandas renders as float64 and flips the driver's value hash
    // against Spark's int64 even when every cell is equal (round-1 bug)
    "scaled_decimal" ->
      """SELECT l_returnflag,
        | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents_total,
        | count(*) AS n_items,
        | 2 AS scale,
        | round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) / 100.0, 2) AS value_scaled
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "entity_classify" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'delinquent'
        |            WHEN c_acctbal > 7000 THEN 'premium'
        |            WHEN c_mktsegment IN ('BUILDING','MACHINERY') THEN 'industrial'
        |            ELSE 'retail' END AS account_type,
        | count(*) AS n_accounts,
        | count(DISTINCT c_nationkey) AS n_nations,
        | round(sum(c_acctbal), 4) AS total_balance
        |FROM customer
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // graph_kcore: the peel unrolled to the pinned 12 rounds — round i
    // recomputes degrees within the round-(i-1) survivor set; nodes
    // missing from a round's degree table (no surviving edges) peel
    // that round, exactly as the Spark loop's anti-join form does
    "graph_kcore" -> {
      val rounds = 12
      val head =
        // MATERIALIZED: DuckDB inlines multiply-referenced CTEs by
        // default; 12 rounds x re-expanded scans exhausts file handles
        """WITH e AS MATERIALIZED (SELECT DISTINCT 'c'||o_custkey AS u, 's'||l_suppkey AS v
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          |und AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
          |a0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM und),""".stripMargin
      val iters = (1 to rounds).map { i =>
        s"""d$i AS (SELECT x.u AS node, count(*) AS dg FROM und x
           |  JOIN a${i - 1} p ON x.u = p.node JOIN a${i - 1} q ON x.v = q.node
           |  GROUP BY 1),
           |a$i AS MATERIALIZED (SELECT node FROM d$i WHERE dg >= 16),
           |p$i AS (SELECT node, $i AS r FROM a${i - 1}
           |  WHERE node NOT IN (SELECT node FROM a$i))""".stripMargin
      }.mkString(",\n")
      val unioned = (1 to rounds).map(i => s"SELECT node, r FROM p$i")
        .mkString(" UNION ALL ") +
        s" UNION ALL SELECT node, 0 AS r FROM a$rounds"
      head + "\n" + iters + "\n" +
        s"SELECT node, CAST(r AS INTEGER) AS peeled_round FROM ($unioned) ORDER BY node"
    },
    // graph_lpa: the synchronous rounds unrolled — each round is a
    // (node, neighbor-label) count CTE plus a per-node argmax QUALIFY
    // with the same (count DESC, label ASC) tie-break as the Spark loop
    "graph_lpa" ->
      (lpaOracleCtes(3) + "\nSELECT node, label FROM l3 ORDER BY node"),
    // graph_modularity: the same unrolled labeling, folded to
    // Q = Σ_c [mc/m − (dc/2m)²] with the identical explicit x·x form
    "graph_modularity" -> (lpaOracleCtes(3) +
      """,
        |deg AS (SELECT a AS node, count(*) AS dg FROM und GROUP BY 1),
        |dsum AS (SELECT l.label, CAST(sum(d.dg) AS BIGINT) AS dc
        |         FROM deg d JOIN l3 l ON d.node = l.node GROUP BY 1),
        |internal AS (SELECT l1.label, count(*) AS mc
        |             FROM e JOIN l3 l1 ON e.src = l1.node
        |             JOIN l3 l2 ON e.dst = l2.node
        |             WHERE l1.label = l2.label GROUP BY 1),
        |mm AS (SELECT count(*) AS m FROM e),
        |per AS (SELECT s.label, coalesce(i.mc, 0) AS mc, s.dc
        |        FROM dsum s LEFT JOIN internal i USING (label))
        |SELECT count(*) AS n_communities, min(m) AS m_edges,
        | round(sum(mc * 1.0 / m
        |   - (dc * 1.0 / (2 * m)) * (dc * 1.0 / (2 * m))), 6) AS modularity
        |FROM per CROSS JOIN mm""".stripMargin),
    "graph_pagerank" ->
      """WITH edges AS (SELECT DISTINCT 'c'||o_custkey AS src, 's'||l_suppkey AS dst
        |               FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |outdeg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY 1),
        |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
        |r1 AS (SELECT n.node, 0.15 + 0.85 * coalesce(s.c, 0) AS rank FROM nodes n
        |       LEFT JOIN (SELECT e.dst AS node, sum(r.rank / o.odeg) AS c
        |                  FROM r0 r JOIN edges e ON e.src = r.node
        |                  JOIN outdeg o ON o.src = e.src GROUP BY e.dst) s USING (node)),
        |r2 AS (SELECT n.node, 0.15 + 0.85 * coalesce(s.c, 0) AS rank FROM nodes n
        |       LEFT JOIN (SELECT e.dst AS node, sum(r.rank / o.odeg) AS c
        |                  FROM r1 r JOIN edges e ON e.src = r.node
        |                  JOIN outdeg o ON o.src = e.src GROUP BY e.dst) s USING (node)),
        |r3 AS (SELECT n.node, 0.15 + 0.85 * coalesce(s.c, 0) AS rank FROM nodes n
        |       LEFT JOIN (SELECT e.dst AS node, sum(r.rank / o.odeg) AS c
        |                  FROM r2 r JOIN edges e ON e.src = r.node
        |                  JOIN outdeg o ON o.src = e.src GROUP BY e.dst) s USING (node)),
        |r4 AS (SELECT n.node, 0.15 + 0.85 * coalesce(s.c, 0) AS rank FROM nodes n
        |       LEFT JOIN (SELECT e.dst AS node, sum(r.rank / o.odeg) AS c
        |                  FROM r3 r JOIN edges e ON e.src = r.node
        |                  JOIN outdeg o ON o.src = e.src GROUP BY e.dst) s USING (node)),
        |r5 AS (SELECT n.node, 0.15 + 0.85 * coalesce(s.c, 0) AS rank FROM nodes n
        |       LEFT JOIN (SELECT e.dst AS node, sum(r.rank / o.odeg) AS c
        |                  FROM r4 r JOIN edges e ON e.src = r.node
        |                  JOIN outdeg o ON o.src = e.src GROUP BY e.dst) s USING (node))
        |SELECT node, round(rank, 6) AS rank FROM r5 ORDER BY node""".stripMargin,
    "graph_butterflies" ->
      """WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |deg AS (SELECT c, count(*) AS d FROM e GROUP BY 1),
        |pc AS (SELECT a.s, b.s AS s2, count(*) AS m
        |       FROM e a JOIN e b ON a.c = b.c AND a.s < b.s
        |       GROUP BY 1, 2)
        |SELECT
        | (SELECT CAST(sum(d) AS BIGINT) FROM deg) AS n_edges,
        | (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
        | count(*) AS n_supp_pairs,
        | CAST(sum(m * (m - 1) // 2) AS BIGINT) AS n_butterflies
        |FROM pc""".stripMargin,
    "graph_edges" ->
      """SELECT o_custkey AS src, l_suppkey AS dst,
        | count(*) AS n_interactions,
        | round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DOUBLE), 4) AS total_value
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // degrees CAST to BIGINT (HUGEINT→float64 hash trap) and weights
    // summed as DECIMAL(18,4), mirroring the Spark side exactly
    "graph_degrees" ->
      """WITH edges AS (
        |  SELECT o_custkey AS src, l_suppkey AS dst,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |         * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |sides AS (
        |  SELECT src AS node, 'cust' AS side, 1::BIGINT AS out_n, w AS out_w,
        |    0::BIGINT AS in_n, CAST(0 AS DECIMAL(18,4)) AS in_w FROM edges
        |  UNION ALL
        |  SELECT dst AS node, 'supp' AS side, 0::BIGINT AS out_n,
        |    CAST(0 AS DECIMAL(18,4)) AS out_w,
        |    1::BIGINT AS in_n, w AS in_w FROM edges)
        |SELECT node, side,
        | CAST(sum(out_n) AS BIGINT) AS out_degree,
        | round(CAST(sum(out_w) AS DOUBLE), 4) AS out_value,
        | CAST(sum(in_n) AS BIGINT) AS in_degree,
        | round(CAST(sum(in_w) AS DOUBLE), 4) AS in_value
        |FROM sides GROUP BY 1, 2 ORDER BY side, node""".stripMargin,
    "json_extract" ->
      """SELECT event_id, event_type,
        | CAST(props->>'$.k' AS INTEGER) AS k,
        | CAST(props->>'$.k' AS INTEGER) % 10 AS k_bucket
        |FROM events ORDER BY event_id""".stripMargin,
    "instr_flatten" ->
      """SELECT l_orderkey,
        | CAST(row_number() OVER (PARTITION BY l_orderkey
        |   ORDER BY l_linenumber, l_partkey, l_quantity) - 1 AS INTEGER) AS pos,
        | l_partkey, l_quantity,
        | concat(l_orderkey, '.',
        |   row_number() OVER (PARTITION BY l_orderkey
        |     ORDER BY l_linenumber, l_partkey, l_quantity) - 1) AS gen_id
        |FROM lineitem
        |ORDER BY l_orderkey, pos""".stripMargin,
    "account_flags" ->
      """WITH t AS (
        |  SELECT l_orderkey,
        |    CAST(row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey, l_returnflag,
        |        CAST(l_extendedprice AS DECIMAL(12,2))) - 1 AS BIGINT) AS pos,
        |    l_partkey AS key, l_returnflag,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) AS price
        |  FROM lineitem)
        |SELECT l_orderkey, pos, key,
        |  pos = 0 AS signer,
        |  l_returnflag = 'R' AS writable,
        |  CASE WHEN l_returnflag = 'R' THEN 'RETURNED'
        |       WHEN price > 50000 THEN 'LARGE'
        |       ELSE 'STANDARD' END AS account_type,
        |  round(CAST(CASE WHEN l_returnflag = 'R' THEN -price ELSE price END AS DOUBLE), 2) AS value_change
        |FROM t ORDER BY l_orderkey, pos""".stripMargin,
    "error_split" ->
      """SELECT event_id,
        | CASE WHEN event_type = 'error' THEN 'error'
        |      WHEN CAST(props->>'$.k' AS INTEGER) IS NULL THEN 'error'
        |      ELSE 'ok' END AS route,
        | CASE WHEN event_type = 'error' THEN 'upstream_error'
        |      WHEN CAST(props->>'$.k' AS INTEGER) IS NULL THEN 'bad_props' END AS reason,
        | event_type,
        | CAST(props->>'$.k' AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin)
}
