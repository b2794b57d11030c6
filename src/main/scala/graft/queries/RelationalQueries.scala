package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/**
 * §A relational core — proves the engine is a real query engine before
 * layering the reference's ETL semantics on top.
 *
 * Scale notes (100 TB): every query here keeps the fact table
 * (lineitem/orders) on the probe side; dimension tables are broadcast
 * explicitly. Aggregates are all partial-agg friendly (sum/count/min/
 * max), so map-side combine halves shuffle volume. Floating-point
 * aggregates are rounded at the output edge only, to absorb
 * summation-order drift between partitions (and vs the DuckDB oracle).
 */
object RelationalQueries {

  /** TPC-H Q1 shape: single-table scan + grouped derived-expression agg. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3 shape: 3-way join, grouped agg, top-k. Customer is a
    * SCALING dimension (it grows with SF — multi-TB at 100 TB), so it
    * carries no broadcast hint: AQE broadcasts it while its filtered
    * size is under threshold and shuffles it beyond (the sf10 sweep
    * measured forced scaling-dim broadcasts blowing up 30× on q5). */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-01-01"))
    val li   = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-01-01"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
  }

  /** TPC-H Q5 shape: star join over all six tables, region-filtered. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    // broadcast hints ONLY on the fixed-cardinality tables (nation = 25
    // rows, region = 5 — constants at every SF). supplier and customer
    // SCALE with the corpus, so their joins are left to AQE: broadcast
    // under threshold, shuffle beyond. The r10 sf10 sweep measured the
    // previous forced customer/supplier broadcasts at 30× the linear
    // scaling cost (34s vs ~1s expected) — at 100 TB they'd be fatal.
    val dims = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(dims, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** Window rank: top-3 parts by revenue within each brand. */
  def topKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("part_revenue"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("part_revenue").desc, col("p_partkey"))
    rev.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy(col("p_brand"), col("rnk"))
  }

  /** Left-semi + left-anti: customers with at least one order but none above the cap. */
  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord  = Tables.orders(spark, dir)
    cust
      .join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .join(ord.filter(col("o_totalprice") > 400000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** ROLLUP aggregation: order value by nation × order-year with subtotals. */
  def rollupNationYear(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .withColumn("o_year", year(col("o_orderdate")))
    ord.rollup(col("n_name"), col("o_year"))
      .agg(round(sum(col("o_totalprice")), 4).as("total_value"),
        count(lit(1)).as("n_orders"))
      .orderBy(asc_nulls_first("n_name"), asc_nulls_first("o_year"))
  }

  /** Running total per customer: window frame ROWS UNBOUNDED PRECEDING. */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(sum(col("o_totalprice")).over(w), 4).as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Correlated-scalar shape: orders above their customer's average value. */
  def aboveCustomerAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    Tables.orders(spark, dir)
      .withColumn("cust_avg_raw", avg(col("o_totalprice")).over(w))
      // the avg itself is not emitted: engines disagree in its last
      // ulp, which flips fixed-precision rounding at grid boundaries;
      // the comparison is ulp-robust, the rounded echo is not
      .filter(col("o_totalprice") > col("cust_avg_raw"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Pivot: order value by month × status as columns. */
  def pivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("month", date_trunc("month", col("o_orderdate")))
      .groupBy(col("month"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(round(sum(col("o_totalprice")), 4))
      .orderBy(col("month"))

  /**
   * Sketch-based distinct counting (HyperLogLog++) next to the exact
   * count — the 100 TB path for distinct-heavy metrics. The raw form
   * (both columns) feeds SketchAccuracySpec; the registry form below
   * folds the sketch into a `within_bound` check so the DuckDB oracle
   * can verify it: exact columns compared value-for-value, and the
   * oracle asserts the bound column is all-true (a sketch drifting
   * past 5% flips the hash).
   */
  def approxDistinctRaw(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    approxDistinctRaw(spark, dir)
      .select(col("event_type"), col("exact_users"), col("n_events"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.05).as("within_bound"))
      .orderBy(col("event_type"))

  /**
   * Incremental distinct-count maintenance with mergeable HLL
   * sketches — the distinct-count analogue of q_incr_agg: per-epoch
   * `hll_sketch_agg` partials (here a base and a delta epoch) merged
   * by `hll_union_agg`, proving estimate(merge(sk(base), sk(delta)))
   * tracks the exact distinct over all data. countDistinct is NOT
   * decomposable (partials can't merge), so at 100 TB the sketch
   * union is the only way to maintain a distinct count without
   * re-scanning history; the registry form self-checks the merged
   * estimate against the exact count (lgK=12 → ~1.6% RSE; bound 5%).
   *
   * The tiny final join is explicitly broadcast-hinted on the merged
   * side: both inputs are group-cardinality-sized, and an unhinted
   * tiny-vs-tiny join lets AQE pick the build side by stage-arrival
   * order (the dedup_components plan-flip class).
   */
  def incrDistinct(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val cutoff = lit("2024-01-15").cast("timestamp")
    def sketch(df: DataFrame): DataFrame = df.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = sketch(e.filter(col("ts") < cutoff))
      .unionByName(sketch(e.filter(col("ts") >= cutoff)))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
    exact.join(broadcast(merged), "event_type")
      .select(col("event_type"), col("exact_users"), col("n_events"),
        (abs(col("est_users") - col("exact_users")) <=
          greatest(col("exact_users") * 0.05, lit(2L))).as("within_bound"),
        (col("exact_users") > 0).as("nonempty"))
      .orderBy(col("event_type"))
  }

  /**
   * Heavy hitters with a mergeable Count-Min sketch: per-epoch
   * `count_min_sketch` partials (split on l_orderkey parity) merged
   * driver-side (operators/Sketches.scala — the sketch is the model
   * artifact, ~110 KB at ε=5e-4, depth 5), then the exact top-10
   * suppliers' estimates are checked against the CMS guarantee
   * exact ≤ est ≤ exact + ε·N. The exact side is one partial-agg
   * groupBy + TakeOrdered top-k (no global sort); the two bounded
   * driver reads are the candidate keys (k=10) and the sketch blobs.
   */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val eps = 5e-4
    val li = Tables.lineitem(spark, dir)
    val partials = li
      .groupBy((col("l_orderkey") % 2).as("epoch"))
      .agg(count_min_sketch(col("l_suppkey"),
        lit(eps), lit(0.99), lit(42)).as("sk"))
      .collect().map(_.getAs[Array[Byte]]("sk")).toSeq
    val exactTop = li.groupBy(col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("suppkey")).limit(10)
    val keys = exactTop.select(col("suppkey"))
      .collect().map(_.getLong(0)).toSeq
    val n = li.count() // parquet metadata count
    val est = graft.operators.Sketches.cmsEstimates(partials, keys)
    val estDf = spark.createDataFrame(
      est.toSeq.map { case (k, v) => (k, v) }).toDF("suppkey", "est_cnt")
    exactTop.join(broadcast(estDf), "suppkey")
      .select(col("suppkey"), col("cnt"),
        (col("est_cnt") >= col("cnt") &&
          col("est_cnt") <= col("cnt") + lit((eps * n).toLong + 1L))
          .as("within_bound"),
        (col("cnt") > 0).as("nonempty"))
      .orderBy(col("cnt").desc, col("suppkey"))
  }

  /** Approximate percentiles (Greenwald-Khanna sketch) next to exact —
    * the mergeable scale path for quantiles, with its error visible
    * against the exact answer. Same self-checking split as
    * q_approx_distinct: raw form for the accuracy spec, oracle-checked
    * bound column in the registry. */
  def approxPercentileRaw(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val approx = li.groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 1000)").as("approx"),
        count(lit(1)).as("n_rows"))
    // exact sibling via distributed order statistics (see percentiles);
    // group-cardinality-sized, so the final join broadcast-pins it
    val exact = graft.operators.Quantiles.exactPercentilesByGroup(
      li, "l_returnflag", "l_extendedprice",
      tieCols = Seq("l_orderkey", "l_linenumber"),
      quantiles = Seq("exact_p50" -> 0.5, "exact_p99" -> 0.99))
    approx.join(broadcast(exact), "l_returnflag")
      .select(col("l_returnflag"),
        round(element_at(col("approx"), 1), 4).as("approx_p50"),
        round(element_at(col("approx"), 2), 4).as("approx_p99"),
        round(col("exact_p50"), 4).as("exact_p50"),
        round(col("exact_p99"), 4).as("exact_p99"),
        col("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  def approxPercentile(spark: SparkSession, dir: String): DataFrame =
    approxPercentileRaw(spark, dir)
      .select(col("l_returnflag"), col("exact_p50"), col("exact_p99"),
        col("n_rows"),
        (abs(col("approx_p50") - col("exact_p50")) <= col("exact_p50") * 0.05 &&
          abs(col("approx_p99") - col("exact_p99")) <= col("exact_p99") * 0.05)
          .as("within_bound"))
      .orderBy(col("l_returnflag"))

  /** Exact decile bucketing + per-decile stats, WITHOUT the
    * single-partition total sort a global ntile() implies. The scale
    * form: range-repartition on the sort key, rank within each range
    * partition, add broadcast cumulative offsets from the per-partition
    * counts (one row per partition — constant-sized, never data-sized),
    * then ntile's bucket arithmetic from the global count. Every
    * data-sized stage runs at full parallelism; the only
    * single-partition window is over `parts` rows (32 here, one per
    * executor-ish at cluster scale). Same oracle as ntile(10). */
  def ntileSpread(spark: SparkSession, dir: String): DataFrame = {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // deterministic slice ids from driver-sampled literal bounds
    // (operators/RangeSlice.scala): both plan branches recompute the
    // same slicing from row values — no pinned partition ids, no
    // checkpoint, no full-table materialization, recompute-safe
    val base0 = Tables.customer(spark, dir)
      .select(col("c_acctbal"), col("c_custkey"))
    val base = graft.operators.RangeSlice.withSliceId(
      base0, Seq(col("c_acctbal"), col("c_custkey")), parts, "sid")
    val total = base0.count() // single scalar: ntile's N (model parameter)
    val wOff = Window.orderBy(col("sid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("sid")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("sid"), col("off"))
    val wLocal = Window.partitionBy(col("sid"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    // ntile(10): first (N mod 10) buckets hold ceil(N/10) rows.
    // q = 0 (N < 10) is safe: bigCut = N covers every rank, so the
    // otherwise-branch (and its division by q) is never evaluated —
    // CaseWhen codegen is lazy per branch.
    val q = lit(total / 10)
    val rem = lit(total % 10)
    val bigCut = (q + lit(1)) * rem
    val rnk = col("off") + row_number().over(wLocal)
    val decile = when(rnk <= bigCut,
        floor((rnk - 1) / (q + lit(1))) + 1)
      .otherwise(rem + floor((rnk - lit(1) - bigCut) / q) + 1)
      .cast("long")
    base.join(broadcast(offsets), "sid")
      .select(col("c_acctbal"), decile.as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("c_acctbal")), 4).as("lo"),
        round(max(col("c_acctbal")), 4).as("hi"),
        round(avg(col("c_acctbal")), 4).as("mean"))
      .orderBy(col("decile"))
  }

  /** Trailing 90-day revenue per customer: RANGE interval frame. */
  def trailingWindow(spark: SparkSession, dir: String): DataFrame = {
    val us = unix_micros(col("o_orderdate").cast("timestamp"))
    val ninetyDaysUs = 90L * 24 * 3600 * 1000000
    val w = Window.partitionBy(col("o_custkey")).orderBy(us)
      .rangeBetween(-ninetyDaysUs, 0)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(sum(col("o_totalprice")).over(w), 4).as("trailing_90d"),
        count(lit(1)).over(w).as("n_orders_90d"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Exact interpolated percentiles per group — distributed order
    * statistics (operators/Quantiles.scala), NOT the `percentile()`
    * aggregate: that one buffers a group's every value in one
    * aggregation buffer, which with few groups at 100 TB parks whole
    * columns on single executors. Same answer, partition-bounded
    * memory. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Quantiles.exactPercentilesByGroup(
        Tables.lineitem(spark, dir), "l_returnflag", "l_extendedprice",
        tieCols = Seq("l_orderkey", "l_linenumber"),
        quantiles = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
      .select(col("l_returnflag"),
        round(col("p50"), 4).as("p50"),
        round(col("p90"), 4).as("p90"),
        round(col("p99"), 4).as("p99"))
      .orderBy(col("l_returnflag"))

  /** Full-outer join: per-nation customer vs supplier census — both
    * sides aggregated first (the outer join sees one row per key), and
    * the key coalesced across sides. Exercises null handling on BOTH
    * sides of the join, which no other registry query does. */
  def fullOuterCensus(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(12,2)")).as("cust_balance"))
    val supp = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("s_acctbal").cast("decimal(12,2)")).as("supp_balance"))
    cust.join(supp, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        round(coalesce(col("cust_balance"), lit(0)).cast("double"), 2).as("cust_balance"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
        round(coalesce(col("supp_balance"), lit(0)).cast("double"), 2).as("supp_balance"))
      .orderBy(col("nationkey"))
  }

  /** INTERSECT / EXCEPT set algebra on customer populations. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val bigSpenders = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 200000.0)
      .select(col("o_custkey").as("custkey"))
    val delinquent = Tables.customer(spark, dir)
      .filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("custkey"))
    building.intersect(bigSpenders).except(delinquent)
      .orderBy(col("custkey"))
  }

  /** argmax aggregation: each customer's most expensive order (deterministic tie-break). */
  def argmaxOrder(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey")))
          .as("best_orderkey"),
        round(max(col("o_totalprice")), 4).as("best_price"))
      .orderBy(col("o_custkey"))

  /** Salted lineitem⋈orders join (identical rows to the plain join —
    * the oracle proves it), aggregated to revenue per order priority. */
  def saltedJoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"), col("l_discount"))
    val ords = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority"))
    graft.operators.Salt.saltedJoin(li, ords, "o_orderkey", salts = 8)
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
  }

  /** CUBE over (status, year): all four grouping-set combinations in
    * one pass — partial-agg friendly, one shuffle. */
  /** Cube over the PRE-AGGREGATED finest grouping set, not the raw
    * table: `.cube` plans an Expand that multiplies every input row
    * by the number of grouping sets (4 here) BEFORE the first hash
    * aggregate — at 100 TB that's 4× the scan-side aggregation work.
    * count/sum are decomposable, so cubing the (status, yr) exact
    * aggregate (a few dozen rows) is identical arithmetic with the
    * Expand applied to a constant-sized relation; the one data-sized
    * job is a plain two-key groupBy with map-side partials. */
  def cubeStatusYear(spark: SparkSession, dir: String): DataFrame = {
    val pre = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus").as("status"),
        year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("pn"), sum(col("o_totalprice")).as("pt"))
    pre.cube(col("status"), col("yr"))
      .agg(sum(col("pn")).as("n"), round(sum(col("pt")), 2).as("total"))
      .orderBy(asc_nulls_first("status"), asc_nulls_first("yr"))
  }

  /** Explicit GROUPING SETS — the general form rollup/cube specialize
    * (here: by-status, by-year, and grand-total marginals WITHOUT the
    * (status, yr) cross that cube would add), plus `grouping_id()` so
    * consumers can tell a NULL group key from a real NULL. Same
    * pre-aggregation shape as q_cube: the Expand multiplies the
    * exact-group aggregate (a few dozen rows), never the scan. */
  def groupingSetsStatusYear(spark: SparkSession, dir: String): DataFrame = {
    // Dataset.groupingSets (Spark 4) rather than SQL over a temp
    // view: a fixed-name createOrReplaceTempView mutated shared
    // session state (two concurrent query constructions would race)
    // and leaked the view into the catalog after the query finished
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus").as("status"),
        year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("pn"), sum(col("o_totalprice")).as("pt"))
      .groupingSets(Seq(Seq(col("status")), Seq(col("yr")), Seq.empty),
        col("status"), col("yr"))
      .agg(sum(col("pn")).as("n"), round(sum(col("pt")), 2).as("total"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), asc_nulls_first("status"), asc_nulls_first("yr"))
  }

  /** Table profile: row count, per-column distincts and ranges — the
    * data-quality survey every pipeline runs first. The ndv counts are
    * SEPARATE single-distinct aggregates composed as broadcast 1-row
    * joins, not one multi-distinct agg: Spark rewrites n>1 distinct
    * aggregates into an Expand that multiplies every input row
    * (n+1)× into the first hash aggregate AND numbers the distinct
    * groups by hash-map iteration order over exprId-bearing keys —
    * nondeterministic across sessions, so the executed plan itself
    * permutes run-to-run (the one plan flip the r5 driver bench saw).
    * The split form reads a column-pruned scan per ndv, partial-
    * aggregates each to one row, and joins single rows: deterministic
    * plan, no row multiplication, strictly less shuffle at scale.
    * count(CASE), not sum(CASE): DuckDB's sum over ints is HUGEINT
    * (→ float64 in pandas → driver hash flip); count is BIGINT in
    * both engines. */
  def profileTable(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def ndv(c: String, as: String): DataFrame =
      o.agg(countDistinct(col(c)).as(as))
    o.agg(count(lit(1)).as("n_rows"),
        count(when(col("o_orderpriority").isNull, lit(1))).as("null_priorities"),
        round(min(col("o_totalprice")), 4).as("min_price"),
        round(max(col("o_totalprice")), 4).as("max_price"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"))
      .crossJoin(broadcast(ndv("o_custkey", "ndv_custkey")))
      .crossJoin(broadcast(ndv("o_orderstatus", "ndv_status")))
      .crossJoin(broadcast(ndv("o_orderpriority", "ndv_priority")))
      .select(col("n_rows"), col("ndv_custkey"), col("ndv_status"),
        col("ndv_priority"), col("null_priorities"), col("min_price"),
        col("max_price"), col("first_date"), col("last_date"))
  }

  /** Latest record per key (compaction / upsert-resolution shape):
    * one keyed aggregation, deterministic (ts, id) tie-break. */
  def latestByKey(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(struct(unix_micros(col("ts")).as("us"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("last_event_id"),
        col("m.us").as("last_ts_us"))
      .orderBy(col("user_id"))

  /** Ordered-stage funnel: users with a view, then a purchase at or
    * after their first view. Two keyed aggs + one left join. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .join(v, "user_id").filter(col("ts") >= col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    v.join(p, Seq("user_id"), "left")
      .agg(count(lit(1)).as("n_view_users"), count(col("p_ts")).as("n_converted"))
  }

  /** Fixed-width histogram of order values. */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("bucket"))

  /** Morton (Z-order) key per customer over (custkey, nationkey) —
    * the layout key `Layout.zOrderWrite` clusters files by. */
  def zorderKey(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        graft.operators.Layout.zOrder2(col("c_custkey"), col("c_nationkey"))
          .as("zkey"))
      .orderBy(col("zkey"), col("c_custkey"))

  /**
   * Weekly cohort retention: users bucketed by the ISO week of their
   * first active day, counted as retained at integer week offsets of
   * any later activity. Two keyed aggregations (distinct activity,
   * per-user cohort) + one user-keyed join — the cohort side is one
   * row per user, broadcastable at any realistic user count; the
   * offset arithmetic is integer (`div 7`), never float dates.
   */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val activity = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val cohorts = activity.groupBy(col("user_id"))
      .agg(min(col("d")).as("cohort_day"))
    activity.join(cohorts, "user_id")
      .groupBy(
        to_date(date_trunc("week", col("cohort_day"))).as("cohort_week"),
        expr("datediff(d, cohort_day) div 7").cast("long").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /**
   * One-pass data-quality audit over a fact⋈dimension pair: row count,
   * FK orphans, null/non-positive measures, duplicate keys, and
   * out-of-domain dates, all as count-CASE aggregates on a single left
   * join (customer scales with SF so AQE owns the join strategy;
   * count not sum — see profile_table note).
   * The fixed date bound keeps the check deterministic across runs.
   */
  def dqCheck(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir).select(col("c_custkey"))
    o.join(c, o("o_custkey") === c("c_custkey"), "left")
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("c_custkey").isNull, lit(1))).as("n_orphans"),
        count(when(col("o_totalprice").isNull, lit(1))).as("n_null_price"),
        count(when(col("o_totalprice") <= 0, lit(1))).as("n_nonpos_price"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_dup_keys"),
        count(when(col("o_orderdate") > lit("1998-12-31"), lit(1)))
          .as("n_future_dates"))
  }

  /**
   * Snapshot + delta upsert merge: latest state per key from a base
   * snapshot full-outer-merged with a delta batch, delta winning where
   * both exist — the MERGE INTO shape of incremental pipelines. Both
   * sides are one keyed aggregation; the merge is a key-equi full
   * outer join (at scale both sides arrive hash-partitioned on the
   * key from their aggregations, so the join adds no extra shuffle).
   */
  def upsertMerge(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val cutoff = lit("2024-01-15").cast("timestamp")
    def latest(df: DataFrame): DataFrame = df.groupBy(col("user_id"))
      .agg(max(struct(unix_micros(col("ts")).as("us"),
        col("event_id").as("eid"))).as("m"))
      .select(col("user_id"), col("m.us").as("ts_us"), col("m.eid").as("eid"))
    val base = latest(e.filter(col("ts") < cutoff)).as("b")
    val delta = latest(e.filter(col("ts") >= cutoff)).as("d")
    base.join(delta, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("d.ts_us"), col("b.ts_us")).as("last_ts_us"),
        coalesce(col("d.eid"), col("b.eid")).as("last_event_id"),
        when(col("d.ts_us").isNotNull, "delta").otherwise("base").as("src"))
      .orderBy(col("user_id"))
  }

  /**
   * Incremental aggregate maintenance: the materialized-rollup update
   * shape — partial aggregates computed per increment (here: a base
   * epoch and a delta epoch), then MERGED by re-aggregating the
   * partials, never recomputing history. Correct because every
   * aggregate is decomposable (count/sum over exact cents longs); the
   * oracle is the one-pass aggregate over all data, proving
   * merge(partial(base), partial(delta)) ≡ full recompute. At 100 TB
   * this is the difference between touching one day and five years.
   */
  def incrAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).withColumn("cents",
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_total"))
    val base = partial(o.filter(year(col("o_orderdate")) < 1997))
    val delta = partial(o.filter(year(col("o_orderdate")) >= 1997))
    base.unionByName(delta)
      .groupBy(col("status"))
      .agg(sum(col("n")).as("n"), sum(col("cents_total")).as("cents_total"))
      .orderBy(col("status"))
  }

  /**
   * Key-skew diagnostics — the check run before choosing a join/agg
   * strategy: per-key row counts reduced to distribution stats
   * (max/min/mean ratio). Two aggregations, both partial-agg friendly;
   * the second input is one row per key. A skew_ratio ≫ 1 is the
   * signal to salt (operators/Salt.scala) or lean on AQE skew splits.
   */
  def skewProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey").as("key")).agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_cnt"),
        min(col("cnt")).as("min_cnt"))
      .withColumn("skew_ratio",
        round(col("max_cnt") / (col("n_rows") * lit(1.0) / col("n_keys")), 4))

  /**
   * Robust per-type outlier screen over the event stream — see
   * operators/Robust.scala for the median/MAD machinery (both medians
   * via the distributed exact-percentile operator, nothing
   * group-sized in memory).
   */
  def madOutlierEvents(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Robust.madOutliers(Tables.events(spark, dir),
      "event_type", "value", "event_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "anomaly_mad" -> madOutlierEvents _,
    "q_skew_profile" -> skewProfile _,
    "q_incr_agg" -> incrAgg _,
    "q_incr_distinct" -> incrDistinct _,
    "q_heavy_hitters" -> heavyHitters _,
    "q_retention" -> retention _,
    "dq_check" -> dqCheck _,
    "q_upsert_merge" -> upsertMerge _,
    "latest_by_key" -> latestByKey _,
    "q_cube" -> cubeStatusYear _,
    "q_grouping_sets" -> groupingSetsStatusYear _,
    "profile_table" -> profileTable _,
    "q_funnel" -> funnel _,
    "q_histogram" -> histogram _,
    "zorder_key" -> zorderKey _,
    "q_approx_percentile" -> approxPercentile _,
    "q_ntile_spread" -> ntileSpread _,
    "q_salted_join" -> saltedJoinRevenue _,
    "q_trailing_window" -> trailingWindow _,
    "q_percentiles" -> percentiles _,
    "q_set_ops" -> setOps _,
    "q_full_outer" -> fullOuterCensus _,
    "q_argmax" -> argmaxOrder _,
    "q_running_total" -> runningTotal _,
    "q_above_avg" -> aboveCustomerAvg _,
    "q_pivot" -> pivotStatus _,
    "q_approx_distinct" -> approxDistinct _,
    "q1_pricing_summary" -> q1PricingSummary _,
    "q3_shipping_priority" -> q3ShippingPriority _,
    "q5_local_supplier" -> q5LocalSupplier _,
    "q_top_k_per_group" -> topKPerGroup _,
    "q_semi_anti" -> semiAnti _,
    "q_rollup" -> rollupNationYear _)

  val oracleSql: Map[String, String] = Map(
    "anomaly_mad" ->
      """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |           FROM events GROUP BY 1),
        |d AS (SELECT e.event_id, e.event_type, e.value, m.med
        |      FROM events e JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
        |       FROM d GROUP BY 1)
        |SELECT d.event_id, d.event_type, d.value,
        | round(d.med, 6) AS med, round(md.mad, 6) AS mad,
        | round((d.value - d.med) / (1.4826 * md.mad), 4) AS robust_z
        |FROM d JOIN md USING (event_type)
        |WHERE md.mad > 0 AND abs(d.value - d.med) > 3.5 * 1.4826 * md.mad
        |ORDER BY d.event_id""".stripMargin,
    // the sketch queries are self-checking: exact columns compare
    // value-for-value and the oracle asserts the sketch's error-bound
    // flag is all-true (an out-of-bound sketch flips the value hash)
    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        | count(*) AS n_events, TRUE AS within_bound
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_incr_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        | count(*) AS n_events, TRUE AS within_bound,
        | count(DISTINCT user_id) > 0 AS nonempty
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_heavy_hitters" ->
      """SELECT l_suppkey AS suppkey, count(*) AS cnt,
        | TRUE AS within_bound, count(*) > 0 AS nonempty
        |FROM lineitem GROUP BY 1
        |ORDER BY cnt DESC, suppkey LIMIT 10""".stripMargin,
    "q_approx_percentile" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
        | round(quantile_cont(l_extendedprice, 0.99), 4) AS exact_p99,
        | count(*) AS n_rows, TRUE AS within_bound
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_skew_profile" ->
      """WITH c AS (SELECT l_suppkey AS key, count(*) AS cnt
        |           FROM lineitem GROUP BY 1)
        |SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
        | max(cnt) AS max_cnt, min(cnt) AS min_cnt,
        | round(max(cnt) / (CAST(sum(cnt) AS BIGINT) * 1.0 / count(*)), 4) AS skew_ratio
        |FROM c""".stripMargin,
    "q_incr_agg" ->
      """SELECT o_orderstatus AS status,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents_total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, min(d) AS cohort_day FROM a GROUP BY 1)
        |SELECT date_trunc('week', cohort_day) AS cohort_week,
        | date_diff('day', cohort_day, d) // 7 AS week_offset,
        | count(DISTINCT a.user_id) AS n_active
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dq_check" ->
      """SELECT count(*) AS n_rows,
        | count(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS n_orphans,
        | count(CASE WHEN o_totalprice IS NULL THEN 1 END) AS n_null_price,
        | count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS n_nonpos_price,
        | count(*) - count(DISTINCT o_orderkey) AS n_dup_keys,
        | count(CASE WHEN o_orderdate > DATE '1998-12-31' THEN 1 END) AS n_future_dates
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,
    "q_upsert_merge" ->
      """WITH b AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts < TIMESTAMP '2024-01-15') WHERE rn = 1),
        |d AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts >= TIMESTAMP '2024-01-15') WHERE rn = 1)
        |SELECT user_id,
        | coalesce(d.ts_us, b.ts_us) AS last_ts_us,
        | coalesce(d.event_id, b.event_id) AS last_event_id,
        | CASE WHEN d.ts_us IS NOT NULL THEN 'delta' ELSE 'base' END AS src
        |FROM b FULL OUTER JOIN d USING (user_id) ORDER BY user_id""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus AS status, year(o_orderdate) AS yr,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total,
        | CAST(GROUPING(o_orderstatus, year(o_orderdate)) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
        |ORDER BY gid, status NULLS FIRST, yr NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus AS status, year(o_orderdate) AS yr,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE (status, yr)
        |ORDER BY status NULLS FIRST, yr NULLS FIRST""".stripMargin,
    "profile_table" ->
      """SELECT count(*) AS n_rows,
        | count(DISTINCT o_custkey) AS ndv_custkey,
        | count(DISTINCT o_orderstatus) AS ndv_status,
        | count(DISTINCT o_orderpriority) AS ndv_priority,
        | count(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS null_priorities,
        | round(min(o_totalprice), 4) AS min_price,
        | round(max(o_totalprice), 4) AS max_price,
        | min(o_orderdate) AS first_date, max(o_orderdate) AS last_date
        |FROM orders""".stripMargin,
    "latest_by_key" ->
      """SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS last_ts_us
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts GROUP BY 1)
        |SELECT count(*) AS n_view_users, count(p.p_ts) AS n_converted
        |FROM v LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "zorder_key" ->
      s"""SELECT c_custkey, c_nationkey,
         | ${graft.operators.Layout.zOrder2Sql("c_custkey", "c_nationkey")} AS zkey
         |FROM customer ORDER BY zkey, c_custkey""".stripMargin,
    "q_ntile_spread" ->
      """WITH d AS (SELECT c_acctbal,
        |  ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        | FROM customer)
        |SELECT decile, count(*) AS n,
        | round(min(c_acctbal), 4) AS lo, round(max(c_acctbal), 4) AS hi,
        | round(avg(c_acctbal), 4) AS mean
        |FROM d GROUP BY decile ORDER BY decile""".stripMargin,
    "q_salted_join" ->
      """SELECT o_orderpriority,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_trailing_window" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | round(sum(o_totalprice) OVER w, 4) AS trailing_90d,
        | count(*) OVER w AS n_orders_90d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
        |             RANGE BETWEEN 7776000000000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        | round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_full_outer" ->
      """WITH c AS (SELECT c_nationkey, count(*) AS n_customers,
        |  sum(CAST(c_acctbal AS DECIMAL(12,2))) AS cust_balance
        |  FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey, count(*) AS n_suppliers,
        |  sum(CAST(s_acctbal AS DECIMAL(12,2))) AS supp_balance
        |  FROM supplier GROUP BY 1)
        |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
        | coalesce(n_customers, 0) AS n_customers,
        | round(CAST(coalesce(cust_balance, 0) AS DOUBLE), 2) AS cust_balance,
        | coalesce(n_suppliers, 0) AS n_suppliers,
        | round(CAST(coalesce(supp_balance, 0) AS DOUBLE), 2) AS supp_balance
        |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "q_set_ops" ->
      """SELECT custkey FROM (
        | SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | INTERSECT
        | SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0
        | EXCEPT
        | SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0) t
        |ORDER BY custkey""".stripMargin,
    // max_by on struct(price, orderkey) == the row_number desc/desc row
    "q_argmax" ->
      """SELECT o_custkey, o_orderkey AS best_orderkey,
        | round(o_totalprice, 4) AS best_price
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |      FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | round(sum(o_totalprice) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS UNBOUNDED PRECEDING), 4) AS running_total
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_above_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM (SELECT *, avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg_raw
        |      FROM orders) t
        |WHERE o_totalprice > cust_avg_raw
        |ORDER BY o_orderkey""".stripMargin,
    "q_pivot" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        | round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 4) AS "O",
        | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 4) AS "F",
        | round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 4) AS "P"
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 4) AS sum_qty,
        | round(sum(l_extendedprice), 4) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
        | round(avg(l_quantity), 6) AS avg_qty,
        | round(avg(l_extendedprice), 6) AS avg_price,
        | round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        | o_orderdate, o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q_top_k_per_group" ->
      """WITH part_rev AS (
        |  SELECT p_brand, p_partkey,
        |    round(sum(l_extendedprice * (1 - l_discount)), 4) AS part_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_partkey)
        |SELECT p_brand, p_partkey, part_revenue, rnk FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY p_brand ORDER BY part_revenue DESC, p_partkey) AS rnk
        |  FROM part_rev) t
        |WHERE rnk <= 3
        |ORDER BY p_brand, rnk""".stripMargin,
    "q_semi_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_rollup" ->
      """SELECT n_name, o_year,
        | round(sum(o_totalprice), 4) AS total_value,
        | count(*) AS n_orders
        |FROM (
        |  SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year, o_totalprice
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey) t
        |GROUP BY ROLLUP (n_name, o_year)
        |ORDER BY n_name NULLS FIRST, o_year NULLS FIRST""".stripMargin)
}
