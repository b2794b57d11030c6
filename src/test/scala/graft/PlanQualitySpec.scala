package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-shape guards: these queries' physical plans must keep the
 * properties the 100 TB design depends on. A regression here (a lost
 * broadcast hint, a filter that stops pushing down, an accidental
 * cartesian) is a scale bug even when results stay correct.
 */
class PlanQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  /** q5 carries NO broadcast hints on its scaling dims (supplier /
    * customer grow with SF — the r10 sf10 sweep measured the forced
    * broadcasts at 30× the linear cost), so the guarantee is now
    * AQE's: at a dim-size-under-threshold SF the FINAL adaptive plan
    * must still broadcast every dimension. The static pre-execution
    * plan may stage a sort-merge the runtime stats then eliminate. */
  test("q5 star join broadcasts every dimension in the final AQE plan") {
    val df = SparkEntry.queries("q5_local_supplier")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case other => other.toString
    }
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q1 filter reaches the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
  }

  test("pairwise dedup paths never plan a cartesian product") {
    for (q <- Seq("dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
        "range_join")) {
      assert(!plan(q).contains("CartesianProduct"), s"$q plans a cartesian")
    }
  }

  test("knn's only nested-loop is the broadcast one-row query vector") {
    val p = plan("knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("blocked knn-join generates candidates by equi-join, never a nested loop") {
    // the OPERATOR, not the registry entry: the registry form is the
    // self-check (blocked + exact anchor side by side), and the anchor
    // legitimately plans a broadcast nested loop at oracle SF
    val p = graft.operators.Similarity.knnJoinBlocked(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", k = 3, dim = 64)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("scale-path dedup operators plan no nested loop or cartesian") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    for ((name, df) <- Seq(
        "minhashLshPairs" -> graft.operators.Dedup.minhashLshPairs(
          docs, "doc_id", "text"),
        "simhashPairs" -> graft.operators.Dedup.simhashPairs(
          docs, "doc_id", "text"),
        "embeddingNearDupLsh" -> graft.operators.Dedup.embeddingNearDupLsh(
          emb, "vec_id", "embedding", threshold = 0.4, dim = 64))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a nested loop")
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian")
    }
  }

  test("ntile spread never sorts the data on a single partition") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val exec = SparkEntry.queries("q_ntile_spread")(spark, dir)
      .queryExecution.executedPlan
    // the data-sized sort (on c_acctbal) must run at full parallelism;
    // only constant-sized relations (per-partition counts, the 10-row
    // result) may ever occupy one partition
    val badSorts = exec.collect {
      case s: SortExec
          if s.sortOrder.exists(_.child.references.exists(_.name == "c_acctbal"))
            && s.outputPartitioning == SinglePartition => s
    }
    assert(badSorts.isEmpty,
      s"c_acctbal sorted on a single partition:\n$exec")
  }

  test("no query in the registry plans an unkeyed cartesian product") {
    // exact all-pairs verify stages are the documented exception: their
    // non-equi self-join is a BroadcastNestedLoopJoin at oracle SF and
    // their scale path is the corresponding *_lsh / banded variant.
    // The self-checking registry forms embed those anchors, so they
    // inherit the exemption; ScaleGuard keeps every one of them from
    // running at corpus scale.
    val allPairsOk = Set("dedup_embedding", "dedup_embedding_lsh",
      "dedup_simhash", "knn_join_blocked")
    for (name <- SparkEntry.queries.keys.toSeq.sorted if !allPairsOk(name)) {
      assert(!plan(name).contains("CartesianProduct"), s"$name plans a cartesian")
    }
  }

  test("runtime bloom-filter pruning injects on a selective shuffle join") {
    // At 100 TB the win is scan-side: a bloom filter built from the
    // selective dimension side prunes fact rows BEFORE the shuffle.
    // The size thresholds that gate injection are cluster-tuned; here
    // they're forced so the tiny test tables qualify, proving the
    // engine's joins are injection-eligible (shape, not size).
    val c = spark.conf
    val savedApp = c.getOption(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val savedBc = c.getOption("spark.sql.autoBroadcastJoinThreshold")
    c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle join
    try {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ords = spark.read.parquet(s"$dir/orders.parquet")
        .filter("o_orderpriority = '1-URGENT'")
      val j = li.join(ords, li("l_orderkey") === ords("o_orderkey"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"no runtime bloom filter injected:\n$opt")
    } finally {
      savedApp match {
        case Some(v) => c.set(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", v)
        case None => c.unset(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      }
      savedBc match {
        case Some(v) => c.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => c.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }
}
