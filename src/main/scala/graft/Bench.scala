package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

object Bench {

  /**
   * Wrap a query so NOTHING can be pruned: hash every output column of
   * every row into one checksum row. The previous wrapper —
   * `groupBy().count()` — let Catalyst optimize the COUNT, not the
   * query: a count over a left join whose right side it can prove
   * unique on the join keys ELIMINATES the join, which silently
   * dropped the entire approximate pipeline out of the self-checking
   * registry queries (measured: `knn_join_blocked`'s count-wrapped
   * optimized plan contained only the exact sibling). Timings and
   * plan fingerprints must cover the plan the real query runs, so the
   * wrapper now consumes every column: per-row xxhash64 over the
   * string forms, folded with bit_xor (overflow-safe under ANSI).
   * Verify (the correctness path) writes real output and never
   * wrapped; this affects evidence collection only.
   */
  def consumed(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("checksum"))
  }

  /**
   * Fingerprint of the EXECUTED physical plan (post-AQE final plan):
   * the operator tree with per-run noise stripped — expression ids
   * (#123), plan/subquery ids, file paths/sizes, statistics. Two runs
   * of the same query must fingerprint identically unless AQE actually
   * picked a different plan — which is exactly the event the bench
   * needs to see, because a silent broadcast→sort-merge flip reads as
   * a timing regression otherwise.
   */
  def normalizedPlan(df: DataFrame): String = {
    val executed = df.queryExecution.executedPlan
    val finalPlan = executed match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // Fold the one AQE artifact that is RUN-ORDER, not plan, signal:
    // when AQE converts a statically-planned shuffle join to broadcast
    // mid-run, an ENSURE_REQUIREMENTS exchange that happened to
    // materialize BEFORE the conversion survives in the final plan as
    // a local-read wrapper (AQEShuffleRead local → ShuffleQueryStage →
    // Exchange), while one that hadn't started yet is elided — and
    // which stage wins that race is settled by the environment
    // (local[4] vs local[32] flipped q5_local_supplier's fingerprint
    // between `sbt test` and the bench sweep in r10 while the operator
    // tree was IDENTICAL). A local read is a pass-through of the map
    // outputs — strip the wrapper and fingerprint the operator tree
    // both environments agree on. Explicit-repartition shuffles
    // (REPARTITION_BY_*/REBALANCE) are kept: a local read over one of
    // those defeats a partitioning the query asked for by name, which
    // IS a plan change worth failing on.
    stripLocalReads(finalPlan).toString
      .replaceAll("#\\d+[L]?", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("exprId=\\d+", "exprId=x")
      .replaceAll("subquery\\d+", "subqueryx")
      .replaceAll("cw-\\d+", "cw-x")
      .replaceAll("Statistics\\([^)]*\\)", "Statistics(x)")
      .replaceAll("size=[\\d.]+ [KMGT]?i?B", "size=x")
      .replaceAll("file:[^,\\]\\s]+", "file:x")
      .replaceAll("Location: [^\\n]+", "Location: x")
      .replaceAll("rowCount=\\d+", "rowCount=x")
      .replaceAll("LocalTableScan \\[[^\\]]*\\]", "LocalTableScan [x]")
      // lambda variable names (`lambda x_15`, and `y_15` for a
      // two-arg zip_with) come from a session-global counter that
      // advances per query CONSTRUCTION — two runs of the same query
      // get different names. Pure noise, never a plan change.
      .replaceAll("lambda ([a-z])_\\d+", "lambda $1_N")
      // JVM synthetic lambda class names in typed-operator toStrings
      // (`MapPartitions graft...$$Lambda$2602/0x00007f11...`): the
      // index and address are per-JVM, the enclosing class is not.
      .replaceAll("\\$\\$Lambda\\$?\\d*/0x[0-9a-f]+", "\\$\\$Lambda\\$x")
      // JVM identity hashes in parameter toStrings (e.g. the hyperplane
      // matrix `[D@121bc70a` inside HyperplaneCodeD) vary per object.
      .replaceAll("@[0-9a-f]{4,}", "@x")
      // big numeric literals (epoch micros etc.) — MUST run after the
      // hex-address and identity-hash rules above: a random hash/address
      // sometimes contains an 8+ digit decimal run, and rewriting it
      // first leaves `$$Lambda$xNf8`-style shrapnel those rules no
      // longer match (observed as a bistable mm_features fingerprint).
      .replaceAll("\\d{8,}", "N")
      // The DataFilters metadata value is truncated to a FIXED CHAR
      // BUDGET (spark.sql.maxMetadataStringLength, 100): session-global
      // variable-width tokens inside it (expr ids `#12345`, lambda
      // names `x_1044`) consume budget, so the same plan truncates at
      // different content — or not at all — depending on how old the
      // session is. Unfixable by trimming; mask the whole value (an
      // empty list still reads distinctly, and predicate-pushdown
      // shape is pinned by PlanQualitySpec, not the fingerprint).
      .replaceAll("DataFilters: \\[[^\\]\\n][^\\n]*?, Format:",
        "DataFilters: [x], Format:")
      // remaining truncations (field-count ellipses etc.): trim a
      // margin so a shifted cut point can't leak run-varying bytes
      .replaceAll(".{64}\\.\\.\\.", "...")
      // AQE numbers query stages in MATERIALIZATION order — two
      // independent stages racing to finish swap ids between runs
      // (observed on tfidf_terms: BroadcastQueryStage 2↔3). Same for
      // the whole-stage-codegen span ids `*(4)` that follow from stage
      // order. The tree structure itself is position-encoded, so
      // masking the labels can't hide a real operator change.
      .replaceAll("QueryStage \\d+", "QueryStage x")
      .replaceAll("\\*\\(\\d+\\)", "*(n)")
      // Partition COUNTS inside partitioning descriptors track the
      // session's parallelism (shuffle.partitions, defaultParallelism
      // via ScaleGuard's fan-out), i.e. the machine — not the plan.
      // Masking the number keeps the partitioning KIND (hash vs range
      // vs round-robin vs SinglePartition) fully visible, which is the
      // strategy signal the fingerprint exists for. The trailing-arg
      // rule also masks literal last-args like round(x, 6) — fine: a
      // changed literal changes RESULTS, which the oracle owns.
      .replaceAll("RoundRobinPartitioning\\(\\d+\\)", "RoundRobinPartitioning(x)")
      .replaceAll(", \\d+\\)", ", x)")
  }

  /** The wrapper strip behind [[normalizedPlan]]. QueryStageExec nodes
    * are LEAVES of the AQE plan tree (their `plan` is display-only, not
    * a child), so a plain transformUp never reaches wrappers inside a
    * stage — each stage's inner plan is recursed into explicitly. */
  private def stripLocalReads(
      plan: org.apache.spark.sql.execution.SparkPlan)
      : org.apache.spark.sql.execution.SparkPlan = {
    import org.apache.spark.sql.execution.adaptive._
    plan.transformUp {
      case r: AQEShuffleReadExec if r.isLocalRead =>
        r.child match {
          case s: ShuffleQueryStageExec
              if s.shuffle.shuffleOrigin ==
                org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS =>
            stripLocalReads(s.shuffle.child)
          case _ => r
        }
      case s: ShuffleQueryStageExec => s.copy(plan = stripLocalReads(s.plan))
      case b: BroadcastQueryStageExec => b.copy(plan = stripLocalReads(b.plan))
      case q: ResultQueryStageExec => q.copy(plan = stripLocalReads(q.plan))
      case t: TableCacheQueryStageExec => t.copy(plan = stripLocalReads(t.plan))
    }
  }

  def planFingerprint(df: DataFrame): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(normalizedPlan(df).getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm JIT/codegen on the smallest SF so the first timed query
    // doesn't absorb JVM warmup
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }
    // optional comma-separated subset, e.g. SPARK_GRAFT_ONLY=q1_agg,knn
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name)) }
    // min-of-N timed runs in ONE JVM — absorbs GC/compilation noise
    // (the r2↔r3 drivers saw 3.3× swings on identical binaries with
    // min-of-2). A failed run must NOT report a plausible wall time:
    // the error is carried per query (value -1) so the signal can't lie.
    def timeOnce(fn: (SparkSession, String) => DataFrame)
        : (Double, Option[String], Option[String]) = {
      val t0 = System.nanoTime()
      val (err, fp) = try {
        // consume through a Dataset we keep a handle on: collect()
        // executes ITS queryExecution, so the AQE plan finalizes in
        // place and the fingerprint below reads the plan that actually
        // ran (df.count() would execute a throwaway QueryExecution,
        // leaving df's own plan un-finalized)
        val counted = consumed(fn(spark, sfDir))
        counted.collect()
        (None, Some(normalizedPlan(counted)))
      } catch {
        case t: Throwable =>
          (Some((t.getClass.getSimpleName + ": " +
            Option(t.getMessage).getOrElse("")).take(160)
            .replaceAll("[\"\\\\\\n\\r\\t]", " ")), None)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop blocks leaked by this run's localCheckpoint/persist calls
      // (iterative operators checkpoint per round): 83 queries × 3 runs
      // would otherwise pile hundreds of cached partitions into the
      // block manager, squeezing execution memory for later queries —
      // timings would depend on run order and driver heap, not the plan
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (dt, err, fp)
    }
    val results = selected.map { case (name, fn) =>
      val attempts = (1 to math.max(runs, 1)).map(_ => timeOnce(fn))
      val best = attempts.map(_._1).min
      val spreadPct =
        if (best > 0) (attempts.map(_._1).max - best) / best * 100 else 0.0
      val err = attempts.flatMap(_._2).headOption
      val planTexts = attempts.flatMap(_._3).distinct
      val md = java.security.MessageDigest.getInstance("MD5")
      def fpOf(t: String): String =
        md.digest(t.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString
      val fps = planTexts.map(fpOf)
      // >1 distinct fingerprint across same-JVM runs = AQE plan flip;
      // surfaced as "fp1|fp2" so a timing swing can be attributed —
      // and each distinct plan TEXT is dumped so the flip can be
      // DIAGNOSED from the artifact (a flip that only reproduces
      // under full-sweep memory pressure is otherwise uncatchable:
      // this round's dedup_simhash flip was stable through 4-run
      // standalone benches and 4-run FpProbe)
      if (fps.size > 1) {
        val dumpDir = java.nio.file.Paths.get("target/flipdump")
        java.nio.file.Files.createDirectories(dumpDir)
        planTexts.foreach { t =>
          java.nio.file.Files.writeString(
            dumpDir.resolve(s"${name}_${fpOf(t)}.txt"), t)
        }
      }
      name -> (best, err, fps.mkString("|"), spreadPct)
    }
    val qs = results.map { case (k, (t, err, _, _)) =>
      s"\"" + k + "\":" + (if (err.isDefined) "-1" else t)
    }.mkString("{", ",", "}")
    val plans = results.map { case (k, (_, _, fp, _)) =>
      s"\"" + k + "\":\"" + fp + "\""
    }.mkString("{", ",", "}")
    val spreads = results.map { case (k, (_, _, _, sp)) =>
      s"\"" + k + "\":" + math.rint(sp * 10) / 10
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, Some(e), _, _)) =>
      s"\"" + k + "\":\"" + e + "\""
    }.mkString("{", ",", "}")
    val ok = results.collect { case (_, (t, None, _, _)) => t }
    val total = if (ok.nonEmpty) ok.sum else 0.0
    val nErr = results.count(_._2._2.isDefined)
    val nFlips = results.count(_._2._3.contains("|"))
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"plans":$plans,"spread_pct":$spreads,"plan_flips":$nFlips,"errors":$errs,"n_errors":$nErr,"runs":$runs,"sf":"$sfDir"}"""
    println(json)
    // ALSO persist to a stable artifact: the driver's stdout capture
    // has truncated the per-query map before (BENCH_r08) — a file
    // named by the SF can't lose the data
    val sfName = new java.io.File(sfDir).getName
    val outPath = java.nio.file.Paths.get(s"target/bench_${sfName}_last.json")
    try {
      java.nio.file.Files.createDirectories(outPath.getParent)
      java.nio.file.Files.write(outPath, (json + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // artifact write must not fail the bench
    spark.stop()
    // FINAL stdout line: a compact summary that fits a bounded tail
    // capture. The full line above is ~7 KB for a 136-query registry —
    // the r10 driver kept only the last ~2000 stdout chars, so its
    // record showed `parsed: null` while the numbers lived only in the
    // target/ artifacts. Per-query timings stay in the full line and
    // in the artifact this line points to.
    val slowest = results.toSeq.sortBy(-_._2._1).take(5)
      .map { case (k, (t, _, _, _)) =>
        s"\"" + k + "\":" + math.rint(t * 10) / 10 }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${math.rint(total * 10) / 10},"unit":"sec","n_queries":${results.size},"plan_flips":$nFlips,"n_errors":$nErr,"runs":$runs,"sf":"$sfDir","slowest":$slowest,"queries_file":"$outPath"}""")
    if (nErr > 0) sys.exit(1)
  }
}
