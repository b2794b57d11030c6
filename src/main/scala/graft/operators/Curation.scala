package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Corpus-curation operators a large-scale training-data pipeline runs
 * between raw ingest and the tokenizer: benchmark decontamination,
 * deterministic mixture sampling, repetition filtering, and
 * per-stratum quality selection.
 *
 * Scale design mirrors graft.operators.Dedup: candidate generation is
 * always an equi-join on a hashed blocking key; the only windows are
 * partitioned by a bounded stratum key (never a global sort); sampling
 * is content-hash-deterministic so 1000 executors need no shared RNG
 * state and a rerun reproduces the same corpus bit-for-bit.
 */
object Curation {

  /**
   * Benchmark decontamination — flag training documents that share any
   * word n-gram with a held-out evaluation set. The standard guard
   * against test-set leakage into a training corpus (the reference
   * pipeline has no equivalent; this is LLM-pipeline surface).
   *
   * Shape at 100 TB: eval suites are tiny (10^4..10^6 shingles)
   * relative to the corpus, so the distinct eval-shingle set is
   * BROADCAST and the training-side scan never shuffles — each task
   * hashes its shingles and probes the broadcast set locally. The one
   * keyed shuffle is the per-doc count aggregate, with map-side
   * partial counts. Shingles travel as xxhash64 longs (fixed width,
   * collision odds irrelevant at these set sizes).
   *
   * @param train training documents (idCol, textCol)
   * @param eval  evaluation/benchmark documents (idCol, textCol)
   * @return one row per training doc: id, n_shared distinct shingles
   *         that appear anywhere in the eval set, contaminated flag
   */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    val evalShingles = Dedup.shingleHashes(eval, idCol, textCol, n)
      .select(col("s")).distinct()
    val shared = Dedup.shingleHashes(train, idCol, textCol, n)
      .join(broadcast(evalShingles), "s")
      .groupBy(col("doc")).agg(count(lit(1)).as("n_shared"))
    train.select(col(idCol))
      .join(shared.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") > 0)
      .orderBy(col(idCol))
  }

  /**
   * Bloom-prefiltered decontamination — same contract as
   * [[decontaminate]], for the regime where the eval-shingle set is
   * too large to broadcast as an exact hash relation. A Bloom filter
   * at 1% fpp is ~1.2 bytes/item versus 8-byte hash longs plus
   * hash-set overhead (~10× smaller), so the corpus-side scan probes a
   * compact bitmap and only the ~fpp fraction of non-matching shingles
   * (plus true hits) reach the exact-confirm join. Bloom filters have
   * NO false negatives, so with the confirm join the result is
   * bit-identical to the exact operator — the registry form asserts
   * exactly that.
   *
   * Mechanics: the filter is built by the native partial-aggregating
   * `BloomFilterAggregate` (each task folds its shingles locally; only
   * filter bitmaps shuffle), collected once as model parameters
   * (`numBits/8` bytes), and re-enters the plan as a foldable binary
   * literal probed by the codegen'd `BloomFilterMightContain` — the
   * same expression pair Spark's runtime-filter rule injects, driven
   * here explicitly. Shingles are already xxhash64 longs
   * (Dedup.shingleHashes), so no extra hashing layer is needed on
   * either side.
   */
  def decontaminateBloom(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 5, expectedEvalShingles: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.ColumnBridge
    import org.apache.spark.util.sketch.BloomFilter

    val evalShingles = Dedup.shingleHashes(eval, idCol, textCol, n)
      .select(col("s")).distinct()
    val numBits = BloomFilter.optimalNumOfBits(expectedEvalShingles, fpp)
    val bloomAgg = ColumnBridge.column(new BloomFilterAggregate(
        ColumnBridge.expression(col("s")),
        Literal(expectedEvalShingles), Literal(numBits))
      .toAggregateExpression())
    // one row of numBits/8 bytes — model parameters, like IVF centroids
    val bloomBytes = evalShingles.agg(bloomAgg.as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloomBytes,
        org.apache.spark.sql.types.BinaryType),
      ColumnBridge.expression(col("s"))))
    val candidates = Dedup.shingleHashes(train, idCol, textCol, n)
      .filter(mightContain)
    // exact confirm kills the fpp false positives. The join is pinned
    // shuffle-hash building the eval side: broadcasting would re-import
    // the "eval fits in one executor" assumption this operator exists
    // to drop, and an unhinted smallish-vs-smallish join lets AQE pick
    // the build side by stage-arrival order (a real plan flip). The
    // shuffle only carries bloom survivors (~fpp · corpus + true hits)
    // against the eval longs — both post-prune relations.
    val shared = candidates
      .join(evalShingles.hint("shuffle_hash"), "s")
      .groupBy(col("doc")).agg(count(lit(1)).as("n_shared"))
    train.select(col(idCol))
      .join(shared.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") > 0)
      .orderBy(col(idCol))
  }

  /**
   * Deterministic per-stratum quota sampling — the mixture-control
   * step that downsamples each source/domain to a target row budget.
   * Rank within each stratum by md5 of the id (a content-derived
   * uniform order), keep the first `quota`. No RNG: the sample is a
   * pure function of the data, reproducible across reruns, engines,
   * and repartitioning — on a cluster every executor agrees without
   * coordination, and appending new data never evicts a previously
   * sampled row that still ranks under quota.
   *
   * The window partitions by the stratum key only — work distributes
   * across strata, and a single stratum is bounded by its own row
   * count (for skewed strata, pre-filter with a cheap hash-range cut
   * before ranking; at quota ≪ stratum size the rank is a top-k per
   * key, which Spark executes with per-partition partial top-k).
   */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      quota: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.select(col(idCol), col(strataCol),
        row_number().over(w).cast("long").as("sample_rank"))
      .filter(col("sample_rank") <= quota)
      .orderBy(col(idCol))
  }

  /**
   * Target-weight mixture downsampling — the "data mixture" step that
   * reshapes a corpus to prescribed stratum proportions (40% en, 15%
   * de, …) WITHOUT upsampling: the output is the largest corpus whose
   * stratum shares match the integer weights, i.e. capacity
   * M = min_s ⌊n_s·denom/w_s⌋ and each stratum keeps its
   * ⌊w_s·M/denom⌋ best-ranked rows. All arithmetic is integer (no
   * float shares to disagree at a cut) and ranking is the
   * content-hash order of [[stratifiedSample]] — deterministic across
   * reruns, engines, and partitioning, no RNG state on 1000 executors.
   * Strata absent from `weights` (or weighted 0) are dropped.
   *
   * Shape at scale: one narrow stratum-keyed count (≤|weights| rows →
   * the capacity is driver-free, a 1-row aggregate re-entering by
   * broadcast), then one window partitioned by stratum for the rank.
   * The dims join is broadcast-honest because the stratum domain is
   * bounded by the weights list itself.
   *
   * @param weights (stratum value, integer weight) pairs; shares are
   *                weight/denom with denom = Σweights (e.g. percents
   *                summing to 100)
   */
  def mixtureSample(df: DataFrame, idCol: String, strataCol: String,
      weights: Seq[(String, Int)]): DataFrame = {
    require(weights.nonEmpty, "need at least one stratum weight")
    require(weights.forall(_._2 >= 0), "weights must be non-negative")
    val denom = weights.map(_._2.toLong).sum
    require(denom > 0, "weights must not all be zero")
    val wMap = map(weights.flatMap { case (s, w) =>
      Seq(lit(s), lit(w.toLong)) }: _*)
    val base = df.select(col(idCol), col(strataCol).as("stratum"))
      .withColumn("w", element_at(wMap, col("stratum")))
      .filter(col("w").isNotNull && col("w") > 0)
    val counts = base.groupBy(col("stratum"), col("w"))
      .agg(count(lit(1)).as("stratum_n"))
    val capacity = counts
      .agg(min(expr(s"stratum_n * ${denom}L div w")).as("m"))
    val dims = counts.crossJoin(broadcast(capacity))
      .select(col("stratum"), col("stratum_n"),
        expr(s"w * m div ${denom}L").as("keep_n"))
    val rankW = Window.partitionBy(col("stratum"))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    base.join(broadcast(dims), "stratum")
      .withColumn("mix_rank", row_number().over(rankW).cast("long"))
      .filter(col("mix_rank") <= col("keep_n"))
      .select(col(idCol), col("stratum"), col("stratum_n"),
        col("mix_rank"), col("keep_n"))
      .orderBy(col(idCol))
  }

  /**
   * Intra-document repetition score — the boilerplate/spam signal:
   * fraction of a document's word n-grams that are repeats of an
   * earlier n-gram in the same document. Computed from the exploded
   * shingle table (codegen'd posexplode + lead, see
   * Dedup.shingleHashes) with ONE shuffle keyed on the doc id
   * (count + count-distinct partial-aggregate in the same pass).
   * Documents shorter than n words score 0 (nothing to repeat).
   */
  def repetitionScore(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.2): DataFrame = {
    val sh = Dedup.shingleHashes(df, idCol, textCol, n, distinctRows = false)
    val agg = sh.groupBy(col("doc"))
      .agg(count(lit(1)).as("n_grams"),
        count_distinct(col("s")).as("n_distinct"))
    df.select(col(idCol))
      .join(agg.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"))
      .withColumn("dup_ratio",
        round(when(col("n_grams") === 0, lit(0.0))
          .otherwise(lit(1.0) - col("n_distinct") / col("n_grams").cast("double")), 6))
      .withColumn("is_repetitive", col("dup_ratio") > threshold)
      .orderBy(col(idCol))
  }

  /**
   * Sequence packing — the concat-and-cut batch assembly LM training
   * pipelines run last: documents are laid end-to-end in id order into
   * one global token stream, which is cut every `capacity` tokens;
   * each document reports its exact stream offset and the bins its
   * tokens land in (straddling docs span two).
   *
   * The global exclusive prefix sum is computed WITHOUT a
   * single-partition sort (the same pattern as q_ntile_spread):
   * deterministic range-slice ids from driver-sampled literal bounds
   * on id (operators/RangeSlice.scala), per-slice token totals — one
   * row per slice, constant-sized — cumulated and broadcast back as
   * offsets, then a slice-local running sum on top. Every data-sized
   * stage runs at full parallelism, and because the slice id is a pure
   * function of the row both plan branches recompute the SAME slicing:
   * no pinned partition ids, no checkpoint, recompute-safe.
   */
  def sequencePack(df: DataFrame, idCol: String, tokCol: String,
      capacity: Long): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val base0 = df.select(col(idCol), col(tokCol).cast("long").as("n_tokens"))
    val base = RangeSlice.withSliceId(base0, Seq(col(idCol)), parts, "sid")
    val wOff = Window.orderBy(col("sid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("sid")).agg(sum(col("n_tokens")).as("toks"))
      .withColumn("off", coalesce(sum(col("toks")).over(wOff), lit(0L)))
      .select(col("sid"), col("off"))
    val wLocal = Window.partitionBy(col("sid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), "sid")
      .withColumn("token_start",
        col("off") + coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
      // an empty doc occupies no tokens: its "last token" is its start
      .withColumn("tok_end",
        col("token_start") + greatest(col("n_tokens"), lit(1L)) - 1)
      .select(col(idCol), col("n_tokens"), col("token_start"),
        expr(s"token_start div ${capacity}L").as("start_bin"),
        expr(s"tok_end div ${capacity}L").as("end_bin"))
      .withColumn("straddles", col("start_bin") =!= col("end_bin"))
      .orderBy(col(idCol))
  }

  /**
   * Weight-proportional systematic sampling — pick EXACTLY k "grid
   * hits" from the corpus with selection probability proportional to a
   * weight column, entirely in integer arithmetic (the float-free
   * sibling of A-ES/exponential-keys sampling: ln/pow priorities
   * differ across engines in the last ulp — the cross-engine hash-flip
   * class this registry bans — while the systematic grid is exact in
   * any engine): lay the docs end-to-end on the cumulative weight
   * line in id order, then take the k evenly spaced grid points
   * j·W/k. A doc is picked iff its weight interval [s, s+w) covers a
   * grid point: n_hits = ⌈k(s+w)/W⌉ − ⌈ks/W⌉, which telescopes to
   * exactly k over the corpus; a doc heavier than W/k gets multiple
   * hits (its oversampling multiplicity, reported — real pipelines
   * repeat or upweight it).
   *
   * The cumulative line is the same RangeSlice exclusive-prefix-sum
   * shape as [[sequencePack]]: no single-partition sort, slice totals
   * broadcast back, recompute-safe.
   */
  def weightedSystematicSample(df: DataFrame, idCol: String, wCol: String,
      k: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val base0 = df.select(col(idCol), col(wCol).cast("long").as("w"))
      .filter(col("w") > 0)
    val base = RangeSlice.withSliceId(base0, Seq(col(idCol)), parts, "sid")
    val wOff = Window.orderBy(col("sid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("sid")).agg(sum(col("w")).as("sw"))
      .withColumn("off", coalesce(sum(col("sw")).over(wOff), lit(0L)))
      .select(col("sid"), col("off"))
    val wLocal = Window.partitionBy(col("sid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = base0.agg(sum(col("w")).as("tw"))
    base.join(broadcast(offsets), "sid")
      .withColumn("w_start",
        col("off") + coalesce(sum(col("w")).over(wLocal), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("n_hits",
        expr(s"($k * (w_start + w) + tw - 1) div tw" +
          s" - ($k * w_start + tw - 1) div tw"))
      .filter(col("n_hits") > 0)
      .select(col(idCol), col("w").as("weight"), col("w_start"), col("n_hits"))
      .orderBy(col(idCol))
  }

  /**
   * Per-stratum quality selection — keep the best half (or any
   * `keepNumer/keepDenom` fraction) of each stratum by a quality
   * column, integer-exact: a row stays iff rank·denom ≤ count·numer,
   * with rank from a window ordered by (quality desc, id). Avoids
   * percent_rank's float boundary (engines disagree in the last ulp
   * exactly at the cut). The window partitions by stratum — same
   * distribution argument as stratifiedSample.
   */
  def qualityStratified(df: DataFrame, idCol: String, strataCol: String,
      qualityCol: String, keepNumer: Int = 1, keepDenom: Int = 2): DataFrame = {
    val byStratum = Window.partitionBy(col(strataCol))
    val w = byStratum.orderBy(col(qualityCol).desc, col(idCol))
    df.select(col(idCol), col(strataCol), col(qualityCol),
        row_number().over(w).cast("long").as("q_rank"),
        count(lit(1)).over(byStratum).as("stratum_n"))
      .filter(col("q_rank") * keepDenom <= col("stratum_n") * keepNumer)
      .orderBy(col(idCol))
  }

  /**
   * Contamination REPORT — the eval-side view [[decontaminate]] is
   * missing: per BENCHMARK document, how many training docs share an
   * n-gram with it and how much of it is covered. decontaminate
   * answers "which training docs do I drop"; this answers "which eval
   * items are compromised and how badly" — the report a benchmark
   * owner files before trusting a score, and the evidence for
   * tightening n when a whole eval split lights up.
   *
   * Scale shape: the eval shingle relation is benchmark-sized —
   * BROADCAST to the training scan (same argument as decontaminate, in
   * the opposite join direction), so the corpus never shuffles its
   * shingles; the per-(eval doc) distinct counts aggregate the
   * join output, which is hit-sized, not corpus-sized.
   *
   * @return one row per eval doc: id, n_hit_train_docs (distinct
   *         training docs sharing ≥1 n-gram), n_shared_grams (its own
   *         distinct n-grams seen anywhere in training), contaminated
   */
  def contaminationReport(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val evalSh = Dedup.shingleHashes(eval, idCol, textCol, n)
      .select(col("doc").as("eval_id"), col("s"))
    // hit-sized (bounded by shared shingles), read by both distinct
    // counts below — materialized so the corpus-side scan runs once.
    // The two counts are SEPARATE single-distinct aggregates, not one
    // two-countDistinct agg: Spark's RewriteDistinctAggregates expands
    // multiple distinct groups in nondeterministic enumeration order
    // (run-to-run plan flip, caught by PlanFingerprintSpec's
    // same-JVM double run).
    val hits = Dedup.materialize(
      Dedup.shingleHashes(train, idCol, textCol, n)
        .join(broadcast(evalSh), "s")
        .select(col("eval_id"), col("doc"), col("s")))
    val hitDocs = hits.select(col("eval_id"), col("doc")).distinct()
      .groupBy(col("eval_id")).agg(count(lit(1)).as("n_hit_train_docs"))
    val hitGrams = hits.select(col("eval_id"), col("s")).distinct()
      .groupBy(col("eval_id")).agg(count(lit(1)).as("n_shared_grams"))
    // eval-id-sized joins on both sides: shuffle-hash-pinned so AQE
    // can't race the build-side choice (the dedup_components class)
    eval.select(col(idCol).as("eval_id"))
      .join(hitDocs.hint("shuffle_hash"), Seq("eval_id"), "left")
      .join(hitGrams.hint("shuffle_hash"), Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_hit_train_docs"), lit(0L)).as("n_hit_train_docs"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .withColumn("contaminated", col("n_shared_grams") > 0)
      .orderBy(col("eval_id"))
  }

  /**
   * MULTI-BENCHMARK contamination coverage — [[contaminationReport]]
   * generalized to the shape a real eval owner runs: the eval table
   * carries a BENCHMARK id column (one eval suite = many benchmarks),
   * and the report rolls up per benchmark — how many of its items are
   * compromised (and how badly), how many distinct training docs and
   * distinct n-grams are implicated. One row per benchmark, so a
   * whole suite's health is one glance; the per-item drill-down stays
   * [[contaminationReport]] on the filtered benchmark.
   *
   * Scale shape: identical to the single report — eval shingles are
   * benchmark-suite-sized and BROADCAST to the training scan (the
   * corpus never shuffles its shingles); every rollup aggregates the
   * hit-sized join output. The three distinct counts are SEPARATE
   * single-distinct aggregates joined back (never one
   * multi-countDistinct agg — the RewriteDistinctAggregates
   * plan-flip class), and contamination_ppm is integer arithmetic.
   */
  def contaminationReportMulti(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, benchCol: String,
      n: Int = 5): DataFrame = {
    val benches = eval.select(col(idCol).as("eval_id"),
      col(benchCol).as("bench"))
    val evalSh = Dedup.shingleHashes(eval, idCol, textCol, n)
      .select(col("doc").as("eval_id"), col("s"))
      .join(broadcast(benches), "eval_id")
    val hits = Dedup.materialize(
      Dedup.shingleHashes(train, idCol, textCol, n)
        .join(broadcast(evalSh), "s")
        .select(col("bench"), col("eval_id"), col("doc"), col("s")))
    def per(dims: Seq[String], as: String) =
      hits.select(col("bench") +: dims.map(col): _*).distinct()
        .groupBy(col("bench")).agg(count(lit(1)).as(as))
    val nEval = benches.groupBy(col("bench"))
      .agg(count(lit(1)).as("n_eval_docs"))
    nEval
      .join(per(Seq("eval_id"), "n_contaminated").hint("shuffle_hash"),
        Seq("bench"), "left")
      .join(per(Seq("doc"), "n_hit_train_docs").hint("shuffle_hash"),
        Seq("bench"), "left")
      .join(per(Seq("s"), "n_shared_grams").hint("shuffle_hash"),
        Seq("bench"), "left")
      .select(col("bench"), col("n_eval_docs"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        coalesce(col("n_hit_train_docs"), lit(0L)).as("n_hit_train_docs"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .withColumn("contamination_ppm",
        expr("n_contaminated * 1000000 div n_eval_docs"))
      .orderBy(col("bench"))
  }

  /**
   * Per-source document cap — keep at most `cap` documents per source,
   * ranked by a quality column (FineWeb/RefinedWeb-style domain caps:
   * no single domain may contribute more than a bounded slice of the
   * corpus, and within the budget the best documents win). Ties break
   * on id so the cut is deterministic.
   *
   * Scale shape: a rank-limit filter directly over the window lets
   * Spark plan a WindowGroupLimit — each map task keeps only its
   * per-source top-`cap` BEFORE the shuffle, so the exchange carries
   * O(sources·cap) rows, not the corpus. That partial top-N is the
   * whole point at 100 TB: a web snapshot has ~10⁷ domains and a cap
   * of tens, so the post-limit relation is ~10⁸ rows regardless of
   * corpus size.
   */
  def sourceCap(df: DataFrame, idCol: String, strataCol: String,
      qualityCol: String, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(qualityCol).desc, col(idCol))
    df.select(col(strataCol), col(idCol), col(qualityCol),
        row_number().over(w).cast("long").as("q_rank"))
      .filter(col("q_rank") <= cap)
      .orderBy(col(strataCol), col(idCol))
  }

  /**
   * Deterministic seeded global shuffle + token-budget shard
   * assignment — the training-order export step: documents are laid
   * end-to-end in a pseudo-random but reproducible order (md5 of
   * seed|id — any engine agrees on it, re-runs agree with themselves),
   * and each doc is assigned to the shard whose token budget its
   * first token lands in. Downstream trainers read shard k as one
   * contiguous token range.
   *
   * Scale shape: the shuffle order is a pure column function (no
   * sampled RNG state), and the global exclusive prefix sum over that
   * order is the [[sequencePack]] RangeSlice pattern — slice ids from
   * driver-sampled literal bounds on the ORDER KEY, per-slice totals
   * cumulated and broadcast back, slice-local running sums on top. No
   * single-partition sort, no pinned partition ids, recompute-safe.
   */
  def shuffleShards(df: DataFrame, idCol: String, tokCol: String,
      shardTokens: Long, seed: String = "s42"): DataFrame = {
    require(shardTokens >= 1, s"shardTokens must be >= 1, got $shardTokens")
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val base0 = df.select(col(idCol),
      md5(concat(lit(seed + "|"), col(idCol).cast("string"))).as("ok"),
      col(tokCol).cast("long").as("n_tokens"))
    val base = RangeSlice.withSliceId(base0, Seq(col("ok"), col(idCol)),
      parts, "sid")
    val wOff = Window.orderBy(col("sid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("sid")).agg(sum(col("n_tokens")).as("toks"))
      .withColumn("off", coalesce(sum(col("toks")).over(wOff), lit(0L)))
      .select(col("sid"), col("off"))
    val wLocal = Window.partitionBy(col("sid")).orderBy(col("ok"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), "sid")
      .withColumn("token_start",
        col("off") + coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
      .select(col(idCol), col("n_tokens"), col("token_start"),
        expr(s"token_start div ${shardTokens}L").as("shard_id"))
      .orderBy(col(idCol))
  }

  /**
   * PSI drift monitor — population stability index between a
   * reference corpus snapshot and the current one, per feature
   * bucket: the standard "did yesterday's distribution shift?" alarm
   * a data pipeline runs before letting a new batch into training.
   * PSI = Σ_b (q_b − p_b)·ln(q_b/p_b) with p from the reference and q
   * from the current snapshot (add-one smoothed over `buckets`);
   * > 0.1 is the conventional moderate-drift alarm.
   *
   * Scale shape: each side collapses to a `buckets`-row count in one
   * keyed aggregate with map-side partials; everything after runs on
   * bounded relations (outer-join on bucket id, 1-row totals by
   * broadcast). Determinism: per-bucket contributions are scaled to
   * integer ppm (one ln from exact counts), so the total is an
   * order-independent integer sum both engines agree on exactly.
   *
   * @param bucket bucketing expression over a row (e.g.
   *               `col("n_chars") / 120`); values clamp to
   *               [0, buckets)
   */
  def psiDrift(reference: DataFrame, current: DataFrame, bucket: Column,
      buckets: Int = 10, alarmPpm: Long = 100000L): DataFrame = {
    require(buckets > 1, "need at least two buckets")
    def side(df: DataFrame, as: String): DataFrame =
      df.select(least(lit(buckets - 1).cast("long"),
          greatest(lit(0L), bucket.cast("long"))).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(as))
    // the FULL 0..buckets-1 domain, not just buckets present in a
    // snapshot: add-one smoothing gives a bucket empty on BOTH sides
    // a nonzero (q−p)·ln(q/p) term whenever the totals differ, so
    // summing only over observed buckets deviates from the
    // fixed-domain PSI definition when buckets vanish from both.
    // Both count sides are bucket-count-sized aggregates — explicit
    // broadcasts pin the build side (tiny-join AQE flips are the
    // dedup_components class).
    val domain = reference.sparkSession.range(buckets)
      .select(col("id").as("bucket"))
    val joined = domain
      .join(broadcast(side(reference, "n_ref")), Seq("bucket"), "left")
      .join(broadcast(side(current, "n_cur")), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum(col("n_ref")).cast("double").as("rt"),
      sum(col("n_cur")).cast("double").as("ct"))
    val scored = joined.crossJoin(broadcast(totals))
      .withColumn("p", (col("n_ref") + 1).cast("double") / (col("rt") + buckets))
      .withColumn("q", (col("n_cur") + 1).cast("double") / (col("ct") + buckets))
      .withColumn("psi_ppm",
        round((col("q") - col("p")) * log(col("q") / col("p")) * 1e6, 0)
          .cast("long"))
      .select(col("bucket"), col("n_ref"), col("n_cur"), col("psi_ppm"))
    val total = scored.agg(sum(col("psi_ppm")).as("total_psi_ppm"))
    scored.crossJoin(broadcast(total))
      .withColumn("drifted", col("total_psi_ppm") > alarmPpm)
      .orderBy(col("bucket"))
  }

  /**
   * DSIR-style importance weights — data selection with importance
   * resampling (Xie et al. 2023, arXiv:2302.03169): score every raw
   * document by how target-like it is under hashed n-gram bag-of-words
   * language models of the target slice vs the whole corpus, so a raw
   * pile can be re-weighted toward a small high-quality target domain
   * without training a classifier.
   *
   * The feature-hashing trick is exactly what makes this a 100 TB
   * operator: unigrams+bigrams hash into `buckets` counts, so the two
   * "language models" are fixed-size vectors (one `buckets`-row
   * relation, ~tens of KB) regardless of corpus size — model
   * parameters, not data. The plan is one text scan → one keyed
   * aggregate on (doc, bucket) (map-side partial), from which the
   * bucket-marginal counts REUSE the first aggregate's output (a
   * second, `buckets`-sized agg — no second scan), and the smoothed
   * log-likelihood-ratio table re-enters by broadcast. No shuffle
   * touches anything wider than (doc_id, bucket, count).
   *
   * Determinism across engines: the per-bucket ratio is scaled to an
   * integer once (`round(1e6·ln(p̂_target(b)/p̂_raw(b)))`, add-one
   * smoothing over `buckets`), and each document's score is the
   * INTEGER sum Σ c_b·llr_ppm[b] — order-independent and exact, so
   * the oracle can hash-match it. The only float op is the one ln per
   * bucket, computed from exact integer counts identically on both
   * engines. Buckets are the first 8 hex chars of md5 mod `buckets`
   * (cross-engine reproducible, unlike xxhash64 which DuckDB lacks).
   *
   * @param isTarget row predicate defining the target slice (e.g.
   *                 `col("lang") === "en"`); target docs score too —
   *                 selection keeps any doc whose score is positive,
   *                 i.e. likelier under the target LM than the raw LM
   */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "need at least one hash bucket")
    val ws = graft.functions.TextFunctions.words(col(textCol))
    // unigrams ++ bigrams assembled array-side in one codegen'd
    // projection (no second explode pass over the text)
    val bigrams = zip_with(
      slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
      slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val feats = df.select(col(idCol).as("doc_id"), isTarget.as("is_target"),
        explode(concat(ws, bigrams)).as("feat"))
      .select(col("doc_id"), col("is_target"),
        (conv(substring(md5(col("feat").cast("binary")), 1, 8), 16, 10)
          .cast("long") % buckets).as("bucket"))
    // materialized (Dedup.materialize contract, conf-gated): the
    // (doc, bucket) counts feed FOUR consumers (bucket marginals,
    // totals, llr, final join) across separate query stages whose
    // broadcast subplans AQE cannot reuse — unmaterialized, the text
    // explode pipeline runs five times (measured in the executed plan)
    val docBucket = Dedup.materialize(
      feats.groupBy(col("doc_id"), col("is_target"), col("bucket"))
        .agg(count(lit(1)).as("c")))
    val bucketStats = docBucket.groupBy(col("bucket"))
      .agg(sum(col("c")).as("cnt_r"),
        sum(when(col("is_target"), col("c")).otherwise(lit(0L))).as("cnt_t"))
    val totals = bucketStats
      .agg(sum(col("cnt_r")).cast("double").as("r_total"),
        sum(col("cnt_t")).cast("double").as("t_total"))
    val llr = bucketStats.crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(log(((col("cnt_t") + 1).cast("double") * (col("r_total") + buckets)) /
                  ((col("cnt_r") + 1).cast("double") * (col("t_total") + buckets)))
          * 1e6, 0).cast("long").as("llr_ppm"))
    docBucket.join(broadcast(llr), "bucket")
      .groupBy(col("doc_id"), col("is_target"))
      .agg(sum(col("c")).as("n_feats"),
        sum(col("c") * col("llr_ppm")).as("score_ppm"))
      .withColumn("selected", col("score_ppm") > 0)
      .orderBy(col("doc_id"))
  }
}
