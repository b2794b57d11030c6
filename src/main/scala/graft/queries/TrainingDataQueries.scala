package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Curation, Dedup, Similarity, TextAnalysis, Tokenizer}

/**
 * §C/§D/§E — training-data pipeline operators bound to the testdata
 * `documents` and `embeddings` tables. The operators themselves live in
 * `graft.operators`; these wrappers fix the parameters the oracle
 * checks. The approximate ops (MinHash/SimHash/embedding-LSH/ANN) are
 * registered in SELF-CHECKING form: each runs next to its exact
 * sibling and emits the exact count plus recall/error-bound flags the
 * DuckDB oracle verifies (see `recallChecked`) — every registry entry
 * is oracle-checked, none is evidence-free. The raw approximate
 * outputs remain available as the `graft.operators` API and are
 * exercised by RecallSpec.
 */
object TrainingDataQueries {

  /**
   * End-to-end corpus curation — the operators composed the way a
   * training-data pipeline uses them: drop near-duplicates (keep the
   * lower doc_id of each Jaccard≥0.8 pair), then keep documents whose
   * quality score clears a bar. Output is the curated manifest.
   */
  def corpusCurate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val dupIds = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleFreq = 100)
      .select(col("id2").as("doc_id")).distinct()
    val quality = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("quality"), col("n_words"))
    docs.join(dupIds, Seq("doc_id"), "left_anti")
      .join(quality, "doc_id")
      .filter(col("quality") >= 0.5)
      .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n_chars"),
        col("n_words"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /**
   * Near-dup clustering: jaccard pairs → connected components →
   * every document labeled with its component (min doc_id) and the
   * component size. The missing last stage of a dedup pipeline — pair
   * lists alone under-remove (A~B, B~C but A~C unreported leaves a
   * dup); transitive closure fixes that.
   */
  def dedupComponents(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8, maxShingleFreq = 100)
    val comp = Dedup.connectedComponents(pairs, "id1", "id2")
      .withColumnRenamed("node", "doc_id")
    val labeled = docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
    // component size via a window aggregate, not a groupBy + self-join:
    // the join form had BOTH sides under the broadcast threshold at
    // test SF, and AQE picks the build side by whichever query stage
    // materializes first — a genuine run-to-run plan flip (BuildLeft ↔
    // BuildRight, caught by the bench fingerprints). The window form
    // is deterministic AND scale-correct: singleton docs make the size
    // table document-sized (never broadcastable), while the window
    // reuses the one hash shuffle on `component` the groupBy needed
    // anyway and drops the join entirely.
    labeled
      .withColumn("comp_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("component"))))
      .select(col("doc_id"), col("component"), col("comp_size"))
      .orderBy(col("doc_id"))
  }

  /**
   * Near-dup cluster census — the observability leg over
   * [[dedupComponents]]: per component size, how many clusters, how
   * many docs they hold, and how many a keep-one-per-cluster policy
   * drops. The number a curation run reports ("12% of the corpus sat
   * in near-dup clusters; the largest had 40 members") before anyone
   * trusts the dedup stage. Scale shape: one keyed aggregate over the
   * labeling (size-count-sized output); the labeling itself is the
   * dedup_components plan unchanged.
   */
  def dedupClusterStats(spark: SparkSession, dir: String): DataFrame =
    dedupComponents(spark, dir)
      .groupBy(col("comp_size"))
      .agg(countDistinct(col("component")).as("n_components"),
        count(lit(1)).as("n_docs"))
      .withColumn("n_dropped", col("n_docs") - col("n_components"))
      .orderBy(col("comp_size"))

  /**
   * Semantic dedup end-to-end: embedding-cosine near-dup pairs →
   * connected components → every vector labeled with its semantic
   * cluster (min vec_id) and whether it is the cluster's canonical
   * representative. The registry form uses the exact pair stage so the
   * oracle can mirror it; at corpus scale the pair stage is
   * `Dedup.embeddingNearDupLsh` (identical downstream plan — the CC
   * and labeling stages only see (id1, id2) pairs).
   */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val pairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.4)
    val comp = Dedup.connectedComponents(pairs, "id1", "id2")
      .withColumnRenamed("node", "vec_id")
    emb.select(col("vec_id"), col("label"))
      .join(comp, Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"),
        coalesce(col("component"), col("vec_id")).as("cluster"))
      .withColumn("is_canonical", col("vec_id") === col("cluster"))
      .orderBy(col("vec_id"))
  }

  /**
   * Recall self-check: LEFT-join the exact result onto the approximate
   * one and fold into one row the DuckDB oracle can verify — the exact
   * count (oracle recomputes it) and a recall-floor flag (oracle
   * asserts TRUE). Same pattern that made the sketches oracle-checkable
   * (`q_approx_distinct`): the approximate structure itself can't
   * hash-match any SQL, but "its recall against the exact sibling
   * clears the spec'd floor" can. One pass over each pipeline — the
   * join keeps every exact row; a non-null marker means the
   * approximation found it.
   */
  private def recallChecked(exact: DataFrame, approx: DataFrame,
      keys: Seq[String], floor: Double, nAlias: String): DataFrame =
    exact.select(keys.map(col): _*)
      .join(approx.select(keys.map(col): _*).withColumn("hit", lit(1)),
        keys, "left")
      .agg(count(lit(1)).as(nAlias),
        (count(col("hit")) >= count(lit(1)) * floor).as("within_bound"),
        // guards the bound against vacuous truth: over an EMPTY exact
        // set every `count >= count*floor` holds trivially — the
        // oracle pins this flag TRUE, so a testdata change that
        // empties the exact side fails loudly instead of passing
        (count(lit(1)) > 0).as("nonempty"))

  /** MinHash check adds the estimator bound: every recalled pair's
    * `est_jaccard` within 5σ (σ=√(J(1−J)/64)≈0.05 at J≥0.8 → 0.25) of
    * exact jaccard — the RecallSpec bound, oracle-visible. */
  def minhashChecked(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8, maxShingleFreq = 100)
    val mh = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, bands = 16, rowsPerBand = 4)
    exact.select(col("id1"), col("id2"), col("jaccard"))
      .join(mh, Seq("id1", "id2"), "left")
      .agg(count(lit(1)).as("n_exact_pairs"),
        (count(col("est_jaccard")) >= count(lit(1)) * 0.95).as("within_bound"),
        coalesce(max(abs(col("est_jaccard") - col("jaccard"))) <= 0.25,
          lit(true)).as("est_ok"),
        // anti-vacuity: both bound flags coalesce to true on an empty
        // pair set; the oracle pins TRUE here so that failure is loud
        (count(lit(1)) > 0).as("nonempty"))
  }

  /** SimHash check is an EQUALITY, not a recall floor: banding is
    * provably lossless for hamming ≤ 3 (4×16-bit pigeonhole), so the
    * banded pair set must equal brute-force exactly. Both sides union
    * into one keyed aggregation — each pipeline runs once. */
  def simhashChecked(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // one materialized signature table feeds BOTH pair joins — the 64
    // bit-vote aggregates are the expensive stage, not the joins
    val (banded, brute) = Dedup.simhashPairsBoth(docs, "doc_id", "text",
      maxHamming = 3)
    val tagged = brute.select(col("id1"), col("id2"),
        lit(1).as("x"), lit(0).as("b"))
      .unionByName(banded.select(col("id1"), col("id2"),
        lit(0).as("x"), lit(1).as("b")))
    val perPair = tagged.groupBy(col("id1"), col("id2"))
      .agg(max(col("x")).as("x"), max(col("b")).as("b"))
    val folded = perPair.agg(sum(col("x")).as("nx"), sum(col("b")).as("nb"),
      sum(col("x") * col("b")).as("ni"))
    // broadcast-pinned: an unhinted 1-row × 1-row cross join lets AQE
    // pick the build side by stage-arrival order — flipped run-to-run
    // under sf1 sweep memory pressure (the pipeline_curate class)
    Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(folded))
      .select(col("n_docs"),
        coalesce(col("nx") === col("nb") && col("ni") === col("nx"),
          lit(true)).as("sets_equal"),
        // anti-vacuity: an empty pair set coalesces `sets_equal` to
        // true; the oracle pins TRUE here so emptied testdata fails
        // loudly (sf0.01 has real hamming≤3 pairs today)
        (coalesce(col("nx"), lit(0L)) > 0).as("nonempty"))
  }

  /**
   * Self-checking form of `Curation.decontaminateBloom`: Bloom filters
   * have no false negatives and the operator exact-confirms its
   * candidates, so its output must be BIT-IDENTICAL to the exact
   * broadcast decontaminate — this query runs both and folds per-doc
   * equality into one oracle-asserted row. The comparison is a
   * union+re-aggregate on doc_id, not a join: both sides are
   * doc-count-sized and an unhinted tiny join races AQE's build-side
   * choice (the dedup_components flip class).
   */
  def decontaminateBloomChecked(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val eval = docs.filter(col("doc_id") % 20 === 0)
    val exact = Curation.decontaminate(train, eval, "doc_id", "text", n = 5)
    val bloom = Curation.decontaminateBloom(train, eval, "doc_id", "text",
      n = 5, expectedEvalShingles = 100000L, fpp = 0.01)
    exact.select(col("doc_id"), col("n_shared").as("v"), lit("e").as("side"))
      .unionByName(bloom.select(col("doc_id"), col("n_shared").as("v"),
        lit("b").as("side")))
      .groupBy(col("doc_id"))
      .agg(max(when(col("side") === "e", col("v"))).as("ev"),
        max(when(col("side") === "b", col("v"))).as("bv"))
      .agg(count(lit(1)).as("n_train_docs"),
        sum(when(col("ev") > 0, 1L).otherwise(0L)).as("n_contaminated"),
        (sum(when(col("ev") <=> col("bv"), 0L).otherwise(1L)) === 0)
          .as("sets_equal"),
        (sum(when(col("ev") > 0, 1L).otherwise(0L)) > 0).as("nonempty"))
  }

  /**
   * Per-source curation profile — the domain-level screening table a
   * corpus pipeline ranks providers by (CCNet-style per-domain
   * filtering): document count, exact-duplicate share, token volume,
   * and quality mass per source. Quality folds as an integer
   * (round(quality·10⁴) — the per-doc values are already 4-decimal
   * rounded, so the scaled sum is order-independent and engine-exact).
   * One quality scan + one content-hash window + one source-keyed agg.
   */
  def sourceProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val q = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_words"), col("quality"))
    val dup = docs.select(col("doc_id"), col("source"),
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text"))))
          .as("n_copies"))
    dup.join(q, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        sum(col("n_words")).as("n_tokens"),
        sum(round(col("quality") * 10000, 0).cast("long")).as("quality_e4_sum"))
      .withColumn("dup_pct_ppm",
        expr("n_dup_docs * 1000000L div n_docs"))
      .orderBy(col("source"))
  }

  /**
   * Incremental connected components — fold a batch of NEW near-dup
   * edges into PRIOR component labels without recomputing the graph
   * from scratch: the prior labeling re-enters as star edges
   * (node → component), so old structure is already depth-1 and the
   * label-propagation loop converges in about one round regardless of
   * how deep the original components were. With the persisted MinHash
   * index supplying each batch's new edges, this closes the
   * incremental dedup loop at 100 TB: index probe → new pairs →
   * label merge, never re-touching corpus text or old pair joins.
   *
   * The registry form splits the exact pair set deterministically
   * (parity of id1+id2) into "prior" and "new" batches and outputs the
   * merged labeling — which must EQUAL the from-scratch labeling, so
   * the full-recompute recursive-CTE oracle checks the incremental
   * path end-to-end.
   */
  def ccIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleFreq = 100)
      .select(col("id1"), col("id2"))
    val old = pairs.filter((col("id1") + col("id2")) % 2 === 0)
    val fresh = pairs.filter((col("id1") + col("id2")) % 2 =!= 0)
    val prior = Dedup.connectedComponents(old, "id1", "id2")
    val starEdges = prior.select(col("node").as("id1"),
      col("component").as("id2"))
    val comp = Dedup.connectedComponents(
        starEdges.unionByName(fresh), "id1", "id2")
      .withColumnRenamed("node", "doc_id")
    val labeled = docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
    labeled
      .withColumn("comp_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("component"))))
      .select(col("doc_id"), col("component"), col("comp_size"))
      .orderBy(col("doc_id"))
  }

  /**
   * Self-checking form of the persisted MinHash band index: treat
   * every tenth document as an incoming batch, index the rest, probe,
   * and fold recall against the exact cross-corpus Jaccard pairs into
   * an oracle-assertable row. Banding at 16×4 misses a J≥0.8 pair
   * w.p. (1−0.8⁴)¹⁶ ≈ 2·10⁻⁴, so the 0.95 floor has huge margin.
   */
  def minhashIndexChecked(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    // Scratch registers the dir for deletion at JVM exit — a full
    // partitioned index per invocation must not accumulate across
    // registry/bench sweeps
    val path = graft.Scratch.tempDir("graft_mh_idx") + "/idx"
    Dedup.minhashIndexWrite(corpus, "doc_id", "text", path)
    val probed = Dedup.minhashProbe(incoming, path, "doc_id", "text")
    val exactCross = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleFreq = 100)
      .filter((col("id1") % 10 === 0) =!= (col("id2") % 10 === 0))
      .select(
        when(col("id1") % 10 === 0, col("id1")).otherwise(col("id2")).as("new_id"),
        when(col("id1") % 10 === 0, col("id2")).otherwise(col("id1")).as("corpus_id"))
    // shuffle-hash-pinned: both sides are pair-count-sized and an
    // unhinted tiny join races AQE's build-side choice (plan flip)
    exactCross
      .join(probed.select(col("new_id"), col("corpus_id"))
        .withColumn("hit", lit(1)).hint("shuffle_hash"),
        Seq("new_id", "corpus_id"), "left")
      .agg(count(lit(1)).as("n_exact_cross"),
        (count(col("hit")) >= count(lit(1)) * 0.95).as("within_bound"),
        // anti-vacuity: the floor is trivially true over an empty
        // exact set; the oracle pins TRUE so emptied testdata fails
        (count(lit(1)) > 0).as("nonempty"))
  }

  /**
   * The composed end-to-end curation pipeline — what a real user runs,
   * as ONE plan: raw documents → holdout split → exact dedup →
   * transitive near-dup removal → heuristic quality floor →
   * Bloom-prefiltered decontamination against the holdout → language
   * mixture downsampling → sequence-pack manifest. Every stage is an
   * individually-green operator; the composition is the product, and
   * the oracle mirrors the WHOLE chain in one SQL statement, so a
   * drift anywhere in the pipeline flips the hash. (The model-based
   * `quality_classify` drops into the same slot as the heuristic
   * floor when a labeled seed exists — kept heuristic here so the
   * end-to-end oracle stays SQL-exact rather than flag-based.)
   *
   * Scan discipline (PipelineSpec audits the executed plan): the
   * exact-dedup survivors are materialized ONCE and every later stage
   * reads that, so the raw table is scanned only by the two holdout
   * branches — stage chaining adds joins on derived relations, never
   * another corpus scan. At 100 TB each inter-stage join keys on
   * doc_id over monotonically SHRINKING relations; the only
   * corpus-quadratic candidate stage (near-dup pairs) is the
   * PPJoin-pruned jaccard join; decontamination probes a bloom
   * literal; the mix and pack stages are window/RangeSlice shapes
   * over the curated remainder.
   */
  def pipelineCurate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    // stage 0: decontamination holdout (the "eval benchmark" slice)
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val eval = docs.filter(col("doc_id") % 20 === 0)
    // stage 1: exact dedup — keep the min doc_id per content hash
    // (window form: one shuffle on the hash, no self-join back)
    val kept1 = Dedup.materialize(
      train.withColumn("keep_id",
          min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
        .filter(col("doc_id") === col("keep_id")).drop("keep_id"))
    // stage 2: near-dup transitive closure — pairs ≥ 0.8 jaccard over
    // the exact survivors, connected components, keep component minima
    val pairs = Dedup.ngramJaccardPairs(kept1, "doc_id", "text",
      n = 3, threshold = 0.8, maxShingleFreq = 100)
    val dupIds = Dedup.connectedComponents(pairs, "id1", "id2")
      .filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))
    // Every inter-stage join below is PINNED shuffle-hash with the
    // narrow id-keyed side as build. Two reasons, one honest shape:
    // (a) at 100 TB the drop/pick/score lists are data-sized — never
    // broadcast-honest — so the shuffle join is the only shape that
    // survives the scale-up; (b) left to AQE, the build-side choice
    // rides on runtime size stats of the checkpointed stage outputs,
    // which under bench memory pressure report in-memory vs spilled
    // sizes differently — a bistable plan the fingerprint snapshot
    // caught flapping (stable in 12 standalone runs, flipped mid-sweep)
    val kept2 = kept1.join(dupIds.hint("shuffle_hash"),
      Seq("doc_id"), "left_anti")
    // stage 3: heuristic quality floor. The score relation is consumed
    // TWICE (the floor filter and the manifest's quality column) —
    // materialize the narrow (doc_id, quality) projection so the
    // second consumer doesn't re-derive the whole scoring subtree
    // (the scan-audit class PipelineSpec pins: every multi-consumer
    // stage output below is a materialized NARROW id-keyed relation,
    // so downstream fan-out never re-expands into corpus re-scans)
    val quality = Dedup.materialize(
      TextAnalysis.qualityScore(kept2, "doc_id", "text")
        .select(col("doc_id"), col("quality")))
    val kept3 = kept2.join(quality.hint("shuffle_hash"), "doc_id")
      .filter(col("quality") >= 0.5)
    // stage 4: drop docs sharing any 5-shingle with the holdout —
    // bloom-prefiltered, exact-confirmed (≡ exact decontaminate).
    // Materialized (an id list) so the holdout branch executes ONCE —
    // unmaterialized, the eval scan is duplicated into every
    // downstream copy of the kept4 subtree
    val contaminated = Dedup.materialize(
      Curation.decontaminateBloom(kept3, eval, "doc_id", "text", n = 5)
        .filter(col("contaminated")).select(col("doc_id")))
    val kept4 = kept3.join(contaminated.hint("shuffle_hash"),
      Seq("doc_id"), "left_anti")
    // stage 5: language mixture downsampling over the curated pool —
    // (doc_id, lang) is consumed by both the pack input and the final
    // manifest join
    val mixed = Dedup.materialize(
      Curation.mixtureSample(kept4, "doc_id", "lang",
          Seq("en" -> 40, "de" -> 15, "fr" -> 15, "es" -> 15, "zh" -> 15))
        .select(col("doc_id"), col("stratum").as("lang")))
    // stage 6: sequence-pack manifest over the final corpus. The
    // mixture-pick joins are PINNED shuffle-hash with the narrow id
    // side as build: at sf0.001 both sides are broadcast-sized and AQE's
    // build-side choice rides on byte-size jitter (a bistable plan the
    // fingerprint snapshot caught flapping across JVMs); at 100 TB the
    // pick list is data-sized — never broadcast-honest — so the pinned
    // shuffle join is also the only shape that survives the scale-up
    val toks = TextAnalysis.tokenCounts(
        kept4.join(mixed.select(col("doc_id")).hint("shuffle_hash"),
          "doc_id"), "doc_id", "text")
      .select(col("doc_id"), col("bpe_tokens"))
    Curation.sequencePack(toks, "doc_id", "bpe_tokens", capacity = 512L)
      .join(mixed.hint("shuffle_hash"), "doc_id")
      .join(quality.hint("shuffle_hash"), "doc_id")
      .select(col("doc_id"), col("lang"), col("quality"), col("n_tokens"),
        col("token_start"), col("start_bin"), col("end_bin"), col("straddles"))
      .orderBy(col("doc_id"))
  }

  /**
   * Self-checking persisted-index APPEND — the write half of the
   * incremental dedup loop (`minhash_index` proved the read half):
   * growing a standing corpus index by a batch must not rewrite the
   * corpus. Split: base corpus (doc_id%10 ∉ {0,9}) is indexed, the
   * batch (doc_id%10 = 9) is APPENDED, and the incoming docs
   * (doc_id%10 = 0) probe. Claims folded into the oracle row:
   *  - probe-after-append ≡ probe-after-full-rebuild over base∪batch,
   *    EXACTLY (full-outer join on (new_id, corpus_id, est_jaccard),
   *    zero mismatches — the cc_incremental pattern: the incremental
   *    path must equal the from-scratch path, bit for bit);
   *  - every pre-existing index file is untouched (name→size snapshot
   *    before/after the append — parquet append is purely additive);
   *  - the index actually grew (anti-vacuity for the file check).
   * The split counts are SQL-recomputable hard values.
   */
  def minhashIndexAppendChecked(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val batch = docs.filter(col("doc_id") % 10 === 9)
    val base = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 9)
    val root = graft.Scratch.tempDir("graft_mh_app")
    val appendedIdx = root + "/appended"
    val rebuiltIdx = root + "/rebuilt"
    Dedup.minhashIndexWrite(base, "doc_id", "text", appendedIdx)
    val filesBefore = graft.Scratch.parquetFiles(appendedIdx)
    Dedup.minhashIndexAppend(batch, appendedIdx, "doc_id", "text")
    val filesAfter = graft.Scratch.parquetFiles(appendedIdx)
    val untouched = filesBefore.forall { case (f, sz) =>
      filesAfter.get(f).contains(sz) }
    val grew = filesAfter.size > filesBefore.size
    Dedup.minhashIndexWrite(docs.filter(col("doc_id") % 10 =!= 0),
      "doc_id", "text", rebuiltIdx)
    val pa = Dedup.minhashProbe(incoming, appendedIdx, "doc_id", "text")
    val pb = Dedup.minhashProbe(incoming, rebuiltIdx, "doc_id", "text")
    // est_jaccard joins exactly: both sides run the identical codegen'd
    // agree-sum over identically-derived signature arrays
    val mism = pa.withColumn("in_a", lit(1))
      .join(pb.withColumn("in_b", lit(1)),
        Seq("new_id", "corpus_id", "est_jaccard"), "full_outer")
      .agg(count(lit(1)).as("n_union"),
        count(when(col("in_a").isNull || col("in_b").isNull, 1)).as("n_mism"))
    docs.agg(
        count(when(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 9, 1))
          .as("n_base"),
        count(when(col("doc_id") % 10 === 9, 1)).as("n_batch"),
        count(when(col("doc_id") % 10 === 0, 1)).as("n_incoming"))
      .crossJoin(broadcast(mism))
      .select(col("n_base"), col("n_batch"), col("n_incoming"),
        (col("n_mism") === 0).as("probe_equals_rebuild"),
        (col("n_union") > 0).as("probes_nonempty"),
        lit(untouched).as("preexisting_untouched"),
        lit(grew).as("index_grew"))
  }

  /**
   * Self-checking form of the tombstone DELETE leg: index the full
   * corpus, tombstone one slice, and probe — the masked probe must
   * EQUAL the from-scratch in-memory banded join over the corpus
   * WITHOUT the deleted slice (`minhashLshPairs` never touches the
   * index machinery, so the reference is independent of every
   * persisted-index code path; est values join exactly because both
   * sides run the same seeded signature stream). File contract
   * (delete appends only tombstone files, pre-existing untouched) is
   * folded in as flags; the heavier probe-after-delete ≡
   * probe-after-rebuild two-index compare and the vacuum leg live in
   * IndexDeleteSpec.
   */
  def minhashIndexDeleteChecked(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val deleted = docs.filter(col("doc_id") % 10 === 9)
    val path = graft.Scratch.tempDir("graft_mh_del") + "/idx"
    Dedup.minhashIndexWrite(corpus, "doc_id", "text", path)
    val filesBefore = graft.Scratch.parquetFiles(path)
    Dedup.minhashIndexDelete(deleted.select(col("doc_id")), path, "doc_id")
    val filesAfter = graft.Scratch.parquetFiles(path)
    val untouched = filesBefore.forall { case (f, sz) =>
      filesAfter.get(f).contains(sz) }
    val tombstoneOnly = filesAfter.keySet.diff(filesBefore.keySet)
      .forall(_.contains("tombstones"))
    val probed = Dedup.minhashProbe(incoming, path, "doc_id", "text")
    // from-scratch reference: banded pairs over (corpus \ deleted) ∪
    // batch, oriented to (new_id, corpus_id) cross pairs
    val reference = Dedup.minhashLshPairs(
        docs.filter(col("doc_id") % 10 =!= 9), "doc_id", "text")
      .filter((col("id1") % 10 === 0) =!= (col("id2") % 10 === 0))
      .select(
        when(col("id1") % 10 === 0, col("id1")).otherwise(col("id2")).as("new_id"),
        when(col("id1") % 10 === 0, col("id2")).otherwise(col("id1")).as("corpus_id"),
        col("est_jaccard"))
    val mism = probed.withColumn("in_a", lit(1))
      .join(reference.withColumn("in_b", lit(1)).hint("shuffle_hash"),
        Seq("new_id", "corpus_id", "est_jaccard"), "full_outer")
      .agg(count(lit(1)).as("n_union"),
        count(when(col("in_a").isNull || col("in_b").isNull, 1)).as("n_mism"))
    docs.agg(
        count(when(col("doc_id") % 10 =!= 0, 1)).as("n_corpus"),
        count(when(col("doc_id") % 10 === 9, 1)).as("n_deleted"),
        count(when(col("doc_id") % 10 === 0, 1)).as("n_incoming"))
      .crossJoin(broadcast(mism))
      .select(col("n_corpus"), col("n_deleted"), col("n_incoming"),
        (col("n_mism") === 0).as("probe_equals_reference"),
        (col("n_union") > 0).as("probes_nonempty"),
        lit(untouched).as("preexisting_untouched"),
        lit(tombstoneOnly).as("tombstones_only_append"))
  }

  /**
   * The index-health OBSERVABILITY leg: build a standing index,
   * tombstone a slice, and report what the owner's vacuum cadence
   * reads — live/masked counts and the masked fraction (hard values
   * the oracle recomputes from the split arithmetic) plus the band
   * table's file-layout health as flags (file counts depend on the
   * write parallelism, so they pin as invariants — at least one file
   * per populated directory, nonzero bytes — not as oracle values).
   */
  def minhashIndexStatsChecked(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val deleted = docs.filter(col("doc_id") % 10 === 9)
    val path = graft.Scratch.tempDir("graft_mh_stats") + "/idx"
    Dedup.minhashIndexWrite(corpus, "doc_id", "text", path)
    Dedup.minhashIndexDelete(deleted.select(col("doc_id")), path, "doc_id")
    Dedup.minhashIndexStats(spark, path).select(
      col("n_docs"), col("n_docs_masked"), col("masked_fraction"),
      (col("n_band_files") >= col("n_band_dirs") && col("n_band_dirs") > 0)
        .as("band_layout_ok"),
      (col("band_bytes") > 0).as("band_bytes_positive"))
  }

  /**
   * Incremental EMBEDDING dedup against the persisted banded ANN
   * index — the `minhash_index` contract on the vector side: index
   * the corpus once, then each arriving batch codes ONLY itself and
   * probes the index for cross near-dup pairs (`annBatchProbe`:
   * pruned narrow band scan, candidates dedup before either side's
   * vectors are fetched, exact cosine verifies). Because hyperplane
   * codes are pure seeded functions of the vector, the probe must
   * EQUAL the in-memory banded join over corpus∪batch restricted to
   * cross pairs — cos values included (an index-machinery-independent
   * reference). The oracle anchors the flag row to the SQL-exact
   * cosine≥τ cross-pair count and pins the recall floor of the banded
   * geometry (the dedup_embedding_lsh bound, on the cross slice).
   */
  def embedDedupIndexChecked(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val incoming = emb.filter(col("vec_id") % 10 === 0)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val tau = 0.4
    val path = graft.Scratch.tempDir("graft_emb_idx") + "/idx"
    Similarity.annIndexWrite(corpus, "vec_id", "embedding", path, dim = 64)
    val probed = Similarity.annBatchProbe(incoming, path, "vec_id",
      "embedding", threshold = tau, dim = 64)
    val reference = Dedup.embeddingNearDupLsh(emb, "vec_id", "embedding",
        threshold = tau, dim = 64)
      .filter((col("id1") % 10 === 0) =!= (col("id2") % 10 === 0))
      .select(
        when(col("id1") % 10 === 0, col("id1")).otherwise(col("id2")).as("new_id"),
        when(col("id1") % 10 === 0, col("id2")).otherwise(col("id1")).as("corpus_id"),
        col("cos"))
    val mism = probed.withColumn("in_a", lit(1))
      .join(reference.withColumn("in_b", lit(1)).hint("shuffle_hash"),
        Seq("new_id", "corpus_id", "cos"), "full_outer")
      .agg(count(lit(1)).as("n_union"),
        count(when(col("in_a").isNull || col("in_b").isNull, 1)).as("n_mism"))
    val exactCross = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
        threshold = tau)
      .filter((col("id1") % 10 === 0) =!= (col("id2") % 10 === 0))
      .select(col("id1"), col("id2"))
    val recall = exactCross
      .join(probed.select(
          least(col("new_id"), col("corpus_id")).as("id1"),
          greatest(col("new_id"), col("corpus_id")).as("id2"))
          .withColumn("hit", lit(1)).hint("shuffle_hash"),
        Seq("id1", "id2"), "left")
      .agg(count(lit(1)).as("n_exact_cross"),
        (count(col("hit")) >= count(lit(1)) * 0.85).as("within_bound"),
        (count(lit(1)) > 0).as("exact_nonempty"))
    emb.agg(
        count(when(col("vec_id") % 10 =!= 0, 1)).as("n_corpus"),
        count(when(col("vec_id") % 10 === 0, 1)).as("n_batch"))
      .crossJoin(broadcast(recall))
      .crossJoin(broadcast(mism))
      .select(col("n_corpus"), col("n_batch"), col("n_exact_cross"),
        col("within_bound"),
        (col("n_mism") === 0).as("probe_equals_reference"),
        (col("n_union") > 0 && col("exact_nonempty")).as("probes_nonempty"))
  }

  /**
   * The WHOLE incremental dedup loop, steady-state round N, as one
   * self-checking query — the composition of the three anchors that
   * proved its legs separately (`minhash_index` = probe,
   * `minhash_index_append` = append, `cc_incremental` = label merge):
   * a standing corpus has a persisted band index and prior component
   * labels; a new batch arrives and the round runs
   *   1. probe the index for batch↔corpus candidates (shingles ONLY
   *      the batch, prunes the index scan to the batch's buckets),
   *   2. batch-internal candidates from the batch's own banded join
   *      (batch-sized — the corpus is never re-shingled),
   *   3. fold both edge sets into the prior labels via star edges
   *      (one label-propagation round, depth-independent),
   *   4. append the batch's signatures into the standing index for
   *      round N+1.
   * The check: the merged labeling must EQUAL the from-scratch
   * labeling over the full corpus∪batch candidate graph at the same
   * threshold — candidate sets compose exactly (probe ≡ cross subset,
   * per-doc signatures are a pure seeded function of text), so the
   * loop's output is bit-identical to a full recompute while touching
   * only batch-sized text. Output: SQL-exact split counts + the
   * equality/vacuity flags folded in (the established ✅sc pattern).
   */
  def incrDedupLoopChecked(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val tau = 0.8
    val path = graft.Scratch.tempDir("graft_loop") + "/idx"
    // standing state (in production this persists across rounds; the
    // query constructs it so the round is reproducible end-to-end)
    Dedup.minhashIndexWrite(corpus, "doc_id", "text", path)
    val priorPairs = Dedup.minhashLshPairs(corpus, "doc_id", "text")
      .filter(col("est_jaccard") >= tau).select(col("id1"), col("id2"))
    val prior = Dedup.connectedComponents(priorPairs, "id1", "id2")
    // the round: probe + batch-internal candidates + append, all from
    // ONE signature pass over the batch (Dedup.minhashRound — running
    // them as separate calls costs three passes over the same text);
    // pair orientation is irrelevant to the undirected label merge
    val roundPairs = Dedup.minhashRound(batch, path, "doc_id", "text")
      .filter(col("est_jaccard") >= tau).select(col("id1"), col("id2"))
    val starEdges = prior.select(col("node").as("id1"),
      col("component").as("id2"))
    val merged = Dedup.connectedComponents(
      starEdges.unionByName(roundPairs), "id1", "id2")
    // from-scratch reference over the identical candidate graph
    val scratch = Dedup.connectedComponents(
      Dedup.minhashLshPairs(docs, "doc_id", "text")
        .filter(col("est_jaccard") >= tau).select(col("id1"), col("id2")),
      "id1", "id2")
    val mism = merged.withColumn("in_a", lit(1))
      .join(scratch.withColumn("in_b", lit(1)),
        Seq("node", "component"), "full_outer")
      .agg(count(lit(1)).as("n_union"),
        count(when(col("in_a").isNull || col("in_b").isNull, 1)).as("n_mism"))
    docs.agg(
        count(when(col("doc_id") % 10 =!= 0, 1)).as("n_corpus"),
        count(when(col("doc_id") % 10 === 0, 1)).as("n_batch"))
      .crossJoin(broadcast(mism))
      .select(col("n_corpus"), col("n_batch"),
        (col("n_mism") === 0).as("merged_equals_scratch"),
        (col("n_union") > 0).as("components_nonempty"))
  }

  /**
   * Incremental dedup as a LIVE STREAM — the deployment shape of the
   * batch loop above (`incr_dedup_loop` proves one steady-state round;
   * this proves the loop under a real Structured Streaming driver):
   * the corpus is re-laid as four id-range slices and replayed as a
   * file stream (`maxFilesPerTrigger=1` → four successive
   * microbatches); `foreachBatch` runs the production per-arrival
   * round — emit the batch's near-dup pairs against everything seen
   * so far (index probe for cross-batch + the batch's own banded join
   * for intra-batch), then append the batch's signatures into the
   * standing index for the next arrival. Each batch shingles ONLY
   * itself; the standing corpus is touched through the pruned index
   * probe alone.
   *
   * The check is EXACT, not statistical: because per-doc signatures
   * are a pure seeded function of text and every unordered pair falls
   * in exactly one emission (intra when both docs share an arrival,
   * cross when the later one lands), the union of emitted pairs over
   * all microbatches must EQUAL the one-shot `minhashLshPairs` over
   * the whole corpus — estimator values included — independent of how
   * the stream was sliced or ordered (the stream_cdc convergence
   * contract, applied to dedup). The oracle additionally recomputes
   * the SQL-exact Jaccard≥0.8 pair count and pins the 0.95 recall
   * floor on the emitted set, so the flag row is anchored to a hard
   * number, not just internal consistency.
   */
  def streamDedupIndexChecked(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val work = graft.Scratch.tempDir("graft_sdi")
    docs.repartitionByRange(4, col("doc_id"))
      .write.mode("overwrite").parquet(s"$work/arrivals")
    val schema = spark.read.parquet(s"$work/arrivals").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/arrivals")
    val idx = s"$work/idx"
    val pairsDir = s"$work/pairs"
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.select(col("doc_id"), col("text"))
        // the fused round: ONE signature pass feeds the intra-batch
        // pair join, the index probe and the append (creating the
        // index on the first arrival); the probe freezes its index
        // view before the append lands — Dedup.minhashRound's contract
        if (!b.isEmpty)
          Dedup.minhashRound(b, idx, "doc_id", "text")
            .write.mode("append").parquet(pairsDir)
        ()
      }
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    val emitted = spark.read.parquet(pairsDir)
    val reference = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .select(col("id1"), col("id2"), col("est_jaccard"))
    // shuffle-hash-pinned: both sides are pair-count-sized and an
    // unhinted tiny join races AQE's build-side choice (plan flip)
    val mism = emitted.withColumn("in_a", lit(1))
      .join(reference.withColumn("in_b", lit(1)).hint("shuffle_hash"),
        Seq("id1", "id2", "est_jaccard"), "full_outer")
      .agg(count(lit(1)).as("n_union"),
        count(when(col("in_a").isNull || col("in_b").isNull, 1)).as("n_mism"))
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8, maxShingleFreq = 100)
    exact
      .join(emitted.select(col("id1"), col("id2"))
          .withColumn("hit", lit(1)).hint("shuffle_hash"),
        Seq("id1", "id2"), "left")
      .agg(count(lit(1)).as("n_exact_pairs"),
        (count(col("hit")) >= count(lit(1)) * 0.95).as("within_bound"),
        (count(lit(1)) > 0).as("nonempty"))
      .crossJoin(broadcast(mism))
      .select(col("n_exact_pairs"), col("within_bound"),
        (col("n_mism") === 0).as("stream_equals_batch"),
        (col("n_union") > 0).as("pairs_nonempty"), col("nonempty"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_dedup_index" -> embedDedupIndexChecked _,
    "minhash_index_stats" -> minhashIndexStatsChecked _,
    "stream_dedup_index" -> streamDedupIndexChecked _,
    "incr_dedup_loop" -> incrDedupLoopChecked _,
    "pipeline_curate" -> pipelineCurate _,
    "minhash_index_append" -> minhashIndexAppendChecked _,
    "minhash_index_delete" -> minhashIndexDeleteChecked _,
    "minhash_index" -> minhashIndexChecked _,
    "cc_incremental" -> ccIncremental _,
    "source_profile" -> sourceProfile _,
    "corpus_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.psiDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0),
        expr("n_chars div 120"), buckets = 10)
    }),
    "embedding_outliers" -> ((s, d) =>
      graft.operators.Robust.embeddingOutlierScores(
        Tables.embeddings(s, d), "vec_id", "embedding")),
    "window_dedup" -> ((s, d) =>
      Dedup.dupWindowStats(Tables.documents(s, d), "doc_id", "text", k = 8)),
    "window_trim" -> ((s, d) =>
      Dedup.dupWindowTrim(Tables.documents(s, d), "doc_id", "text", k = 8)),
    "substring_trim" -> ((s, d) =>
      Dedup.substringTrim(Tables.documents(s, d), "doc_id", "text", n = 6)),
    "doc_logprob" -> ((s, d) =>
      TextAnalysis.unigramLogProb(Tables.documents(s, d), "doc_id", "text")),
    "ngram_lm" -> ((s, d) =>
      TextAnalysis.bigramLm(Tables.documents(s, d), "doc_id", "text", k = 3)),
    "bpe_fit" -> ((s, d) =>
      Tokenizer.bpeFitChecked(Tables.documents(s, d), "doc_id", "text",
        nMerges = 8)),
    "bpe_encode" -> ((s, d) =>
      Tokenizer.bpeEncodeChecked(Tables.documents(s, d), "doc_id", "text",
        nMerges = 8)),
    "bpe_fertility" -> ((s, d) =>
      Tokenizer.bpeFertilityChecked(Tables.documents(s, d), "doc_id", "text",
        "lang", nMerges = 8)),
    "quality_classify" -> ((s, d) =>
      graft.operators.QualityModel.classifyChecked(s, d)),
    "corpus_mix" -> ((s, d) =>
      Curation.mixtureSample(Tables.documents(s, d), "doc_id", "lang",
        Seq("en" -> 40, "de" -> 15, "fr" -> 15, "es" -> 15, "zh" -> 15))),
    "dsir_weights" -> ((s, d) =>
      Curation.dsirWeights(Tables.documents(s, d), "doc_id", "text",
        col("lang") === "en")),
    "corpus_curate" -> corpusCurate _,
    "dedup_components" -> dedupComponents _,
    "dedup_cluster_stats" -> dedupClusterStats _,
    "dedup_semantic" -> semanticDedup _,
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text")),
    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleFreq = 100)),
    // triangle census of the near-dup graph: closed triangles = true
    // rewrite cliques, open wedges = template-plus-satellites stars
    "graph_triangles" -> ((s, d) =>
      graft.operators.Triangles.triangleCount(
        Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, threshold = 0.8, maxShingleFreq = 100), "id1", "id2")),
    "corpus_sample_weighted" -> ((s, d) =>
      Curation.weightedSystematicSample(Tables.documents(s, d),
        "doc_id", "n_chars", k = 100)),
    "dedup_minhash_lsh" -> minhashChecked _,
    "dedup_simhash" -> simhashChecked _,
    "dedup_embedding" -> ((s, d) =>
      Dedup.embeddingNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.4)),
    "dedup_embedding_lsh" -> ((s, d) =>
      recallChecked(
        Dedup.embeddingNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.4),
        Dedup.embeddingNearDupLsh(Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.4, dim = 64, bands = 16, planesPerBand = 4),
        Seq("id1", "id2"), floor = 0.85, nAlias = "n_exact_pairs")),
    "embedding_centroids" -> ((s, d) =>
      Similarity.labelCentroids(Tables.embeddings(s, d), "label", "embedding")),
    "knn_join" -> ((s, d) =>
      Similarity.knnJoin(Tables.embeddings(s, d), "vec_id", "embedding", k = 3)),
    "knn_join_blocked" -> ((s, d) =>
      recallChecked(
        Similarity.knnJoin(Tables.embeddings(s, d), "vec_id", "embedding", k = 3),
        Similarity.knnJoinBlocked(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 3, dim = 64, bands = 16, planesPerBand = 4),
        Seq("src_id", "nbr_id"), floor = 0.85, nAlias = "n_exact")),
    "knn_brute" -> ((s, d) =>
      Similarity.knnBrute(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 25, extraCols = Seq("label"))),
    "ann_lsh" -> ((s, d) =>
      recallChecked(
        Similarity.knnBrute(Tables.embeddings(s, d), "vec_id", "embedding",
          queryId = 0L, k = 10),
        Similarity.annLsh(Tables.embeddings(s, d), "vec_id", "embedding",
          queryId = 0L, k = 10, dim = 64, bands = 16, planesPerBand = 4),
        Seq("vec_id"), floor = 0.8, nAlias = "k")),
    "ivf_ann" -> ((s, d) =>
      recallChecked(
        Similarity.knnBrute(Tables.embeddings(s, d), "vec_id", "embedding",
          queryId = 0L, k = 10),
        Similarity.ivfAnn(Tables.embeddings(s, d), "vec_id", "embedding",
          queryId = 0L, k = 10, nCentroids = 16, nProbe = 8),
        Seq("vec_id"), floor = 0.5, nAlias = "k")),
    "pq_ann" -> ((s, d) =>
      recallChecked(
        Similarity.knnBrute(Tables.embeddings(s, d), "vec_id", "embedding",
          queryId = 0L, k = 10),
        Similarity.pqAnn(Tables.embeddings(s, d), "vec_id", "embedding",
          queryId = 0L, k = 10, dim = 64, m = 16, ksub = 16, refine = 16),
        Seq("vec_id"), floor = 0.7, nAlias = "k")),
    "sq8_ann" -> ((s, d) =>
      recallChecked(
        Similarity.knnBrute(Tables.embeddings(s, d), "vec_id", "embedding",
          queryId = 0L, k = 10),
        Similarity.sq8Ann(Tables.embeddings(s, d), "vec_id", "embedding",
          queryId = 0L, k = 10, dim = 64, refine = 4),
        Seq("vec_id"), floor = 0.9, nAlias = "k")),
    // the composed production shape: IVF partition prune AND PQ
    // compressed-domain scan in ONE probe, persisted + manifest-
    // committed; recall self-checked against the exact brute anchor
    "ivfpq_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = graft.Scratch.tempDir("graft_ivfpq") + "/idx"
      Similarity.ivfpqIndexWrite(emb, "vec_id", "embedding", path, dim = 64,
        nCentroids = 16)
      val q = emb.filter(col("vec_id") === 0L).select(col("embedding"))
        .head().getSeq[Float](0).map(_.toDouble).toArray
      recallChecked(
        Similarity.knnBrute(emb, "vec_id", "embedding", queryId = 0L, k = 10),
        Similarity.ivfpqProbe(s, path, emb, "vec_id", "embedding", q, k = 10,
          nProbe = 8, refine = 16, excludeId = Some(0L)),
        Seq("vec_id"), floor = 0.5, nAlias = "k")
    }),
    // residual upgrade of the composed index: codes quantize u − c,
    // the per-cluster constant re-enters as a literal on the partition
    // column (inner-product metric — no per-cluster LUT needed);
    // IvfPqResidualSpec measures the ADC-error drop vs non-residual
    "ivfpq_residual" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = graft.Scratch.tempDir("graft_ivfpqr") + "/idx"
      Similarity.ivfpqrIndexWrite(emb, "vec_id", "embedding", path, dim = 64,
        nCentroids = 16)
      val q = emb.filter(col("vec_id") === 0L).select(col("embedding"))
        .head().getSeq[Float](0).map(_.toDouble).toArray
      recallChecked(
        Similarity.knnBrute(emb, "vec_id", "embedding", queryId = 0L, k = 10),
        Similarity.ivfpqrProbe(s, path, emb, "vec_id", "embedding", q, k = 10,
          nProbe = 8, refine = 16, excludeId = Some(0L)),
        Seq("vec_id"), floor = 0.5, nAlias = "k")
    }),
    "text_quality" -> ((s, d) =>
      TextAnalysis.qualityScore(Tables.documents(s, d), "doc_id", "text")),
    "lang_id" -> ((s, d) =>
      TextAnalysis.langId(Tables.documents(s, d), "doc_id", "text")),
    "token_count" -> ((s, d) =>
      TextAnalysis.tokenCounts(Tables.documents(s, d), "doc_id", "text")),
    "doc_fingerprint" -> ((s, d) =>
      TextAnalysis.fingerprint(Tables.documents(s, d), "doc_id", "text")),
    "tfidf_terms" -> ((s, d) =>
      TextAnalysis.tfidfTopTerms(Tables.documents(s, d), "doc_id", "text", k = 5)),
    "corpus_split" -> ((s, d) =>
      TextAnalysis.corpusSplit(Tables.documents(s, d), "doc_id")),
    "pii_scrub" -> ((s, d) =>
      TextAnalysis.piiScrub(Tables.documents(s, d), "doc_id", "text")),
    "top_p_terms" -> ((s, d) =>
      TextAnalysis.topPTerms(Tables.documents(s, d), "doc_id", "text")),
    "seq_pack" -> ((s, d) =>
      Curation.sequencePack(
        TextAnalysis.tokenCounts(Tables.documents(s, d), "doc_id", "text")
          .select(col("doc_id"), col("bpe_tokens")),
        "doc_id", "bpe_tokens", capacity = 512L)),
    "doc_chunk" -> ((s, d) =>
      TextAnalysis.chunkDocuments(Tables.documents(s, d), "doc_id", "text",
        chunkSize = 50, stride = 40)),
    "decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // held-out eval slice: every 20th doc id (deterministic, ~5%)
      Curation.decontaminate(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 5)
    }),
    "decontaminate_bloom" -> (decontaminateBloomChecked _),
    "corpus_sample" -> ((s, d) =>
      Curation.stratifiedSample(Tables.documents(s, d), "doc_id", "source",
        quota = 10)),
    "repetition_score" -> ((s, d) =>
      Curation.repetitionScore(Tables.documents(s, d), "doc_id", "text",
        n = 3, threshold = 0.2)),
    "quality_stratified" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val q = TextAnalysis.qualityScore(docs, "doc_id", "text")
        .select(col("doc_id"), col("quality"))
      Curation.qualityStratified(
        docs.select(col("doc_id"), col("source")).join(q, "doc_id"),
        "doc_id", "source", "quality")
    }),
    "contamination_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.contaminationReport(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 5)
    }),
    "contamination_multi" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // the eval slice split into 3 planted benchmarks
      Curation.contaminationReportMulti(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0)
          .withColumn("bench", expr("(doc_id div 20) % 3")),
        "doc_id", "text", "bench", n = 5)
    }),
    "source_cap" -> ((s, d) =>
      Curation.sourceCap(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          col("n_chars")),
        "doc_id", "source", "n_chars", cap = 25)),
    "train_shards" -> ((s, d) =>
      Curation.shuffleShards(
        TextAnalysis.tokenCounts(Tables.documents(s, d), "doc_id", "text")
          .select(col("doc_id"), col("ws_tokens")),
        "doc_id", "ws_tokens", shardTokens = 2048L)),
    "cluster_silhouette" -> ((s, d) =>
      Similarity.centroidSilhouette(Tables.embeddings(s, d), "label",
        "embedding")))

  private val ccOracleCtes: String =
    """WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id AS doc,
        |          array_to_string(list_slice(ws, i, i + 2), ' ') AS s
        |        FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) t(i)),
        |rare AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 100),
        |sh AS (SELECT doc, s FROM sh0 JOIN rare USING (s)),
        |sz AS (SELECT doc, count(*) AS szc FROM sh GROUP BY 1),
        |ints AS (SELECT a.doc AS id1, b.doc AS id2, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc < b.doc
        |         GROUP BY 1, 2),
        |prs AS (SELECT id1, id2 FROM ints
        |        JOIN sz x ON id1 = x.doc JOIN sz y ON id2 = y.doc
        |        WHERE round(inter * 1.0 / (x.szc + y.szc - inter), 6) >= 0.8),
        |und AS (SELECT id1 AS u, id2 AS v FROM prs UNION SELECT id2, id1 FROM prs),
        |reach(u, v) AS (
        |  SELECT DISTINCT u, u FROM und
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
        |comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u),
        |lab AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
        |        FROM documents d LEFT JOIN comp c USING (doc_id)),
        |szs AS (SELECT component, count(*) AS comp_size FROM lab GROUP BY 1)""".stripMargin

  private val fullCcOracleSql: String = ccOracleCtes + "\n" +
    """SELECT l.doc_id, l.component, s.comp_size
        |FROM lab l JOIN szs s USING (component) ORDER BY l.doc_id""".stripMargin

  // dedup_cluster_stats: the same labeling, aggregated per size class
  private val ccStatsOracleSql: String = ccOracleCtes + "\n" +
    """SELECT comp_size, count(*) AS n_components,
        | CAST(sum(comp_size) AS BIGINT) AS n_docs,
        | CAST(sum(comp_size) - count(*) AS BIGINT) AS n_dropped
        |FROM szs GROUP BY comp_size ORDER BY comp_size""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "window_dedup" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |wins AS (SELECT doc_id, i, array_to_string(list_slice(ws, i, i + 7), ' ') AS s
        |         FROM w, unnest(range(1, len(ws) - 6)) t(i) WHERE len(ws) >= 8),
        |dup AS (SELECT s FROM wins GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
        |dpos AS (SELECT doc_id, i FROM wins JOIN dup USING (s)),
        |agg AS (SELECT doc_id, count(DISTINCT i) AS dup_windows,
        |          count(DISTINCT p) AS covered_words
        |        FROM dpos, unnest(range(i, i + 8)) t(p) GROUP BY 1)
        |SELECT d.doc_id, len(w.ws) AS n_words,
        | greatest(len(w.ws) - 7, 0) AS n_windows,
        | coalesce(a.dup_windows, 0) AS dup_windows,
        | coalesce(a.covered_words, 0) AS covered_words,
        | len(w.ws) - coalesce(a.covered_words, 0) AS retained_words,
        | round(CASE WHEN len(w.ws) = 0 THEN 0.0
        |   ELSE coalesce(a.covered_words, 0) * 1.0 / len(w.ws) END, 6) AS dup_ratio
        |FROM documents d JOIN w USING (doc_id) LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // window_trim: exact mirror of the span trim — covered positions
    // from duplicated 8-word windows, residual words re-joined in
    // position order (string_agg ORDER BY = Spark's array_sort over
    // (pos, word) structs)
    "window_trim" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |wt AS (SELECT doc_id, i - 1 AS pos, ws[i] AS word
        |       FROM w, unnest(range(1, len(ws) + 1)) t(i)),
        |wins AS (SELECT doc_id, i, array_to_string(list_slice(ws, i, i + 7), ' ') AS s
        |         FROM w, unnest(range(1, len(ws) - 6)) t(i) WHERE len(ws) >= 8),
        |dup AS (SELECT s FROM wins GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT doc_id, p - 1 AS pos
        |        FROM wins JOIN dup USING (s), unnest(range(i, i + 8)) t(p)),
        |ret AS (SELECT wt.doc_id,
        |          count(*) AS retained_words,
        |          string_agg(wt.word, ' ' ORDER BY wt.pos) AS retained_text
        |        FROM wt LEFT JOIN cov ON wt.doc_id = cov.doc_id AND wt.pos = cov.pos
        |        WHERE cov.pos IS NULL GROUP BY 1)
        |SELECT d.doc_id, len(w.ws) AS n_words,
        | coalesce(r.retained_words, 0) AS retained_words,
        | len(w.ws) - coalesce(r.retained_words, 0) AS covered_words,
        | coalesce(r.retained_text, '') AS retained_text
        |FROM documents d JOIN w USING (doc_id) LEFT JOIN ret r USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // substring_trim: ExactSubstr semantics — a position starts a
    // trimmed span iff its 6-gram has an occurrence strictly earlier
    // in (doc_id, pos) order (row_number >= 2 ≡ Spark's
    // struct != min(struct) since (doc,pos) is unique per gram row);
    // coverage is the union of [s, s+6) over those starts, residual
    // words re-joined in position order
    "substring_trim" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |wt AS (SELECT doc_id, i - 1 AS pos, ws[i] AS word
        |       FROM w, unnest(range(1, len(ws) + 1)) t(i)),
        |grams AS (SELECT doc_id, i - 1 AS pos,
        |            array_to_string(list_slice(ws, i, i + 5), ' ') AS g
        |          FROM w, unnest(range(1, len(ws) - 4)) t(i) WHERE len(ws) >= 6),
        |gr AS (SELECT doc_id, pos,
        |         row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
        |       FROM grams),
        |cov AS (SELECT DISTINCT doc_id, p AS pos
        |        FROM gr, unnest(range(pos, pos + 6)) t(p) WHERE rn >= 2),
        |ret AS (SELECT wt.doc_id,
        |          count(*) AS retained_words,
        |          string_agg(wt.word, ' ' ORDER BY wt.pos) AS retained_text
        |        FROM wt LEFT JOIN cov ON wt.doc_id = cov.doc_id AND wt.pos = cov.pos
        |        WHERE cov.pos IS NULL GROUP BY 1)
        |SELECT d.doc_id, len(w.ws) AS n_words,
        | coalesce(r.retained_words, 0) AS retained_words,
        | len(w.ws) - coalesce(r.retained_words, 0) AS covered_words,
        | coalesce(r.retained_text, '') AS retained_text
        |FROM documents d JOIN w USING (doc_id) LEFT JOIN ret r USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // dsir_weights: integer-exact mirror — per-bucket llr is scaled to
    // a BIGINT once (one ln per bucket from exact counts), then every
    // per-doc score is an integer sum, order-independent on both sides
    "dsir_weights" ->
      """WITH w AS (SELECT doc_id, lang = 'en' AS is_target,
        |    string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |f AS (SELECT doc_id, is_target, ws[i] AS feat
        |        FROM w, unnest(range(1, len(ws) + 1)) t(i)
        |      UNION ALL
        |      SELECT doc_id, is_target, ws[i] || ' ' || ws[i + 1] AS feat
        |        FROM w, unnest(range(1, len(ws))) t(i)),
        |fb AS (SELECT doc_id, is_target,
        |         CAST(('0x' || substring(md5(feat), 1, 8)) AS BIGINT) % 4096 AS bucket,
        |         count(*) AS c
        |       FROM f GROUP BY 1, 2, 3),
        |bs AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS cnt_r,
        |         CAST(sum(CASE WHEN is_target THEN c ELSE 0 END) AS BIGINT) AS cnt_t
        |       FROM fb GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt_r) AS DOUBLE) AS r_total,
        |          CAST(sum(cnt_t) AS DOUBLE) AS t_total FROM bs),
        |llr AS (SELECT bucket,
        |          CAST(round(ln(((cnt_t + 1)::DOUBLE * (tot.r_total + 4096)) /
        |                        ((cnt_r + 1)::DOUBLE * (tot.t_total + 4096)))
        |               * 1e6, 0) AS BIGINT) AS llr_ppm
        |        FROM bs, tot)
        |SELECT fb.doc_id, fb.is_target,
        | CAST(sum(fb.c) AS BIGINT) AS n_feats,
        | CAST(sum(fb.c * llr.llr_ppm) AS BIGINT) AS score_ppm,
        | sum(fb.c * llr.llr_ppm) > 0 AS selected
        |FROM fb JOIN llr USING (bucket)
        |GROUP BY 1, 2 ORDER BY fb.doc_id""".stripMargin,
    "doc_logprob" ->
      """WITH tf AS (SELECT doc_id, w AS term, count(*) AS tf
        |  FROM (SELECT doc_id,
        |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(cf) AS BIGINT) AS n_total FROM cf),
        |d AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |        sum(tf * log2(cf)) AS sum_log_cf,
        |        CAST(sum(CASE WHEN cf <= 5 THEN tf ELSE 0 END) AS BIGINT) AS n_rare
        |      FROM tf JOIN cf USING (term) GROUP BY 1)
        |SELECT doc_id, n_tokens, n_rare,
        | round(log2((SELECT n_total FROM tot)) - sum_log_cf / n_tokens, 4) AS avg_nll_bits,
        | n_rare * 5 > n_tokens AS rare_heavy
        |FROM d ORDER BY doc_id""".stripMargin,
    // quality_classify: LR coefficients are optimizer output (not
    // SQL-recomputable), so the oracle recomputes the weak label (the
    // quality-bar criterion, same formula as corpus_curate) and the
    // split counts exactly, and asserts the held-out rank-exact AUC
    "quality_classify" ->
      """WITH w AS (SELECT doc_id, text,
        |  string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |q AS (SELECT doc_id,
        |  round(least(1.0, len(ws) / 100.0) * 0.5 +
        |    (1.0 - least(1.0, round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / length(text), 6) * 10)) * 0.25 +
        |    least(1.0, round(len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0 / len(ws), 6) * 5) * 0.25, 4) AS quality
        | FROM w)
        |SELECT count(*) AS n_docs,
        | CAST(count(CASE WHEN quality >= 0.5 THEN 1 END) AS BIGINT) AS n_ref,
        | CAST(count(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_train,
        | TRUE AS auc_ok, CAST(8 AS BIGINT) AS n_features, TRUE AS nonempty
        |FROM q""".stripMargin,
    // bpe_fit: rounds >= 2 are un-SQL-able (iterative data-dependent
    // argmax), so the oracle recomputes what IS expressible — the
    // round-1 argmax pair (freq desc, pair asc tie-break) and the
    // initial char-token total — and pins the loop invariants TRUE
    "bpe_fit" ->
      """WITH wf AS (SELECT w AS word, count(*) AS n
        |  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |        FROM documents)
        |  GROUP BY 1),
        |p AS (SELECT substring(word, i, 1) AS a, substring(word, i + 1, 1) AS b,
        |        CAST(sum(n) AS BIGINT) AS f
        |      FROM wf, unnest(range(1, length(word))) t(i)
        |      GROUP BY 1, 2),
        |top1 AS (SELECT a, b, f FROM p ORDER BY f DESC, a, b LIMIT 1)
        |SELECT CAST(8 AS BIGINT) AS n_merges,
        | a AS first_left, b AS first_right, f AS first_freq,
        | (SELECT CAST(sum(n * length(word)) AS BIGINT) FROM wf) AS initial_tokens,
        | TRUE AS freq_nonincreasing, TRUE AS applies_bounded,
        | TRUE AS lossless, TRUE AS nonempty
        |FROM top1""".stripMargin,
    // bpe_encode: the BPE token count depends on the iterated merges
    // (un-SQL-able past round 1), so the oracle recomputes the exact
    // per-doc word and character counts and pins the invariant flags
    // (words ≤ bpe ≤ chars per doc; corpus total equals the fit log's)
    "bpe_encode" ->
      """SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        | CAST(sum(length(w)) AS BIGINT) AS n_char_tokens,
        | TRUE AS bpe_bounded, TRUE AS totals_consistent, TRUE AS nonempty
        |FROM (SELECT doc_id,
        |        unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |      FROM documents)
        |WHERE length(w) > 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // bpe_fertility: lang/doc/word/char totals exact in SQL; the BPE
    // token mass travels as the bounded/consistent invariant flags
    // (the bpe_encode contract aggregated per language)
    "bpe_fertility" ->
      """SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        | CAST(count(*) AS BIGINT) AS n_words,
        | CAST(sum(length(w)) AS BIGINT) AS n_chars,
        | TRUE AS fertility_bounded, TRUE AS totals_consistent
        |FROM (SELECT doc_id, lang,
        |        unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |      FROM documents)
        |WHERE length(w) > 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "ngram_lm" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |bi AS (SELECT ws[i] AS w1, ws[i + 1] AS w2
        |       FROM w, unnest(range(1, len(ws))) t(i)),
        |t12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
        |t1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM t12 GROUP BY 1),
        |r AS (SELECT w1, w2, c12, c1, (c12 * 1000000) // c1 AS p_ppm,
        |        row_number() OVER (PARTITION BY w1 ORDER BY c12 DESC, w2) AS rk
        |      FROM t12 JOIN t1 USING (w1))
        |SELECT w1, w2, c12, c1, p_ppm, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 3 ORDER BY w1, rk""".stripMargin,
    "corpus_mix" ->
      """WITH b AS (SELECT doc_id, lang AS stratum,
        |    CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 15 WHEN 'fr' THEN 15
        |              WHEN 'es' THEN 15 WHEN 'zh' THEN 15 END AS w
        |  FROM documents WHERE lang IN ('en', 'de', 'fr', 'es', 'zh')),
        |c AS (SELECT stratum, w, count(*) AS stratum_n FROM b GROUP BY 1, 2),
        |m AS (SELECT min(stratum_n * 100 // w) AS m FROM c),
        |dims AS (SELECT stratum, CAST(stratum_n AS BIGINT) AS stratum_n,
        |           CAST((w * m.m) // 100 AS BIGINT) AS keep_n FROM c, m),
        |r AS (SELECT doc_id, stratum,
        |        row_number() OVER (PARTITION BY stratum
        |          ORDER BY md5(doc_id::VARCHAR), doc_id) AS mix_rank
        |      FROM b)
        |SELECT r.doc_id, r.stratum, d.stratum_n,
        | CAST(r.mix_rank AS BIGINT) AS mix_rank, d.keep_n
        |FROM r JOIN dims d USING (stratum)
        |WHERE r.mix_rank <= d.keep_n ORDER BY r.doc_id""".stripMargin,
    // self-checked approximate ops: the oracle recomputes the EXACT
    // side's count in SQL and asserts the bound flags are all-true —
    // a recall drop below the spec'd floor (or an estimator outside
    // its error bar, or a banding/brute mismatch) flips the hash.
    // source_profile: exact mirror — quality mass folds as
    // round(quality·10⁴) integers, so sums are order-independent
    "source_profile" ->
      """WITH w AS (SELECT doc_id, source, text,
        |    string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |q AS (SELECT doc_id, source, len(ws) AS n_words,
        |  round(least(1.0, len(ws) / 100.0) * 0.5 +
        |    (1.0 - least(1.0, round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / length(text), 6) * 10)) * 0.25 +
        |    least(1.0, round(len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0 / len(ws), 6) * 5) * 0.25, 4) AS quality,
        |  count(*) OVER (PARTITION BY md5(text)) AS n_copies
        | FROM w)
        |SELECT source, count(*) AS n_docs,
        | CAST(count(CASE WHEN n_copies > 1 THEN 1 END) AS BIGINT) AS n_dup_docs,
        | CAST(sum(n_words) AS BIGINT) AS n_tokens,
        | CAST(sum(CAST(round(quality * 10000, 0) AS BIGINT)) AS BIGINT)
        |   AS quality_e4_sum,
        | count(CASE WHEN n_copies > 1 THEN 1 END) * 1000000 // count(*)
        |   AS dup_pct_ppm
        |FROM q GROUP BY source ORDER BY source""".stripMargin,
    // corpus_drift: exact mirror — per-bucket PSI contributions scale
    // to integer ppm (one ln from exact counts), the total is an
    // order-independent integer sum
    "corpus_drift" ->
      """WITH r AS (SELECT least(9, greatest(0, n_chars // 120)) AS bucket,
        |             count(*) AS n_ref
        |           FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |c AS (SELECT least(9, greatest(0, n_chars // 120)) AS bucket,
        |        count(*) AS n_cur
        |      FROM documents WHERE doc_id % 2 != 0 GROUP BY 1),
        |d AS (SELECT CAST(i AS BIGINT) AS bucket FROM range(0, 10) t(i)),
        |j AS (SELECT d.bucket,
        |        coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        |      FROM d LEFT JOIN r ON d.bucket = r.bucket
        |             LEFT JOIN c ON d.bucket = c.bucket),
        |t AS (SELECT CAST(sum(n_ref) AS DOUBLE) AS rt,
        |        CAST(sum(n_cur) AS DOUBLE) AS ct FROM j),
        |s AS (SELECT bucket, CAST(n_ref AS BIGINT) AS n_ref,
        |        CAST(n_cur AS BIGINT) AS n_cur,
        |        CAST(round(((n_cur + 1)::DOUBLE / (t.ct + 10)
        |                    - (n_ref + 1)::DOUBLE / (t.rt + 10))
        |          * ln(((n_cur + 1)::DOUBLE / (t.ct + 10)) /
        |               ((n_ref + 1)::DOUBLE / (t.rt + 10))) * 1e6, 0) AS BIGINT)
        |          AS psi_ppm
        |      FROM j, t),
        |tot AS (SELECT CAST(sum(psi_ppm) AS BIGINT) AS total_psi_ppm FROM s)
        |SELECT s.bucket, s.n_ref, s.n_cur, s.psi_ppm, tot.total_psi_ppm,
        | tot.total_psi_ppm > 100000 AS drifted
        |FROM s, tot ORDER BY s.bucket""".stripMargin,
    // embedding_outliers: exact mirror — distances are rounded to 6
    // before the quantiles, so both engines take median/MAD over an
    // identical multiset and the robust stats reproduce exactly
    "embedding_outliers" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT i AS dim, avg(v[i]) AS cx
        |      FROM v, unnest(range(1, len(v) + 1)) t(i) GROUP BY 1),
        |cent AS (SELECT list(cx ORDER BY dim) AS cv FROM c),
        |s AS (SELECT vec_id,
        |        round(list_cosine_similarity(v, cent.cv), 6) AS cos
        |      FROM v, cent),
        |sd AS (SELECT vec_id, cos, round(1.0 - cos, 6) AS cdist FROM s),
        |m AS (SELECT quantile_cont(cdist, 0.5) AS med FROM sd),
        |a AS (SELECT vec_id, cos, cdist, m.med,
        |        abs(cdist - m.med) AS adev FROM sd, m),
        |md AS (SELECT quantile_cont(adev, 0.5) AS mad FROM a)
        |SELECT vec_id, cos, cdist,
        | round(a.med, 6) AS med, round(md.mad, 6) AS mad,
        | (md.mad > 0 AND adev > 3.5 * 1.4826 * md.mad) AS is_outlier,
        | CASE WHEN md.mad > 0
        |      THEN round((cdist - a.med) / (1.4826 * md.mad), 4) END AS robust_z
        |FROM a, md ORDER BY vec_id""".stripMargin,
    // pipeline_curate: the WHOLE composed pipeline mirrored in one
    // statement — holdout split, exact dedup (min id per md5), jaccard
    // pairs + recursive-CTE components, quality floor, 5-shingle
    // decontamination (the bloom+confirm Spark path is provably ≡ the
    // exact SQL here — no false negatives, confirm kills the fp's),
    // mixture ranks, and the running-sum pack manifest
    "pipeline_curate" ->
      """WITH RECURSIVE
        |tr AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 20 <> 0),
        |k1 AS (SELECT doc_id, lang, text FROM (
        |         SELECT doc_id, lang, text,
        |           min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM tr)
        |       WHERE doc_id = keep_id),
        |w AS (SELECT doc_id, text,
        |        string_split_regex(lower(trim(text)), '\s+') AS ws FROM k1),
        |sh0 AS (SELECT DISTINCT doc_id AS doc,
        |          array_to_string(list_slice(ws, i, i + 2), ' ') AS s
        |        FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) t(i)),
        |rare AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 100),
        |sh AS (SELECT doc, s FROM sh0 JOIN rare USING (s)),
        |sz AS (SELECT doc, count(*) AS szc FROM sh GROUP BY 1),
        |ints AS (SELECT a.doc AS id1, b.doc AS id2, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc < b.doc
        |         GROUP BY 1, 2),
        |prs AS (SELECT id1, id2 FROM ints
        |        JOIN sz x ON id1 = x.doc JOIN sz y ON id2 = y.doc
        |        WHERE round(inter * 1.0 / (x.szc + y.szc - inter), 6) >= 0.8),
        |und AS (SELECT id1 AS u, id2 AS v FROM prs UNION SELECT id2, id1 FROM prs),
        |reach(u, v) AS (SELECT DISTINCT u, u FROM und
        |  UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
        |comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u),
        |k2 AS (SELECT k1.* FROM k1 LEFT JOIN comp USING (doc_id)
        |       WHERE comp.component IS NULL OR comp.component = k1.doc_id),
        |q AS (SELECT w.doc_id,
        |        round(least(1.0, len(ws) / 100.0) * 0.5 +
        |          (1.0 - least(1.0, round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / length(text), 6) * 10)) * 0.25 +
        |          least(1.0, round(len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0 / len(ws), 6) * 5) * 0.25, 4) AS quality
        |      FROM w),
        |k3 AS (SELECT k2.doc_id, k2.lang, k2.text, q.quality
        |       FROM k2 JOIN q USING (doc_id) WHERE q.quality >= 0.5),
        |wc AS (SELECT doc_id,
        |         string_split_regex(lower(trim(text)), '\s+') AS ws FROM k3),
        |shc AS (SELECT DISTINCT doc_id AS doc,
        |          array_to_string(list_slice(ws, i, i + 4), ' ') AS s
        |        FROM wc, unnest(range(1, greatest(len(ws) - 3, 1))) t(i)),
        |we AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |       FROM documents WHERE doc_id % 20 = 0),
        |evs AS (SELECT DISTINCT array_to_string(list_slice(ws, i, i + 4), ' ') AS s
        |        FROM we, unnest(range(1, greatest(len(ws) - 3, 1))) t(i)),
        |cont AS (SELECT DISTINCT doc FROM shc JOIN evs USING (s)),
        |k4 AS (SELECT k3.* FROM k3 LEFT JOIN cont ON k3.doc_id = cont.doc
        |       WHERE cont.doc IS NULL),
        |b AS (SELECT doc_id, lang AS stratum,
        |        CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 15 WHEN 'fr' THEN 15
        |                  WHEN 'es' THEN 15 WHEN 'zh' THEN 15 END AS w_
        |      FROM k4 WHERE lang IN ('en', 'de', 'fr', 'es', 'zh')),
        |cnt AS (SELECT stratum, w_, count(*) AS stratum_n FROM b GROUP BY 1, 2),
        |m AS (SELECT min(stratum_n * 100 // w_) AS m FROM cnt),
        |dims AS (SELECT stratum, (w_ * m.m) // 100 AS keep_n FROM cnt, m),
        |r AS (SELECT doc_id, stratum,
        |        row_number() OVER (PARTITION BY stratum
        |          ORDER BY md5(doc_id::VARCHAR), doc_id) AS mix_rank
        |      FROM b),
        |k5 AS (SELECT r.doc_id, r.stratum AS lang FROM r
        |       JOIN dims d USING (stratum) WHERE r.mix_rank <= d.keep_n),
        |t AS (SELECT k5.doc_id, k5.lang, k4.quality,
        |        len(regexp_extract_all(k4.text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_tokens
        |      FROM k5 JOIN k4 USING (doc_id)),
        |c AS (SELECT *, CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |        AS token_start FROM t)
        |SELECT doc_id, lang, quality, CAST(n_tokens AS BIGINT) AS n_tokens,
        | token_start, token_start // 512 AS start_bin,
        | (token_start + greatest(n_tokens, 1) - 1) // 512 AS end_bin,
        | token_start // 512 <> (token_start + greatest(n_tokens, 1) - 1) // 512
        |   AS straddles
        |FROM c ORDER BY doc_id""".stripMargin,
    // incr_dedup_loop: the composed steady-state round — split counts
    // are hard values; merged≡from-scratch is the Spark-side check
    // pinned TRUE (a label mismatch anywhere in probe, batch-internal
    // candidates, star-edge merge, or CC flips it)
    "incr_dedup_loop" ->
      """SELECT count(CASE WHEN doc_id % 10 != 0 THEN 1 END) AS n_corpus,
        | count(CASE WHEN doc_id % 10 = 0 THEN 1 END) AS n_batch,
        | TRUE AS merged_equals_scratch, TRUE AS components_nonempty
        |FROM documents""".stripMargin,
    // minhash_index_append: the split counts are recomputed as hard
    // values; the append≡rebuild, untouched-files, and growth claims
    // are Spark-side checks pinned TRUE (the cc_incremental pattern)
    "minhash_index_append" ->
      """SELECT count(CASE WHEN doc_id % 10 NOT IN (0, 9) THEN 1 END) AS n_base,
        | count(CASE WHEN doc_id % 10 = 9 THEN 1 END) AS n_batch,
        | count(CASE WHEN doc_id % 10 = 0 THEN 1 END) AS n_incoming,
        | TRUE AS probe_equals_rebuild, TRUE AS probes_nonempty,
        | TRUE AS preexisting_untouched, TRUE AS index_grew
        |FROM documents""".stripMargin,
    // minhash_index_delete: split counts recomputed as hard values;
    // masked-probe ≡ from-scratch-reference and the tombstone file
    // contract are Spark-side checks pinned TRUE
    "minhash_index_delete" ->
      """SELECT count(CASE WHEN doc_id % 10 != 0 THEN 1 END) AS n_corpus,
        | count(CASE WHEN doc_id % 10 = 9 THEN 1 END) AS n_deleted,
        | count(CASE WHEN doc_id % 10 = 0 THEN 1 END) AS n_incoming,
        | TRUE AS probe_equals_reference, TRUE AS probes_nonempty,
        | TRUE AS preexisting_untouched, TRUE AS tombstones_only_append
        |FROM documents""".stripMargin,
    // minhash_index: oracle recomputes the exact cross-corpus pair
    // count (incoming = doc_id % 10 = 0 vs the indexed rest) and pins
    // the probe's recall-floor flag TRUE
    "minhash_index" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id AS doc,
        |          array_to_string(list_slice(ws, i, i + 2), ' ') AS s
        |        FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) t(i)),
        |rare AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 100),
        |sh AS (SELECT doc, s FROM sh0 JOIN rare USING (s)),
        |sz AS (SELECT doc, count(*) AS szc FROM sh GROUP BY 1),
        |ints AS (SELECT a.doc AS id1, b.doc AS id2, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc < b.doc
        |         GROUP BY 1, 2),
        |prs AS (SELECT id1, id2 FROM ints
        |        JOIN sz x ON id1 = x.doc JOIN sz y ON id2 = y.doc
        |        WHERE round(inter * 1.0 / (x.szc + y.szc - inter), 6) >= 0.8
        |          AND (id1 % 10 = 0) != (id2 % 10 = 0))
        |SELECT count(*) AS n_exact_cross, TRUE AS within_bound,
        | TRUE AS nonempty
        |FROM prs""".stripMargin,
    // minhash_index_stats: live/masked counts and the masked fraction
    // recomputed from the split arithmetic; layout flags pinned TRUE
    "minhash_index_stats" ->
      """SELECT count(CASE WHEN doc_id % 10 != 0 THEN 1 END) AS n_docs,
        | count(CASE WHEN doc_id % 10 = 9 THEN 1 END) AS n_docs_masked,
        | round(count(CASE WHEN doc_id % 10 = 9 THEN 1 END) * 1.0 /
        |   count(CASE WHEN doc_id % 10 != 0 THEN 1 END), 6) AS masked_fraction,
        | TRUE AS band_layout_ok, TRUE AS band_bytes_positive
        |FROM documents""".stripMargin,
    // embed_dedup_index: split counts and the exact cosine cross-pair
    // count recomputed as hard values; probe ≡ in-memory-reference and
    // the recall floor are Spark-side checks pinned TRUE
    "embed_dedup_index" ->
      """WITH prs AS (
        | SELECT a.vec_id AS id1, b.vec_id AS id2
        | FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        | WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4
        |   AND (a.vec_id % 10 = 0) != (b.vec_id % 10 = 0))
        |SELECT
        | (SELECT count(*) FROM embeddings WHERE vec_id % 10 != 0) AS n_corpus,
        | (SELECT count(*) FROM embeddings WHERE vec_id % 10 = 0) AS n_batch,
        | count(*) AS n_exact_cross, TRUE AS within_bound,
        | TRUE AS probe_equals_reference, TRUE AS probes_nonempty
        |FROM prs""".stripMargin,
    // stream_dedup_index: the SQL-exact Jaccard pair count is the hard
    // anchor; stream ≡ one-shot-batch equality and the recall floor
    // are Spark-side checks pinned TRUE
    "stream_dedup_index" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id AS doc,
        |          array_to_string(list_slice(ws, i, i + 2), ' ') AS s
        |        FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) t(i)),
        |rare AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 100),
        |sh AS (SELECT doc, s FROM sh0 JOIN rare USING (s)),
        |sz AS (SELECT doc, count(*) AS szc FROM sh GROUP BY 1),
        |ints AS (SELECT a.doc AS id1, b.doc AS id2, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc < b.doc
        |         GROUP BY 1, 2),
        |prs AS (SELECT id1, id2 FROM ints
        |        JOIN sz x ON id1 = x.doc JOIN sz y ON id2 = y.doc
        |        WHERE round(inter * 1.0 / (x.szc + y.szc - inter), 6) >= 0.8)
        |SELECT count(*) AS n_exact_pairs, TRUE AS within_bound,
        | TRUE AS stream_equals_batch, TRUE AS pairs_nonempty,
        | TRUE AS nonempty
        |FROM prs""".stripMargin,
    "dedup_minhash_lsh" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id AS doc,
        |          array_to_string(list_slice(ws, i, i + 2), ' ') AS s
        |        FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) t(i)),
        |rare AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 100),
        |sh AS (SELECT doc, s FROM sh0 JOIN rare USING (s)),
        |sz AS (SELECT doc, count(*) AS szc FROM sh GROUP BY 1),
        |ints AS (SELECT a.doc AS id1, b.doc AS id2, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc < b.doc
        |         GROUP BY 1, 2),
        |prs AS (SELECT id1, id2 FROM ints
        |        JOIN sz x ON id1 = x.doc JOIN sz y ON id2 = y.doc
        |        WHERE round(inter * 1.0 / (x.szc + y.szc - inter), 6) >= 0.8)
        |SELECT count(*) AS n_exact_pairs, TRUE AS within_bound, TRUE AS est_ok,
        | TRUE AS nonempty
        |FROM prs""".stripMargin,
    "dedup_simhash" ->
      "SELECT count(*) AS n_docs, TRUE AS sets_equal, TRUE AS nonempty FROM documents",
    "dedup_embedding_lsh" ->
      """SELECT count(*) AS n_exact_pairs, TRUE AS within_bound, TRUE AS nonempty
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4""".stripMargin,
    "knn_join_blocked" ->
      """SELECT CAST(3 * count(*) AS BIGINT) AS n_exact, TRUE AS within_bound,
        | TRUE AS nonempty
        |FROM embeddings""".stripMargin,
    "ann_lsh" ->
      "SELECT CAST(10 AS BIGINT) AS k, TRUE AS within_bound, TRUE AS nonempty",
    "ivf_ann" ->
      "SELECT CAST(10 AS BIGINT) AS k, TRUE AS within_bound, TRUE AS nonempty",
    "pq_ann" ->
      "SELECT CAST(10 AS BIGINT) AS k, TRUE AS within_bound, TRUE AS nonempty",
    "sq8_ann" ->
      "SELECT CAST(10 AS BIGINT) AS k, TRUE AS within_bound, TRUE AS nonempty",
    "ivfpq_ann" ->
      "SELECT CAST(10 AS BIGINT) AS k, TRUE AS within_bound, TRUE AS nonempty",
    "ivfpq_residual" ->
      "SELECT CAST(10 AS BIGINT) AS k, TRUE AS within_bound, TRUE AS nonempty",
    "dedup_semantic" ->
      """WITH RECURSIVE prs AS (
        | SELECT a.vec_id AS id1, b.vec_id AS id2
        | FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        | WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4),
        |und AS (SELECT id1 AS u, id2 AS v FROM prs UNION SELECT id2, id1 FROM prs),
        |reach(u, v) AS (
        |  SELECT DISTINCT u, u FROM und
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
        |comp AS (SELECT u AS vec_id, min(v) AS component FROM reach GROUP BY u)
        |SELECT e.vec_id, e.label,
        | coalesce(c.component, e.vec_id) AS cluster,
        | e.vec_id = coalesce(c.component, e.vec_id) AS is_canonical
        |FROM embeddings e LEFT JOIN comp c USING (vec_id)
        |ORDER BY e.vec_id""".stripMargin,
    "dedup_components" -> fullCcOracleSql,
    "dedup_cluster_stats" -> ccStatsOracleSql,
    // cc_incremental merges a prior labeling with a new edge batch and
    // must converge to the SAME canonical labels as the from-scratch
    // computation — one oracle checks both paths
    "cc_incremental" -> fullCcOracleSql,
    "corpus_curate" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id AS doc,
        |          array_to_string(list_slice(ws, i, i + 2), ' ') AS s
        |        FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) t(i)),
        |rare AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 100),
        |sh AS (SELECT doc, s FROM sh0 JOIN rare USING (s)),
        |sz AS (SELECT doc, count(*) AS szc FROM sh GROUP BY 1),
        |ints AS (SELECT a.doc AS id1, b.doc AS id2, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc < b.doc
        |         GROUP BY 1, 2),
        |dups AS (SELECT DISTINCT id2 FROM ints
        |         JOIN sz x ON id1 = x.doc JOIN sz y ON id2 = y.doc
        |         WHERE round(inter * 1.0 / (x.szc + y.szc - inter), 6) >= 0.8),
        |q AS (SELECT doc_id,
        |  len(ws) AS n_words,
        |  round(least(1.0, len(ws) / 100.0) * 0.5 +
        |    (1.0 - least(1.0, round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / length(text), 6) * 10)) * 0.25 +
        |    least(1.0, round(len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0 / len(ws), 6) * 5) * 0.25, 4) AS quality
        | FROM w JOIN documents USING (doc_id))
        |SELECT d.doc_id, d.lang, d.n_chars, q.n_words, q.quality
        |FROM documents d
        |LEFT JOIN dups ON d.doc_id = dups.id2
        |JOIN q ON q.doc_id = d.doc_id
        |WHERE dups.id2 IS NULL AND q.quality >= 0.5
        |ORDER BY d.doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    // graph_triangles: same pair CTE as dedup_ngram_jaccard, then
    // degrees → (degree, id) orientation → oriented wedge total, and
    // the triangle count via the ordered 3-way pair join (id1 < id2
    // everywhere, so a < b < c enumerates each triangle once)
    "graph_triangles" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id AS doc,
        |          array_to_string(list_slice(ws, i, i + 2), ' ') AS s
        |        FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) t(i)),
        |rare AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 100),
        |sh AS (SELECT doc, s FROM sh0 JOIN rare USING (s)),
        |sz AS (SELECT doc, count(*) AS szc FROM sh GROUP BY 1),
        |ints AS (SELECT a.doc AS id1, b.doc AS id2, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc < b.doc
        |         GROUP BY 1, 2),
        |p AS (SELECT id1, id2 FROM ints
        |      JOIN sz x ON id1 = x.doc JOIN sz y ON id2 = y.doc
        |      WHERE round(inter * 1.0 / (x.szc + y.szc - inter), 6) >= 0.8),
        |deg AS (SELECT n, count(*) AS d FROM (
        |          SELECT id1 AS n FROM p UNION ALL SELECT id2 FROM p)
        |        GROUP BY 1),
        |o AS (SELECT CASE WHEN (du.d, p.id1) < (dv.d, p.id2)
        |             THEN p.id1 ELSE p.id2 END AS lo
        |      FROM p JOIN deg du ON p.id1 = du.n JOIN deg dv ON p.id2 = dv.n),
        |wc AS (SELECT CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT)
        |         AS n_wedges
        |       FROM (SELECT lo, count(*) AS d FROM o GROUP BY 1)),
        |tri AS (SELECT count(*) AS n_triangles
        |        FROM p a JOIN p b ON a.id2 = b.id1
        |               JOIN p c ON c.id1 = a.id1 AND c.id2 = b.id2)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        | (SELECT count(*) FROM p) AS n_edges,
        | wc.n_wedges, tri.n_triangles
        |FROM wc, tri""".stripMargin,
    // corpus_sample_weighted: the cumulative-weight line and the
    // ceil-division hit counts are pure BIGINT arithmetic — identical
    // in any engine
    "corpus_sample_weighted" ->
      """WITH b AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w
        |           FROM documents WHERE n_chars > 0),
        |c AS (SELECT doc_id, w,
        |        CAST(coalesce(sum(w) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS w_start
        |      FROM b),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM b)
        |SELECT doc_id, w AS weight, w_start,
        | CAST((100 * (w_start + w) + tw - 1) // tw
        |   - (100 * w_start + tw - 1) // tw AS BIGINT) AS n_hits
        |FROM c, t
        |WHERE (100 * (w_start + w) + tw - 1) // tw
        |   - (100 * w_start + tw - 1) // tw > 0
        |ORDER BY doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id AS doc,
        |          array_to_string(list_slice(ws, i, i + 2), ' ') AS s
        |        FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) t(i)),
        |rare AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 100),
        |sh AS (SELECT doc, s FROM sh0 JOIN rare USING (s)),
        |sz AS (SELECT doc, count(*) AS szc FROM sh GROUP BY 1),
        |ints AS (SELECT a.doc AS id1, b.doc AS id2, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc < b.doc
        |         GROUP BY 1, 2)
        |SELECT id1, id2, inter,
        | round(inter * 1.0 / (x.szc + y.szc - inter), 6) AS jaccard
        |FROM ints JOIN sz x ON id1 = x.doc JOIN sz y ON id2 = y.doc
        |WHERE round(inter * 1.0 / (x.szc + y.szc - inter), 6) >= 0.8
        |ORDER BY id1, id2""".stripMargin,
    "dedup_embedding" ->
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        | round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4
        |ORDER BY id1, id2""".stripMargin,
    "embedding_centroids" ->
      """SELECT label, i AS dim,
        | round(avg(embedding[i + 1]::DOUBLE), 6) AS mean, count(*) AS n_vectors
        |FROM embeddings, unnest(range(len(embedding))) t(i)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "knn_join" ->
      """WITH pairs AS (
        | SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
        |   round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
        | FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY src_id
        |        ORDER BY cos DESC, nbr_id) AS rk FROM pairs)
        |SELECT src_id, nbr_id, cos, rk FROM r WHERE rk <= 3
        |ORDER BY src_id, rk""".stripMargin,
    "knn_brute" ->
      """SELECT e.vec_id, e.label,
        | round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS cos
        |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY cos DESC, e.vec_id LIMIT 25""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |  string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents)
        |SELECT doc_id,
        | length(text) AS n_chars,
        | len(ws) AS n_words,
        | round(length(regexp_replace(text, '\s', '', 'g')) * 1.0 / len(ws), 4) AS avg_word_len,
        | round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / length(text), 6) AS punct_ratio,
        | round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 1.0 / length(text), 6) AS digit_ratio,
        | round(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is','it'))) * 1.0 / len(ws), 6) AS stop_ratio,
        | round(least(1.0, len(ws) / 100.0) * 0.5 +
        |   (1.0 - least(1.0, round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / length(text), 6) * 10)) * 0.25 +
        |   least(1.0, round(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is','it'))) * 1.0 / len(ws), 6) * 5) * 0.25, 4) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "lang_id" ->
      """WITH t AS (SELECT doc_id,
        |  string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |h AS (SELECT doc_id,
        |  len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is','it'))) AS en_hits,
        |  len(list_filter(ws, w -> w IN ('der','die','das','und','ist','ein','zu','den'))) AS de_hits,
        |  len(list_filter(ws, w -> w IN ('le','la','les','et','est','un','une','des'))) AS fr_hits,
        |  len(list_filter(ws, w -> w IN ('el','los','las','y','es','un','una','de'))) AS es_hits
        | FROM t)
        |SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
        | CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits AND en_hits > 0 THEN 'en'
        |      WHEN de_hits >= fr_hits AND de_hits >= es_hits AND de_hits > 0 THEN 'de'
        |      WHEN fr_hits >= es_hits AND fr_hits > 0 THEN 'fr'
        |      WHEN es_hits > 0 THEN 'es'
        |      ELSE 'unknown' END AS lang_guess
        |FROM h ORDER BY doc_id""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        | len(string_split_regex(lower(trim(text)), '\s+')) AS ws_tokens,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe_tokens,
        | round(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) * 1.0 /
        |   len(string_split_regex(lower(trim(text)), '\s+')), 4) AS tokens_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pii_scrub" ->
      """SELECT doc_id,
        | len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        | len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssns,
        | len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phones,
        | len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        | regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |   '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
        |  '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g'),
        | '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS scrubbed,
        | len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |  + len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))
        |  + len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
        |  + len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) = 0 AS is_clean
        |FROM documents ORDER BY doc_id""".stripMargin,
    "corpus_split" ->
      """SELECT doc_id,
        | CASE WHEN substring(md5(doc_id::VARCHAR), 1, 1) IN ('c','d') THEN 'valid'
        |      WHEN substring(md5(doc_id::VARCHAR), 1, 1) IN ('e','f') THEN 'test'
        |      ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tfidf_terms" ->
      """WITH toks AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (SELECT doc_id, term, tf, df, (tf * 1000000) // df AS score_ppm
        |           FROM tf JOIN dfreq USING (term)),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |         ORDER BY score_ppm DESC, term) AS rk FROM scored)
        |SELECT doc_id, term, tf, df, score_ppm, rk
        |FROM rk WHERE rk <= 5 ORDER BY doc_id, rk""".stripMargin,
    "top_p_terms" ->
      """WITH toks AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |c AS (SELECT doc_id, term, tf,
        |  CAST(coalesce(sum(tf) OVER (PARTITION BY doc_id
        |    ORDER BY tf DESC, term
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
        |  CAST(sum(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS total_tf
        | FROM tf)
        |SELECT doc_id, term, tf, cum_before, total_tf FROM c
        |WHERE cum_before * 2 < total_tf
        |ORDER BY doc_id, cum_before, term""".stripMargin,
    "seq_pack" ->
      """WITH t AS (SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start
        |  FROM t)
        |SELECT doc_id, n_tokens, token_start,
        | token_start // 512 AS start_bin,
        | (token_start + greatest(n_tokens, 1) - 1) // 512 AS end_bin,
        | token_start // 512 <> (token_start + greatest(n_tokens, 1) - 1) // 512 AS straddles
        |FROM c ORDER BY doc_id""".stripMargin,
    "doc_chunk" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents)
        |SELECT doc_id, i AS chunk_idx, i * 40 AS chunk_start,
        | len(list_slice(ws, i * 40 + 1, i * 40 + 50)) AS n_chunk_words,
        | array_to_string(list_slice(ws, i * 40 + 1, i * 40 + 50), ' ') AS chunk_text
        |FROM w, unnest(range(0, (len(ws) - 1) // 40 + 1)) t(i)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "decontaminate_bloom" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |sh AS (SELECT DISTINCT doc_id AS doc,
        |         array_to_string(list_slice(ws, i, i + 4), ' ') AS s
        |       FROM w, unnest(range(1, greatest(len(ws) - 3, 1))) t(i)),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc % 20 = 0),
        |hits AS (SELECT doc, count(*) AS n_shared
        |         FROM sh JOIN ev USING (s) WHERE doc % 20 <> 0 GROUP BY 1)
        |SELECT count(*) AS n_train_docs,
        | count(CASE WHEN h.n_shared > 0 THEN 1 END) AS n_contaminated,
        | TRUE AS sets_equal,
        | count(CASE WHEN h.n_shared > 0 THEN 1 END) > 0 AS nonempty
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc
        |WHERE d.doc_id % 20 <> 0""".stripMargin,
    "decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |sh AS (SELECT DISTINCT doc_id AS doc,
        |         array_to_string(list_slice(ws, i, i + 4), ' ') AS s
        |       FROM w, unnest(range(1, greatest(len(ws) - 3, 1))) t(i)),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc % 20 = 0),
        |hits AS (SELECT doc, count(*) AS n_shared
        |         FROM sh JOIN ev USING (s) WHERE doc % 20 <> 0 GROUP BY 1)
        |SELECT d.doc_id, coalesce(h.n_shared, 0) AS n_shared,
        | coalesce(h.n_shared, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc
        |WHERE d.doc_id % 20 <> 0 ORDER BY d.doc_id""".stripMargin,
    "corpus_sample" ->
      """WITH r AS (SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY md5(doc_id::VARCHAR), doc_id) AS sample_rank
        |  FROM documents)
        |SELECT doc_id, source, sample_rank FROM r
        |WHERE sample_rank <= 10 ORDER BY doc_id""".stripMargin,
    "repetition_score" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |sh AS (SELECT doc_id, array_to_string(list_slice(ws, i, i + 2), ' ') AS s
        |       FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) t(i)),
        |agg AS (SELECT doc_id, count(*) AS n_grams, count(DISTINCT s) AS n_distinct
        |        FROM sh GROUP BY 1)
        |SELECT d.doc_id,
        | coalesce(a.n_grams, 0) AS n_grams,
        | coalesce(a.n_distinct, 0) AS n_distinct,
        | round(CASE WHEN a.n_grams IS NULL THEN 0.0
        |   ELSE 1.0 - a.n_distinct * 1.0 / a.n_grams END, 6) AS dup_ratio,
        | round(CASE WHEN a.n_grams IS NULL THEN 0.0
        |   ELSE 1.0 - a.n_distinct * 1.0 / a.n_grams END, 6) > 0.2 AS is_repetitive
        |FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    "quality_stratified" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |q AS (SELECT d.doc_id, d.source,
        |  round(least(1.0, len(ws) / 100.0) * 0.5 +
        |    (1.0 - least(1.0, round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / length(text), 6) * 10)) * 0.25 +
        |    least(1.0, round(len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0 / len(ws), 6) * 5) * 0.25, 4) AS quality
        | FROM w JOIN documents d USING (doc_id)),
        |r AS (SELECT doc_id, source, quality,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY quality DESC, doc_id) AS q_rank,
        |  count(*) OVER (PARTITION BY source) AS stratum_n
        | FROM q)
        |SELECT doc_id, source, quality, q_rank, stratum_n FROM r
        |WHERE q_rank * 2 <= stratum_n * 1 ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      """WITH fps AS (SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
        | FROM documents),
        |g AS (SELECT fp, count(*) AS group_size, min(doc_id) AS canonical_id
        |      FROM fps GROUP BY 1)
        |SELECT doc_id, fp, group_size, doc_id = canonical_id AS is_canonical
        |FROM fps JOIN g USING (fp) ORDER BY doc_id""".stripMargin,
    // contamination_report: same shingle CTE as decontaminate_bloom,
    // aggregated per EVAL doc — xxhash64 shingles collide with odds
    // ~n²/2⁶⁴ so the string-shingle recomputation matches exactly
    "contamination_report" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |sh AS (SELECT DISTINCT doc_id AS doc,
        |         array_to_string(list_slice(ws, i, i + 4), ' ') AS s
        |       FROM w, unnest(range(1, greatest(len(ws) - 3, 1))) t(i)),
        |hits AS (SELECT e.doc AS eval_id,
        |           count(DISTINCT t.doc) AS n_hit_train_docs,
        |           count(DISTINCT e.s) AS n_shared_grams
        |         FROM sh e JOIN sh t ON e.s = t.s
        |         WHERE e.doc % 20 = 0 AND t.doc % 20 <> 0 GROUP BY 1)
        |SELECT d.doc_id AS eval_id,
        | coalesce(h.n_hit_train_docs, 0) AS n_hit_train_docs,
        | coalesce(h.n_shared_grams, 0) AS n_shared_grams,
        | coalesce(h.n_shared_grams, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.eval_id
        |WHERE d.doc_id % 20 = 0 ORDER BY 1""".stripMargin,
    // contamination_multi: per-benchmark rollup of the same hit join —
    // three planted benchmarks ((doc_id // 20) % 3), integer-exact ppm
    "contamination_multi" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |sh AS (SELECT DISTINCT doc_id AS doc,
        |         array_to_string(list_slice(ws, i, i + 4), ' ') AS s
        |       FROM w, unnest(range(1, greatest(len(ws) - 3, 1))) t(i)),
        |e AS (SELECT doc_id, (doc_id // 20) % 3 AS bench FROM documents
        |      WHERE doc_id % 20 = 0),
        |hits AS (SELECT e.bench, es.doc AS eval_id, t.doc AS train_doc, es.s
        |         FROM sh es JOIN e ON es.doc = e.doc_id
        |           JOIN sh t ON es.s = t.s AND t.doc % 20 <> 0),
        |agg AS (SELECT bench,
        |          count(DISTINCT eval_id) AS n_contaminated,
        |          count(DISTINCT train_doc) AS n_hit_train_docs,
        |          count(DISTINCT s) AS n_shared_grams
        |        FROM hits GROUP BY 1),
        |ne AS (SELECT bench, count(*) AS n_eval_docs FROM e GROUP BY 1)
        |SELECT ne.bench, ne.n_eval_docs,
        | coalesce(a.n_contaminated, 0) AS n_contaminated,
        | coalesce(a.n_hit_train_docs, 0) AS n_hit_train_docs,
        | coalesce(a.n_shared_grams, 0) AS n_shared_grams,
        | coalesce(a.n_contaminated, 0) * 1000000 // ne.n_eval_docs
        |   AS contamination_ppm
        |FROM ne LEFT JOIN agg a USING (bench) ORDER BY ne.bench""".stripMargin,
    "source_cap" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY n_chars DESC, doc_id) AS q_rank
        | FROM documents)
        |SELECT source, doc_id, n_chars, CAST(q_rank AS BIGINT) AS q_rank
        |FROM r WHERE q_rank <= 25 ORDER BY source, doc_id""".stripMargin,
    // train_shards: the seeded order key and the exclusive prefix sum
    // are both engine-agnostic (md5 hex + integer window sum), so the
    // whole shard assignment is exact in SQL
    "train_shards" ->
      """WITH t AS (SELECT doc_id,
        |  len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
        |  md5('s42|' || doc_id) AS ok FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY ok, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start
        |  FROM t)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, token_start,
        | token_start // 2048 AS shard_id
        |FROM c ORDER BY doc_id""".stripMargin,
    // cluster_silhouette: centroids re-derived exactly (the
    // embedding_centroids aggregate), distances via the same rounded
    // list_cosine_similarity contract as every cosine in this registry
    "cluster_silhouette" ->
      """WITH cent AS (SELECT label, i AS dim,
        |  round(avg(embedding[i + 1]::DOUBLE), 6) AS mean
        | FROM embeddings, unnest(range(len(embedding))) t(i) GROUP BY 1, 2),
        |cvec AS (SELECT label AS clabel, list(mean ORDER BY dim) AS cv
        |         FROM cent GROUP BY 1),
        |d AS (SELECT e.vec_id, e.label, c.clabel,
        |   1 - round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) AS dist
        | FROM embeddings e CROSS JOIN cvec c),
        |ab AS (SELECT vec_id, label,
        |   min(CASE WHEN label = clabel THEN dist END) AS a,
        |   min(CASE WHEN label <> clabel THEN dist END) AS b
        | FROM d GROUP BY 1, 2),
        |s AS (SELECT label,
        |   CASE WHEN greatest(a, b) = 0 THEN 0.0
        |        ELSE (b - a) / greatest(a, b) END AS s
        | FROM ab)
        |SELECT label, count(*) AS n_members, round(avg(s), 4) AS mean_silhouette
        |FROM s GROUP BY label ORDER BY label""".stripMargin)
}
