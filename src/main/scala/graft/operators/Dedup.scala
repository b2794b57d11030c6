package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/**
 * Deduplication operators for large-scale training-data pipelines.
 *
 * Scale design: NOTHING here is all-pairs over the corpus. Candidate
 * pairs always come from an equi-join on a blocking key (content hash,
 * shared shingle, LSH band, SimHash band), so the shuffle is keyed and
 * the quadratic blowup is confined to within-block groups. Frequent
 * shingles (stop-shingles) are dropped before the self-join — at 100 TB
 * a single shingle shared by 10^6 docs would otherwise create a 10^12
 * -row join block; `maxShingleFreq` caps that and loses only
 * candidates that share *only* ubiquitous (hence uninformative)
 * shingles.
 */
object Dedup {

  /**
   * Materialization point for frames read by several downstream
   * consumers (signature tables, annotated shingle tables). Default is
   * `localCheckpoint(eager = true)`: compute once, truncate lineage.
   * Contract a caller must know:
   *  - the checkpoint RUNS A JOB at DataFrame-construction time;
   *  - its blocks stay in the block manager until the session clears
   *    them (`spark.sharedState.cacheManager` / `getPersistentRDDs`
   *    unpersist — Bench does this per run) — a long-lived pipeline
   *    invoking these operators in a loop should clear or disable;
   *  - localCheckpoint trades fault tolerance away (executor loss =
   *    job failure). On a real cluster at 100 TB, set
   *    `spark.graft.materialize=none` (recompute per consumer, fully
   *    fault-tolerant) or checkpoint to reliable storage yourself.
   */
  private[graft] def materialize(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.materialize")
      .getOrElse("localCheckpoint") match {
      case "none" => df
      // already a bare checkpoint/local-relation scan: re-checkpointing
      // would copy the blocks through one more blocking job for zero
      // lineage benefit (r11 — minhashRound hands its checkpointed
      // batch sigs to the append path, which used to checkpoint again)
      case _ if df.queryExecution.analyzed
        .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD] => df
      case _ => df.localCheckpoint()
    }

  /**
   * Loop-boundary materializer for ITERATIVE operators (connected
   * components, PageRank). Unlike [[materialize]] there is no "none"
   * option — a loop that never truncates lineage grows its plan with
   * the iteration count — so the conf chooses WHERE the truncated
   * state lives:
   *  - default: `localCheckpoint` — fast, blocks in executor memory;
   *    executor loss after materialization kills the job (fine on
   *    local[n], a real risk on a 1000-executor cluster);
   *  - `spark.graft.checkpointDir=<path>`: RELIABLE checkpoints to
   *    that directory — every round persists to fault-tolerant
   *    storage and the lineage roots there, so executor (even
   *    driver-restart with external shuffle) loss recomputes from the
   *    checkpoint, not from scratch. This is the deployment shape for
   *    long CC/PageRank runs at 100 TB; CheckpointDirSpec proves the
   *    results are identical under either setting.
   */
  private[graft] def materializeLoop(df: DataFrame,
      eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dirPath) if dirPath.nonEmpty =>
        // setCheckpointDir stores a scheme-qualified `<dir>/<UUID>`
        // child, so compare the PARENT of the active dir against the
        // scheme-qualified configured path — plain equality would
        // never hold (every loop boundary would mint a fresh UUID
        // subdirectory), and the old substring test matched any active
        // dir whose path merely CONTAINED the configured one (conf
        // `/ckpt` vs stale `/ckpt-old/<uuid>`), leaving checkpoints in
        // the wrong directory
        val conf = spark.sessionState.newHadoopConf()
        val wanted = {
          val p = new org.apache.hadoop.fs.Path(dirPath)
          p.getFileSystem(conf).makeQualified(p).toString.stripSuffix("/")
        }
        val activeParent = spark.sparkContext.getCheckpointDir
          .map(d => new org.apache.hadoop.fs.Path(d).getParent.toString
            .stripSuffix("/"))
        if (!activeParent.contains(wanted))
          spark.sparkContext.setCheckpointDir(dirPath)
        df.checkpoint(eager)
      case _ => df.localCheckpoint(eager)
    }
  }

  /** Exact dedup: group documents by content hash, keep the smallest id. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /**
   * Distinct (id, shingle-hash) rows. Shingles are built from an
   * exploded word table with lead() windows — every step (explode,
   * lead, concat, hash) is codegen'd. The row-local alternative
   * (transform+slice+array_join over the word array) is an interpreted
   * higher-order chain and benchmarked ~6× slower than the whole rest
   * of the pipeline combined. Shingles are 64-bit-hashed immediately:
   * downstream shuffles and joins carry fixed-width longs, and the
   * ~n²/2⁶⁴ collision odds don't matter for candidate generation or
   * set-size counts.
   */
  private[operators] def shingleHashes(df: DataFrame, idCol: String,
      textCol: String, n: Int, distinctRows: Boolean = true): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("pos"))
    val wordTable = df.select(col(idCol).as("doc"),
      posexplode(words(col(textCol))).as(Seq("pos", "w")))
    val withLeads = wordTable.select(col("doc") +: col("w").as("w0") +:
      (1 until n).map(k => lead(col("w"), k).over(byDoc).as(s"w$k")): _*)
    val rows = withLeads
      .filter(col(s"w${n - 1}").isNotNull) // concat_ws would silently drop nulls
      .select(col("doc"),
        xxhash64(concat_ws(" ", (0 until n).map(k => col(s"w$k")): _*)).as("s"))
    if (distinctRows) rows.distinct() else rows
  }

  /**
   * Shingle table annotated with everything the jaccard join needs —
   * document frequency (stop-shingle filter + rarity order), per-doc
   * set size, and rarest-first rank — computed as two chained window
   * passes (shuffle by shingle, then by doc; size and rank share the
   * doc shuffle) instead of three groupBy+join-back pairs, then
   * materialized ONCE: the prefix index and both sides of the
   * intersection join all read the same checkpointed rows rather than
   * re-deriving the shingle pipeline per consumer.
   */
  private def annotateShingles(shRaw: DataFrame,
      maxShingleFreq: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wS = Window.partitionBy(col("s"))
    val wDoc = Window.partitionBy(col("doc"))
    val wRank = Window.partitionBy(col("doc")).orderBy(col("df_count"), col("s"))
    materialize(shRaw
      .withColumn("df_count", count(lit(1)).over(wS))
      .filter(col("df_count") <= maxShingleFreq)
      .withColumn("sz", count(lit(1)).over(wDoc))
      .withColumn("rank", row_number().over(wRank)))
  }

  /**
   * Exact n-gram Jaccard near-dup pairs ≥ threshold, with PPJoin-style
   * candidate pruning (exact — no recall loss):
   *
   *  1. size bound: jaccard(A,B) ≥ τ forces τ·|A| ≤ |B| ≤ |A|/τ, so
   *     the candidate join condition carries the size-ratio predicate;
   *  2. positional prefix filter: under a global shingle order
   *     (rarest-first by document frequency), any pair with overlap
   *     ≥ ⌈τ·sz⌉ must share a shingle among each doc's first
   *     sz − ⌈τ·sz⌉ + 1 shingles — so only that prefix is indexed
   *     for candidate generation. At τ=0.8 that indexes ~20% of
   *     shingles, cutting the self-join's row count ~25× versus
   *     joining the full shingle table against itself.
   *
   * The exact intersection count is then computed only for surviving
   * candidate pairs (candidates ⋈ shingles ⋈ shingles, both joins
   * equi-keyed), never by materializing both shingle sets on one node.
   */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      maxShingleFreq: Int = 100): DataFrame =
    ngramJaccardPairsFromShingles(
      shingleHashes(df, idCol, textCol, n), threshold, maxShingleFreq)

  /** Jaccard pair join over an existing distinct (doc, s) shingle
    * table — lets the registry self-check share ONE shingle pass with
    * the MinHash side. */
  private[operators] def ngramJaccardPairsFromShingles(shRaw: DataFrame,
      threshold: Double, maxShingleFreq: Int): DataFrame = {
    val sh = annotateShingles(shRaw, maxShingleFreq)
    // rarest-first prefix: only the first sz − ⌈τ·sz⌉ + 1 shingles
    // of a doc can open a candidate pair
    val prefix = sh
      .filter(col("rank") <= col("sz") - ceil(col("sz") * threshold) + 1)
      .select(col("doc"), col("s"), col("sz"))
    val candidates = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc") &&
          col("a.sz") * threshold <= col("b.sz") &&
          col("b.sz") * threshold <= col("a.sz"))
      .select(col("a.doc").as("id1"), col("b.doc").as("id2"),
        col("a.sz").as("sz1"), col("b.sz").as("sz2"))
      .distinct()
    val inter = candidates
      .join(sh.as("sa"), col("sa.doc") === col("id1"))
      .join(sh.as("sb"), col("sb.doc") === col("id2") && col("sb.s") === col("sa.s"))
      .groupBy(col("id1"), col("id2"), col("sz1"), col("sz2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard",
        round(col("inter") / (col("sz1") + col("sz2") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("inter"), col("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  /**
   * MinHash + banded LSH candidate pairs, each carrying `est_jaccard` —
   * the MinHash Jaccard ESTIMATE (fraction of agreeing signature
   * components; E[est] = J, σ = √(J(1−J)/k) ≈ 0.05 at k=64, J=0.8, so
   * the signature is a measuring instrument, not just a candidate
   * generator — a pipeline can threshold on it without re-shingling).
   *
   * Signatures come from ONE explode of the shingle set followed by k
   * min-aggregates (map-side partial min, one shuffle keyed on doc) —
   * shingle construction runs once per document, never once per hash
   * function (inlining the shingle expression into all k lambdas blows
   * the plan up ~k×). bands×rowsPerBand = signature length;
   * P(candidate) ≈ 1-(1-j^rows)^bands — 16×4 targets j ≳ 0.6.
   *
   * Scale shape: the band self-join shuffles NARROW (doc, band, bucket)
   * longs; full k-long signatures are fetched by equi-join once per
   * unique surviving pair (same fetch-by-join pattern as the embedding
   * LSH paths), so the quadratic stage never carries signature payloads.
   */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4): DataFrame =
    minhashLshPairsFromShingles(shingleHashes(df, idCol, textCol, n),
      bands, rowsPerBand)

  // NOTE: sharing ONE materialized shingle table between the jaccard
  // and minhash sides of the registry self-check was measured SLOWER
  // (sf1: 19.6s vs 16.0s) — the raw shingle table is large, and
  // checkpointing it costs more than recomputing the codegen'd explode
  // pass twice. Unlike the simhash signature table (64 aggregate
  // columns, genuinely expensive — see simhashPairsBoth), shingle
  // construction is cheap; only its ANNOTATED form (3 window passes)
  // merits materialization, which each side already does for itself.
  private[operators] def minhashLshPairsFromShingles(sh: DataFrame,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val k = bands * rowsPerBand
    // banding + both fetch sides read the signatures; compute once
    // (see `materialize` for the checkpoint contract)
    val sigs = materialize(sh.groupBy(col("doc"))
      .agg(min(xxhash64(lit(0), col("s"))).as("sig_0"),
        (1 until k).map(i => min(xxhash64(lit(i), col("s"))).as(s"sig_$i")): _*))
    val banded = sigs.select(col("doc"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(lit(b) +: (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}")): _*)
      }: _*)).as(Seq("band", "bucket")))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id1"), col("b.doc").as("id2"))
      .distinct()
    val agree = (0 until k).map(i =>
      when(col(s"sa.sig_$i") === col(s"sb.sig_$i"), 1).otherwise(0))
      .reduce(_ + _)
    cands
      .join(sigs.as("sa"), col("id1") === col("sa.doc"))
      .join(sigs.as("sb"), col("id2") === col("sb.doc"))
      .select(col("id1"), col("id2"),
        round(agree.cast("double") / k, 6).as("est_jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  /**
   * SimHash near-dup pairs: 64-bit signature, banded into 4×16-bit
   * blocks — any pair within hamming distance 3 shares at least one
   * intact block (pigeonhole), so the block join finds all such pairs
   * without an all-pairs scan.
   */
  /** 64-bit SimHash signature per document: one explode + 64
    * conditional sums (hash each token once, not once per bit); the
    * signature long is assembled from the aggregated bit votes with
    * literal shifts. Exposed for the recall spec, which proves the
    * banded join below finds EXACTLY the brute-force hamming pairs. */
  private[operators] def simhashSignatures(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc"),
        explode(array_distinct(words(col(textCol)))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitVotes = toks.groupBy(col("doc"))
      .agg(sum(when(expr("(shiftright(h, 0) & 1) = 1"), 1L).otherwise(-1L)).as("b0"),
        (1 until 64).map(b =>
          sum(when(expr(s"(shiftright(h, $b) & 1) = 1"), 1L).otherwise(-1L)).as(s"b$b")): _*)
    bitVotes.select(col("doc"),
      (0 until 64).map(b =>
        shiftleft(when(col(s"b$b") > 0, 1L).otherwise(0L), b))
        .reduce(_ bitwiseOR _).as("sig"))
  }

  /** Banded pair join over an existing signature table. */
  private def simhashBandedFrom(sigs: DataFrame, maxHamming: Int): DataFrame = {
    // shiftright with a per-band offset needs SQL (literal-only in the DSL)
    val banded = sigs.selectExpr("doc", "sig",
        "posexplode(transform(sequence(0, 3), b -> struct(b AS band, shiftright(sig, b * 16) & 65535 AS block)))")
      .select(col("doc"), col("sig"),
        col("col.band").as("band"), col("col.block").as("block"))
    // shuffle-hash-pinned, b side builds: both sides are the same
    // checkpointed stage output, whose reported size differs in-memory
    // vs spilled — under sf1 memory pressure AQE's build-side choice
    // flipped run-to-run (the pipeline_curate class, caught by the
    // sweep's fingerprint compare)
    banded.as("a").join(banded.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.block") === col("b.block") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id1"), col("b.doc").as("id2"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id1"), col("id2"))
  }

  /** All-pairs hamming over an existing signature table (caller gates). */
  private def simhashBruteFrom(sigs: DataFrame, maxHamming: Int): DataFrame =
    // broadcast-pinned build side: the non-equi pair join is a nested
    // loop either way (guard-sized input); pinning stops AQE's
    // build-side coin flip on the checkpointed sigs
    sigs.as("a").join(sigs.as("b").hint("broadcast"), col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id1"), col("b.doc").as("id2"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id1"), col("id2"))

  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashBandedFrom(simhashSignatures(df, idCol, textCol), maxHamming)

  /**
   * Brute-force SimHash pairs — all-pairs hamming over the signatures,
   * no banding. The EXACT anchor `simhashPairs` is provably equal to
   * (pigeonhole: hamming ≤ 3 over 4 blocks forces one intact block);
   * the registry's self-check joins the two and asserts set equality.
   * ScaleGuard-gated: the signature table is narrow (id + one long),
   * but the pair space is still O(n²).
   */
  def simhashBrutePairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashBruteFrom(simhashSignatures(
      ScaleGuard.allPairs(df, "simhash_brute (exact anchor)", "dedup_simhash"),
      idCol, textCol), maxHamming)

  /**
   * Banded and brute pair sets from ONE materialized signature table —
   * the registry self-check runs both, and the 64 aggregate columns
   * behind the signature are the expensive part, not the joins: at 10×
   * bench SF computing them twice was over half the query. The guard
   * counts the CHECKPOINTED frame, so it does not re-execute the
   * signature pipeline (see ScaleGuard's derived-input note).
   */
  def simhashPairsBoth(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): (DataFrame, DataFrame) = {
    val sigs = ScaleGuard.allPairs(
      materialize(simhashSignatures(df, idCol, textCol)),
      "simhash_brute (exact anchor)", "dedup_simhash")
    (simhashBandedFrom(sigs, maxHamming), simhashBruteFrom(sigs, maxHamming))
  }

  /**
   * Embedding-cosine near-dup pairs ≥ threshold (exact). This is the
   * *verify* stage of near-dup detection: at scale, candidates come
   * from `Similarity.hyperplaneCode` buckets first (see `ann_lsh`);
   * the exact all-pairs form below is used where the corpus fits a
   * shuffle (and by the oracle at test SF).
   */
  /**
   * Blocked embedding near-dup — the 100 TB path: random-hyperplane
   * codes (16 bits) banded 4×4; candidate pairs share at least one
   * band value; exact cosine verifies. Recall is tunable via
   * bands/planes; the all-pairs `embeddingNearDupPairs` is the oracle
   * for what this approximates.
   */
  def embeddingNearDupLsh(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, bands: Int = 16, planesPerBand: Int = 4,
      maxBucketRows: Int = 1024): DataFrame = {
    import graft.functions.VectorFunctions.dotd
    val vecs = df.select(col(idCol).as("id"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dotd(col("v"), col("v"))))
    val coded = vecs.select(col("id"),
      Similarity.hyperplaneCode(col("v"), dim, bands * planesPerBand).as("code"))
    // candidate generation is NARROW (id, code, band, bucket) longs —
    // `bandedHalfPairs` emits each unordered pair exactly once (first-
    // colliding-band, no distinct) and salts dense buckets; the
    // vectors are fetched by equi-join once per UNIQUE pair, so each
    // surviving pair's cosine is computed exactly once
    val cands = Similarity.bandedHalfPairs(coded, bands, planesPerBand,
      maxBucketRows)
    cands
      .join(vecs.as("va"), col("id1") === col("va.id"))
      .join(vecs.as("vb"), col("id2") === col("vb.id"))
      .select(col("id1"), col("id2"),
        round(dotd(col("va.v"), col("vb.v")) / (col("va.nrm") * col("vb.nrm")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  /**
   * Connected components over an undirected edge list. Two paths,
   * picked by measured edge count:
   *  - at or under `spark.graft.cc.localMaxEdges` (default 1M ≈ 16 MB
   *    — broadcast-relation order): driver-side union-find, zero
   *    additional Spark jobs;
   *  - above: alternating large-star / small-star (the MapReduce CC
   *    algorithm: Kiveris et al., "Connected Components in MapReduce
   *    and Beyond"). Converges in O(log² n) rounds; every round is two
   *    keyed shuffles — no driver-side graph, no assumption a
   *    component fits anywhere. `localCheckpoint` truncates lineage
   *    each round so the plan doesn't grow with iteration count.
   * Both return (node, component) where component = min node id in the
   * component; only nodes that appear in an edge are returned
   * (isolated nodes are their own component by definition — callers
   * left-join). OperatorSpec proves both paths agree with each other
   * and with a reference union-find on random graphs.
   */
  /** Edge sets at or under this size (conf
    * `spark.graft.cc.localMaxEdges`) are solved driver-side with
    * union-find instead of iterating: with the primitive-array
    * structures below, 1M edges cost ~50 MB resident (plus a
    * transient ~100 B/edge for the collected Rows) — broadcast-
    * relation order, which Spark already ships to the driver without
    * ceremony. Near-dup edge sets are SMALL even when the corpus is
    * not (they're the duplicates); the iterative path is unchanged
    * and takes over above the threshold. -1 disables the local
    * path. */
  val CcLocalMaxEdgesKey = "spark.graft.cc.localMaxEdges"
  val CcLocalMaxEdgesDefault = 1000000L

  /**
   * Driver-side union-find over PRIMITIVE arrays — node ids are sorted
   * into a `long[]` and the forest lives in an `int[]` over indices, so
   * resident memory is ~16·E + 12·N bytes (1M edges ≈ 50 MB), not the
   * several hundred MB a boxed Map[Long,Long] + Set costs at the same
   * threshold. (The `collect()` that feeds this still boxes Rows
   * transiently — freed as soon as they're copied into the arrays.)
   * Ids are sorted ascending, so min-index root = min-id root.
   */
  private def unionFindComponents(us: Array[Long], vs: Array[Long])
      : (Array[Long], Array[Int]) = {
    val ids = java.util.Arrays.copyOf(us, us.length + vs.length)
    System.arraycopy(vs, 0, ids, us.length, vs.length)
    java.util.Arrays.sort(ids)
    var n = 0
    for (i <- ids.indices)
      if (i == 0 || ids(i) != ids(i - 1)) { ids(n) = ids(i); n += 1 }
    val nodes = java.util.Arrays.copyOf(ids, n)
    val parent = Array.tabulate(n)(identity)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) } // path halving
      x
    }
    var e = 0
    while (e < us.length) {
      val ra = find(java.util.Arrays.binarySearch(nodes, us(e)))
      val rb = find(java.util.Arrays.binarySearch(nodes, vs(e)))
      // min index wins the root so component = min node id
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      e += 1
    }
    var i = 0
    while (i < n) { parent(i) = find(i); i += 1 }
    (nodes, parent)
  }

  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    // directed larger→smaller, self-loops dropped
    var edges = pairs.select(
        greatest(col(aCol), col(bCol)).cast("long").as("u"),
        least(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    edges = materializeLoop(edges)
    // convergence = identical edge SET; (count, hash-xor) is a one-job
    // order-independent set signature, vs two full except() shuffles.
    // XOR, not sum: ANSI mode makes a long hash-sum overflow fatal.
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var lastSig = signature(edges)
    // model-parameter-sized graphs: solve on the driver (O(E α) — the
    // signature job above already priced the count, so this branch
    // costs zero extra Spark jobs before the answer)
    val spark0 = pairs.sparkSession
    val localMax = Budget.long(spark0, Budget.CcLocalMaxEdges,
      CcLocalMaxEdgesDefault, legacyKey = Some(CcLocalMaxEdgesKey))
    if (localMax >= 0L && lastSig._1 <= localMax) {
      val collected = edges.collect()
      val us = new Array[Long](collected.length)
      val vs = new Array[Long](collected.length)
      var i = 0
      while (i < collected.length) {
        us(i) = collected(i).getLong(0); vs(i) = collected(i).getLong(1); i += 1
      }
      val (nodes, roots) = unionFindComponents(us, vs)
      import spark0.implicits._
      return nodes.indices.map(j => (nodes(j), nodes(roots(j))))
        .toDF("node", "component")
    }
    // size the loop's shuffles to the edge count, not the session
    // default: each round is several keyed shuffles over a set that's
    // usually FAR smaller than the corpus (near-dup pairs), and a
    // tiny round on 32 partitions is pure scheduling overhead. At
    // scale the count grows and this becomes the session default
    // again — same sized-to-data principle as the streaming state
    // partitions. Scoped set/restore: plans capture the conf at
    // action time, and every loop action happens inside the loop.
    val spark = pairs.sparkSession
    val defaultParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val loopParts = math.min(defaultParts,
      math.max(4, (lastSig._1 / 100000L).toInt + 1))
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    try {
    var done = false
    var iter = 0
    while (!done && iter < maxIter) {
      // large-star: every neighbor larger than u links to min(Γ(u)∪{u})
      val nbrs = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMin = nbrs.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      // no distinct here: duplicate (v,m) rows are absorbed by the
      // small-star aggregates below — saves a shuffle per iteration
      val ls = nbrs.join(lsMin, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // small-star: all (smaller) neighbors + u itself link to the min
      val ssMin = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
      val ssRows = ls.join(ssMin, "u")
      // lazy checkpoint: the signature job below both computes the
      // iteration AND persists it — one job per round, not two
      val ss = materializeLoop(ssRows.filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssRows.select(col("u"), col("m").as("v")))
        .distinct(), eager = false)
      val sig = signature(ss)
      done = sig == lastSig
      lastSig = sig
      edges = ss
      iter += 1
    }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    // fixpoint is a star per component: u → component min, plus the min itself
    edges.select(col("u").as("node"), col("v").as("component"))
      .union(edges.select(col("v").as("node"), col("v").as("component")))
      .distinct()
  }

  /**
   * Cross-document duplicated-window coverage — substring-granular
   * dedup statistics in the style of "train-data dedup at the span
   * level": a length-`k` word window is DUPLICATED when its exact text
   * occurs in at least two distinct documents, and a word is COVERED
   * when any duplicated window contains it. Doc-level dedup (exact /
   * minhash / simhash above) misses boilerplate spans pasted into
   * otherwise-unique documents; this operator measures exactly that
   * mass, per document, so a pipeline can drop or trim high-coverage
   * docs. Windows repeated only WITHIN one document are NOT counted —
   * that intra-doc signal is `Curation.repetitionScore`.
   *
   * Shape at 100 TB: the window table is the codegen'd posexplode +
   * lead() chain shingleHashes uses (k−1 leads over the doc-keyed
   * window — one shuffle by doc), windows travel as xxhash64 longs,
   * and duplicated-window detection is ONE keyed aggregation on the
   * window hash (count_distinct doc, partial-aggregated map-side).
   * The join back is pinned shuffle-hash: the duplicated-window set is
   * vocabulary-sized (unbounded at corpus scale, never
   * broadcast-honest), and it arrives already partitioned by `s` from
   * its own aggregation. Coverage is a doc-keyed count-distinct over
   * the ≤k-expanded duplicated positions. No all-pairs stage anywhere.
   *
   * @return one row per doc: n_words, n_windows, dup_windows (window
   *         positions whose text is cross-doc duplicated),
   *         covered_words (distinct word positions under any
   *         duplicated window), retained_words, dup_ratio
   */
  def dupWindowStats(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"window length must be >= 2, got $k")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("pos"))
    val wordTable = df.select(col(idCol).as("doc"),
      posexplode(words(col(textCol))).as(Seq("pos", "w")))
    val withLeads = wordTable.select(col("doc") +: col("pos") +:
      col("w").as("w0") +:
      (1 until k).map(j => lead(col("w"), j).over(byDoc).as(s"w$j")): _*)
    val wins = withLeads
      .filter(col(s"w${k - 1}").isNotNull)
      .select(col("doc"), col("pos"),
        xxhash64(concat_ws(" ", (0 until k).map(j => col(s"w$j")): _*)).as("s"))
    // windows seen in >= 2 distinct docs; count_distinct partial-dedups
    // (s, doc) map-side before the count
    val dupW = wins.groupBy(col("s"))
      .agg(count_distinct(col("doc")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("s"))
    val dupPos = wins.join(dupW.hint("shuffle_hash"), "s")
    // coverage stats WITHOUT multi-distinct aggregates: two
    // count_distincts in one agg go through RewriteDistinctAggregates,
    // whose Expand/gid assignment permutes across sessions (a genuine
    // run-to-run plan flip, the profile_table class from r6). Instead:
    // dedupe (doc, covered-position) keeping multiplicity — every
    // window contributes exactly k position rows, so dup_windows is
    // the row total div k, and covered_words is the group count. Two
    // plain hash aggregates, map-side partials, deterministic plan.
    val perDoc = dupPos
      .select(col("doc"), explode(sequence(col("pos"), col("pos") + (k - 1))).as("p"))
      .groupBy(col("doc"), col("p")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("covered_words"), sum(col("c")).as("_tot"))
      .select(col("doc"), expr(s"_tot div $k").as("dup_windows"),
        col("covered_words"))
    df.select(col(idCol).as("doc"),
        size(words(col(textCol))).cast("long").as("n_words"))
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("n_words"),
        greatest(col("n_words") - (k - 1), lit(0L)).as("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("covered_words"), lit(0L)).as("covered_words"))
      .withColumn("retained_words", col("n_words") - col("covered_words"))
      .withColumn("dup_ratio",
        round(when(col("n_words") === 0, lit(0.0))
          .otherwise(col("covered_words") / col("n_words").cast("double")), 6))
      .orderBy(col(idCol))
  }

  /**
   * Cross-document duplicated-span TRIM — the operator real pipelines
   * run after `dupWindowStats` measures boilerplate mass: drop every
   * word position covered by a cross-doc duplicated window and emit
   * the RESIDUAL document. Same duplicated-window definition as
   * dupWindowStats (length-k word window whose exact text occurs in
   * ≥2 distinct docs); the retained text is the surviving words in
   * original order, space-joined over the `words()` normalization
   * (lowercased, whitespace-split) — span offsets stay exact because
   * trimming operates on word positions, never on raw character
   * ranges.
   *
   * Scale shape: identical to dupWindowStats up to the covered-
   * position set (codegen'd window table, one keyed agg on the window
   * hash, pinned shuffle-hash join back); reassembly is ONE doc-keyed
   * aggregate whose per-row state is document-bounded (collect_list
   * of (pos, word) structs, order restored by array_sort — collection
   * order never matters, so the plan is partitioning-independent).
   * No stage holds more than one document's words in a row.
   */
  def dupWindowTrim(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"window length must be >= 2, got $k")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("pos"))
    val wordTable = materialize(df.select(col(idCol).as("doc"),
      posexplode(words(col(textCol))).as(Seq("pos", "w"))))
    val withLeads = wordTable.select(col("doc") +: col("pos") +:
      col("w").as("w0") +:
      (1 until k).map(j => lead(col("w"), j).over(byDoc).as(s"w$j")): _*)
    val wins = withLeads
      .filter(col(s"w${k - 1}").isNotNull)
      .select(col("doc"), col("pos"),
        xxhash64(concat_ws(" ", (0 until k).map(j => col(s"w$j")): _*)).as("s"))
    val dupW = wins.groupBy(col("s"))
      .agg(count_distinct(col("doc")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("s"))
    val covered = wins.join(dupW.hint("shuffle_hash"), "s")
      .select(col("doc"), explode(sequence(col("pos"), col("pos") + (k - 1))).as("pos"))
      .distinct()
    val residual = wordTable
      .join(covered, Seq("doc", "pos"), "left_anti")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("retained_words"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("retained_text"))
    df.select(col(idCol).as("doc"),
        size(words(col(textCol))).cast("long").as("n_words"))
      .join(residual, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("n_words"),
        coalesce(col("retained_words"), lit(0L)).as("retained_words"),
        (col("n_words") - coalesce(col("retained_words"), lit(0L)))
          .as("covered_words"),
        coalesce(col("retained_text"), lit("")).as("retained_text"))
      .orderBy(col(idCol))
  }

  /**
   * EXACT SUBSTRING dedup at arbitrary alignment — the Lee et al. 2022
   * ("Deduplicating Training Data Makes Language Models Better",
   * ExactSubstr) operator: remove every occurrence EXCEPT THE FIRST of
   * any repeated token span of length >= n, wherever it repeats —
   * across documents or WITHIN one — and emit the residual document.
   *
   * This closes the two gaps [[dupWindowTrim]] (its fixed-k sibling)
   * leaves open: that operator only counts a window duplicated when it
   * appears in >= 2 DISTINCT docs (a span repeated twice inside one
   * document is invisible), and it drops covered positions from EVERY
   * occurrence — the shared text vanishes from the corpus entirely
   * instead of surviving once. Here the globally-first occurrence (min
   * (doc, pos) in lexicographic order — the deterministic stand-in for
   * corpus order) keeps its text; all later occurrences are trimmed.
   *
   * WHY NO SUFFIX ARRAY: the reference technique builds a corpus
   * suffix array and scans adjacent suffixes for LCP >= n — the right
   * shape for one machine and one big mmap. The same semantics reduce
   * exactly to an n-gram equality join, which is the Spark-native
   * shape: a span of length L >= n repeats iff each of its L-n+1
   * token n-grams repeats, so (covered positions) = (union of
   * [s, s+n) over every non-first duplicated n-gram occurrence s),
   * position for position what adjacent-suffix LCP >= n marks. No
   * global suffix ordering, no order-statistics machinery — one
   * map-side-combinable aggregate on the gram hash does it.
   *
   * Scale shape (corpus tokens T):
   *  - gram table: ONE window over (doc, pos) builds the n leads;
   *    every step codegen'd; grams are 64-bit-hashed immediately so
   *    the shuffle carries (doc, pos, long), never n-word strings.
   *  - first-occurrence marking: groupBy(gram) with min(struct)+count
   *    — partial aggregation map-side-combines, so a boilerplate gram
   *    occurring 10⁶ times costs its row count, never a buffered
   *    window partition (the skew class a PARTITION BY gram window
   *    would re-introduce). Only grams with count >= 2 survive to the
   *    join back (dup grams are rare in a mostly-clean corpus), and
   *    the join is shuffle-hash-pinned.
   *  - coverage: NOT the explode(sequence)+distinct n× row blow-up —
   *    a sliding rows-between window max over the dup-start flag
   *    marks covered tokens in one pass per doc partition.
   *  - reassembly: identical to dupWindowTrim (doc-keyed collect_list
   *    of (pos, word), order restored by array_sort — partitioning-
   *    independent, per-row state document-bounded).
   * Gram-hash collisions (~T²/2⁶⁵) can only OVER-trim a span and are
   * the same accepted odds every shingle pipeline here runs with.
   */
  def substringTrim(df: DataFrame, idCol: String, textCol: String,
      n: Int = 12): DataFrame = {
    require(n >= 2, s"minimum span length must be >= 2, got $n")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("pos"))
    val wordTable = materialize(df.select(col(idCol).as("doc"),
      posexplode(words(col(textCol))).as(Seq("pos", "w"))))
    val withLeads = wordTable.select(col("doc") +: col("pos") +:
      col("w").as("w0") +:
      (1 until n).map(j => lead(col("w"), j).over(byDoc).as(s"w$j")): _*)
    val grams = withLeads
      .filter(col(s"w${n - 1}").isNotNull)
      .select(col("doc"), col("pos"),
        xxhash64(concat_ws(" ", (0 until n).map(j => col(s"w$j")): _*)).as("g"))
    val firstOcc = grams.groupBy(col("g"))
      .agg(min(struct(col("doc"), col("pos"))).as("first"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("g"), col("first"))
    // every non-first occurrence of a duplicated gram starts a trimmed
    // span; (doc, pos) is unique in `grams` and `firstOcc` is unique
    // per gram, so the join multiplies nothing
    val dupStarts = grams.join(firstOcc.hint("shuffle_hash"), "g")
      .filter(struct(col("doc"), col("pos")) =!= col("first"))
      .select(col("doc"), col("pos"), lit(1).as("ds"))
    val covWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("pos"))
      .rowsBetween(-(n - 1), org.apache.spark.sql.expressions.Window.currentRow)
    val residual = wordTable
      .join(dupStarts.hint("shuffle_hash"), Seq("doc", "pos"), "left")
      .withColumn("cov", max(col("ds")).over(covWin))
      .filter(col("cov").isNull)
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("retained_words"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("retained_text"))
    df.select(col(idCol).as("doc"),
        size(words(col(textCol))).cast("long").as("n_words"))
      .join(residual, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("n_words"),
        coalesce(col("retained_words"), lit(0L)).as("retained_words"),
        (col("n_words") - coalesce(col("retained_words"), lit(0L)))
          .as("covered_words"),
        coalesce(col("retained_text"), lit("")).as("retained_text"))
      .orderBy(col(idCol))
  }

  /**
   * Persisted MinHash band index — the INCREMENTAL half of the dedup
   * story: at 100 TB you dedup each incoming batch against the
   * standing corpus without re-shingling the corpus, so the corpus'
   * banded signatures are materialized ONCE as a parquet layout the
   * probe can open selectively.
   *
   * Layout — two tables, because candidate generation and estimation
   * read different widths (the "narrow shuffles, payloads fetched by
   * join once" rule, applied to the index itself):
   *  - `path/bands`: one NARROW row per (doc, band, bucket),
   *    PARTITIONED BY (band, bucket_p) where bucket_p = bucket mod
   *    `bucketDirs` folds the 64-bit bucket space to a bounded
   *    directory count. A probe prunes at file-listing time to the
   *    batch's (band, bucket_p) pairs — at most bands × bucketDirs
   *    directories exist, so the literal predicate is
   *    model-parameter-sized no matter the corpus; the exact 64-bit
   *    bucket match happens inside the pruned scan.
   *  - `path/sigs`: the k-component signature array ONCE per doc,
   *    read only by the estimator's id-keyed fetch join.
   * The first cut stored the full signature on every band row — a
   * bands× (16×) payload blow-up that made a large-batch probe read
   * more bytes than re-shingling the corpus costs (IndexProbe
   * measured the probe LOSING 1.9× at a 100:1 corpus:batch ratio);
   * split, the band scan is a few bytes per row and the sig fetch is
   * one narrow column table.
   * The fan-out is SIZED TO THE CORPUS at create (see
   * [[autoBucketDirs]]) and persisted with the index (`_layout.txt`),
   * so probes/appends always fold with the modulus the directories
   * were laid out with; pass bucketDirs > 0 to pin it explicitly.
   * The fold changes only the pruning granularity, never candidates.
   */
  def minhashIndexWrite(df: DataFrame, idCol: String, textCol: String,
      path: String, n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      bucketDirs: Int = 0): Unit =
    writeIndexRows(df, idCol, textCol, path, n, bands, rowsPerBand,
      bucketDirs, org.apache.spark.sql.SaveMode.Overwrite)

  /**
   * APPEND a batch to a standing index — the write half of the
   * incremental loop (`minhashProbe` is the read half): growing the
   * corpus index by a day's batch must not rewrite the corpus, so the
   * batch's banded signatures are appended as NEW files into only the
   * (band, bucket_p) directories the batch touches. Pre-existing
   * files are never opened or rewritten (parquet append is purely
   * additive), and because the signature stream is a pure seeded
   * function of the text, probe-after-append is EXACTLY
   * probe-after-full-rebuild — the registry's `minhash_index_append`
   * proves that end to end and IndexAppendSpec pins the file-level
   * contract (untouched pre-existing files, batch-sized commit count).
   *
   * The (n, bands, rowsPerBand, bucketDirs) parameters MUST match the
   * ones the index was written with — same contract as `annProbe`'s
   * dim: a mismatch silently writes signatures no probe will find.
   * A production deploy compacts small appended files per directory
   * with `Layout.compactPartitioned` on its own cadence (the flat
   * `Layout.compact` would drop the (band, bucket_p) layout and break
   * probe pruning; IndexCompactSpec proves the partitioned variant
   * preserves probe results AND pruning).
   */
  def minhashIndexAppend(df: DataFrame, path: String, idCol: String,
      textCol: String, n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      bucketDirs: Int = 0): Unit =
    writeIndexRows(df, idCol, textCol, path, n, bands, rowsPerBand,
      bucketDirs, org.apache.spark.sql.SaveMode.Append)

  /** One (doc, sig) row per document — the k-component signature as
    * one array, same seeded xxhash64 stream as the in-memory paths. */
  private[operators] def minhashSigRows(df: DataFrame, idCol: String,
      textCol: String, n: Int, k: Int): DataFrame = {
    val sh = shingleHashes(df, idCol, textCol, n)
    sh.groupBy(col("doc"))
      .agg(min(xxhash64(lit(0), col("s"))).as("sig_0"),
        (1 until k).map(i => min(xxhash64(lit(i), col("s"))).as(s"sig_$i")): _*)
      .select(col("doc"), array((0 until k).map(i => col(s"sig_$i")): _*).as("sig"))
  }

  /** (doc, band, bucket, bucket_p) band rows derived from sig arrays —
    * the band hash folds the same seeded sig components the in-memory
    * paths use, read via element_at. `keepSig` carries the signature
    * along (batch-side probes only — corpus band rows stay narrow). */
  private[operators] def bandRowsOf(sigs: DataFrame, bands: Int, rowsPerBand: Int,
      bucketDirs: Int, keepSig: Boolean = false): DataFrame = {
    val keep = if (keepSig) Seq(col("doc"), col("sig")) else Seq(col("doc"))
    // bucketDirs <= 0 = "unresolved" (callers that never consume
    // bucket_p, e.g. the batch-internal pair join): fold to one value
    // rather than pmod-by-zero, which ANSI mode makes fatal
    val bd = math.max(bucketDirs, 1)
    sigs.select(keep :+
        posexplode(array((0 until bands).map { b =>
          xxhash64(lit(b) +: (0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1)): _*)
        }: _*)).as(Seq("band", "bucket")): _*)
      .withColumn("bucket_p", pmod(col("bucket"), lit(bd.toLong)))
  }

  private def sigsPath(path: String): String =
    path.stripSuffix("/") + "/sigs"
  private[operators] def bandsPath(path: String): String =
    path.stripSuffix("/") + "/bands"
  private[operators] def tombstonesPath(path: String): String =
    path.stripSuffix("/") + "/tombstones"
  private def layoutFilePath(path: String): String =
    path.stripSuffix("/") + "/_layout.txt"

  /** Pre-r11 indexes carry no layout file; they were all written with
    * this fan-out, so resolution falls back to it. */
  private val LegacyBucketDirs = 64
  private val MinBucketDirs = 4
  private val MaxBucketDirs = 1024

  /**
   * SCALE-ADAPTIVE bucket-directory fan-out (r11, guide §2/§6): the
   * fixed bucketDirs=64 default meant every index write — even a
   * 4-arrival streaming microbatch at test SF — created up to
   * 16 bands × 64 = 1024 directories each holding one ~1 KB file, and
   * every append staged+renamed+manifest-listed ~1024 files (measured:
   * the minhash-index registry family spent most of its bench wall in
   * file commits, not compute). The fan-out now derives from the
   * corpus size at CREATE — one directory slice per
   * `spark.graft.budget.indexDocsPerDir` (default 16 Ki) documents,
   * clamped to [4, 1024] — so a test-SF index writes 64 directories
   * while a 10⁹-doc corpus gets the full 16 Ki directories and with
   * them FINER probe pruning than the old constant ever gave. The
   * fold changes only pruning granularity and file layout, never
   * candidates or estimates (the join is on the full 64-bit bucket).
   */
  private[operators] def autoBucketDirs(
      spark: org.apache.spark.sql.SparkSession, nDocs: Long): Int = {
    val perDir = math.max(1L,
      Budget.long(spark, Budget.IndexDocsPerDir, 16384L))
    math.min(MaxBucketDirs.toLong, math.max(MinBucketDirs.toLong,
      (nDocs + perDir - 1) / perDir)).toInt
  }

  /** The chosen fan-out travels WITH the index (`_layout.txt` at the
    * root, written once at CREATE): probes and appends must fold
    * buckets with the modulus the directories were laid out with — a
    * mismatched modulus silently excludes live directories from the
    * probe's partition-pruning predicate (lost candidates, not just
    * lost pruning) — so the value is index metadata, not a call-site
    * parameter the caller has to keep in sync. */
  private def writeLayout(spark: org.apache.spark.sql.SparkSession,
      path: String, bucketDirs: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(layoutFilePath(path))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(s"bucketDirs=$bucketDirs\n".getBytes("UTF-8"))
    finally out.close()
  }

  private[operators] def readLayout(
      spark: org.apache.spark.sql.SparkSession, path: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(layoutFilePath(path))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      body.linesIterator.collectFirst {
        case l if l.startsWith("bucketDirs=") =>
          l.stripPrefix("bucketDirs=").trim.toInt
      }
    }
  }

  /** Layout file if present (any index written since r11), else the
    * explicit parameter, else the pre-r11 constant. */
  private def resolveBucketDirs(spark: org.apache.spark.sql.SparkSession,
      path: String, param: Int): Int =
    readLayout(spark, path).getOrElse(
      if (param > 0) param else LegacyBucketDirs)

  /**
   * DELETE documents from a standing index — the third CRUD leg of
   * the incremental story (`minhashIndexAppend` grows it, this
   * shrinks it) as a TOMBSTONE append: removing a day's expired or
   * retracted documents must not rewrite the corpus index, so the
   * deleted ids land as new files in a flat `tombstones` table and
   * every probe anti-joins its candidates against it. Deletion cost
   * is delete-sized, probe overhead is one keyed anti-join against a
   * delete-sized relation, and pre-existing index files are never
   * opened — the same additive-commit contract as append
   * (IndexDeleteSpec pins it file-by-file).
   *
   * Semantics: a tombstone masks the id ENTIRELY — including any
   * band/sig rows appended for that id later — so re-adding a
   * previously-deleted id requires [[minhashIndexVacuum]] first
   * (which physically drops masked rows and clears the tombstone
   * set). The registry's `minhash_index_delete` proves
   * probe-after-delete ≡ probe-after-rebuild-without-the-deleted,
   * estimator values included. The mechanism ([[IndexTombstones]]) is
   * shared with the ANN index family — encoding knows nothing about
   * deletion, so one tombstone table shape serves every index.
   */
  def minhashIndexDelete(ids: DataFrame, path: String,
      idCol: String): Unit =
    IndexTombstones.delete(ids, idCol, tombstonesPath(path))

  /**
   * VACUUM a standing index: physically drop every tombstone-masked
   * band/sig row and start a fresh (empty) tombstone set. Pairs with
   * [[minhashIndexDelete]] the way `Layout.compactPartitioned` pairs
   * with append — the owner runs it on their own cadence when the
   * masked fraction (or the tombstone table) has grown enough to be
   * worth a rewrite; probes are exact before AND after (the
   * tombstone mask and the physical drop are the same predicate).
   * Writes to a NEW root (same non-atomic-swap contract as compact).
   * The anti-joins are keyed on the doc id and the partitioned
   * rewrite reuses the pinned cluster-by-directory shape, so the
   * pass is one shuffle per table at full parallelism.
   */
  def minhashIndexVacuum(spark: org.apache.spark.sql.SparkSession,
      src: String, dest: String): Unit = {
    val tp = tombstonesPath(src)
    IndexTombstones.mask(IndexManifest.readTable(spark, src, "sigs"), "doc", tp)
      .write.mode("overwrite").parquet(sigsPath(dest))
    IndexTombstones.mask(IndexManifest.readTable(spark, src, "bands"), "doc", tp)
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("band"), col("bucket_p"))
      .write.mode("overwrite").partitionBy("band", "bucket_p")
      .parquet(bandsPath(dest))
    // the rewrite preserves bucket_p values (read from the src rows),
    // so the src fan-out is dest's physical layout — carry it over
    readLayout(spark, src).foreach(writeLayout(spark, dest, _))
    IndexManifest.snapshot(spark, dest, Seq("sigs", "bands"))
  }

  /**
   * Standing-index health report — the numbers the owner's VACUUM and
   * COMPACTION cadences run on: one row with live/masked document
   * counts, the masked fraction (compare against your rewrite
   * threshold before paying [[minhashIndexVacuum]]'s full rewrite),
   * and the band table's file-layout stats (files, directories,
   * bytes — the small-file signal `Layout.compactPartitioned`
   * consumes). Counts are one keyed pass over the (doc)-narrow sig
   * projection with a tombstone flag join; file stats are driver-side
   * LISTING metadata — the same listing a probe's planning walks,
   * bounded by the directory layout plus appended files, never
   * data-sized.
   */
  def minhashIndexStats(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val sigs = IndexManifest.readTable(spark, path, "sigs").select(col("doc"))
    val flagged = IndexTombstones.read(spark, tombstonesPath(path)) match {
      case Some(t) => sigs.join(
        // distinct across BATCHES: delete() dedups within a batch but
        // re-deleting an id appends a second tombstone row, and a
        // duplicated join key would multiply sig rows and inflate the
        // very counts the vacuum cadence trusts
        t.select(col("id").as("doc")).distinct().withColumn("dead", lit(1))
          .hint("shuffle_hash"),
        Seq("doc"), "left")
      case None => sigs.withColumn("dead", lit(null).cast("int"))
    }
    val files = graft.Scratch.parquetFiles(bandsPath(path))
    val dirs = files.keySet.map(f =>
      f.split("/").dropRight(1).mkString("/")).size
    flagged.agg(count(lit(1)).as("n_docs"),
        count(col("dead")).as("n_docs_masked"))
      .select(col("n_docs"), col("n_docs_masked"),
        round(col("n_docs_masked").cast("double") / col("n_docs"), 6)
          .as("masked_fraction"),
        lit(files.size.toLong).as("n_band_files"),
        lit(dirs.toLong).as("n_band_dirs"),
        lit(files.values.sum).as("band_bytes"))
  }

  private def writeIndexRows(df: DataFrame, idCol: String, textCol: String,
      path: String, n: Int, bands: Int, rowsPerBand: Int, bucketDirs: Int,
      mode: org.apache.spark.sql.SaveMode): Unit =
    writeIndexRowsFromSigs(
      minhashSigRows(df, idCol, textCol, n, bands * rowsPerBand),
      path, bands, rowsPerBand, bucketDirs, mode)

  private def writeIndexRowsFromSigs(sigRows: DataFrame, path: String,
      bands: Int, rowsPerBand: Int, bucketDirs: Int,
      mode: org.apache.spark.sql.SaveMode): Unit = {
    val spark = sigRows.sparkSession
    // fan-out: explicit param > 0 wins; else CREATE derives it from
    // the corpus size (autoBucketDirs) and APPEND reads the index's
    // persisted layout — physical directories are frozen at create
    val appendDirs =
      if (mode != org.apache.spark.sql.SaveMode.Overwrite)
        resolveBucketDirs(spark, path, bucketDirs)
      else 0
    // the sig write runs at full parallelism (a corpus-sized table must
    // never funnel through one task) and IS the materialization of the
    // expensive shingle+min pass: the band rows derive from reading it
    // back, so the pass runs once with no extra checkpoint. On APPEND
    // the read-back would see the whole standing table, so the
    // batch-sized sig relation checkpoints instead — batch-sized state,
    // the same class as the probe's (a no-op when the caller already
    // materialized, as minhashRound does).
    def writeBands(sigs: DataFrame, dest: String, dirs: Int): Unit =
      bandRowsOf(sigs, bands, rowsPerBand, dirs)
        // cluster rows by their target directory before the partitioned
        // write: otherwise EVERY shuffle partition writes a file into
        // every (band, bucket_p) directory it touches — up to
        // parallelism × bands × bucketDirs small files and as many
        // commit operations (measured 86s at the sf1 sweep, dominated
        // by file commits). Clustered, each directory gets the files of
        // the one task that owns it — for an append, that also bounds
        // the added-file count by the batch's touched-directory count.
        // The partition count is PINNED: the narrow (doc, band, bucket)
        // rows are small enough that AQE would coalesce an unpinned
        // repartition to ~1 task, serializing up to bands × bucketDirs
        // per-file opens/commits through it (measured 13s vs 1s at
        // sf0.1); file-write parallelism is bounded by task count, not
        // bytes, so the cluster-sized default stays right even when the
        // shuffle is tiny.
        .repartition(spark.sessionState.conf.numShufflePartitions,
          col("band"), col("bucket_p"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("band", "bucket_p").parquet(dest)
    if (mode == org.apache.spark.sql.SaveMode.Overwrite) {
      sigRows.write.mode(mode).parquet(sigsPath(path))
      val back = spark.read.parquet(sigsPath(path))
      // parquet metadata count — no data scan; deterministic per input
      val dirs =
        if (bucketDirs > 0) bucketDirs else autoBucketDirs(spark, back.count())
      writeLayout(spark, path, dirs)
      writeBands(back, bandsPath(path), dirs)
      IndexManifest.snapshot(spark, path, Seq("sigs", "bands"))
    } else {
      // APPEND goes through the crash-safe commit protocol: stage the
      // batch's files, move them into the live tree, then flip
      // visibility with ONE manifest commit — a crash anywhere before
      // that leaves every probe ≡ pre-append (IndexCommitSpec kills
      // the append at each boundary and proves it)
      val staging = IndexManifest.stagingRoot(path) + "/" +
        java.util.UUID.randomUUID().toString
      sigRows.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(staging + "/sigs")
      writeBands(materialize(sigRows), staging + "/bands", appendDirs)
      IndexManifest.commit(spark, path,
        IndexManifest.promoteStaged(spark, path, staging))
    }
  }

  /**
   * Probe the persisted index with a batch of new documents: shingle
   * and sign ONLY the batch, collect its distinct (band, bucket_p)
   * pairs (bounded by bands × bucketDirs — model-parameter-sized, the
   * same class as a centroid collect), prune the index scan to those
   * directories with a literal predicate, and equi-join on the full
   * 64-bit bucket. Every surviving (new, corpus) candidate carries
   * `est_jaccard` = fraction of agreeing signature components, so the
   * caller can threshold without touching corpus text.
   */
  def minhashProbe(newDocs: DataFrame, path: String, idCol: String,
      textCol: String, n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      bucketDirs: Int = 0): DataFrame =
    probeFromSigs(
      materialize(minhashSigRows(newDocs, idCol, textCol, n, k = bands * rowsPerBand)),
      path, bands, rowsPerBand, bucketDirs)

  /** [[minhashProbe]] from an already-materialized (doc, sig) batch
    * table — the seam that lets one signature pass feed probe, append
    * and the batch-internal pair join (see [[minhashRound]]). */
  private def probeFromSigs(batchSigs: DataFrame, path: String,
      bands: Int, rowsPerBand: Int, bucketDirs: Int): DataFrame = {
    val k = bands * rowsPerBand
    // the batch folds its buckets with the INDEX's persisted fan-out —
    // a probe-side modulus that differs from the directory layout
    // would exclude live directories from the pruning predicate
    val dirs = resolveBucketDirs(batchSigs.sparkSession, path, bucketDirs)
    // batch band rows CARRY the batch signature (batch-sized — the
    // asymmetry with the corpus side is the point: the corpus band
    // rows are narrow and its signatures arrive by one id-keyed fetch)
    val banded = bandRowsOf(batchSigs, bands, rowsPerBand, dirs,
      keepSig = true)
    // sorted: collect() order varies run-to-run, and an unsorted
    // literal predicate is a different plan TEXT each run — a false
    // "plan flip" under fingerprinting (and cache-unfriendly besides)
    val pairs = banded.select(col("band"), col("bucket_p")).distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted
    val byBand = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val pred = byBand.toSeq.sortBy(_._1).map { case (b, ps) =>
      col("band") === b && col("bucket_p").isin(ps: _*)
    }.reduceOption(_ || _).getOrElse(lit(false))
    val spark = batchSigs.sparkSession
    // manifest-gated listing: only COMMITTED index files are visible,
    // so a crashed (uncommitted) append can never leak candidates
    val idxBands = IndexManifest.readTable(spark, path, "bands").filter(pred)
    // candidate generation touches ONLY the narrow band rows (the
    // pruned scan carries doc + bucket, a few bytes per row); the
    // signature arrays enter once per surviving candidate via the
    // id-keyed fetch joins below.
    // shuffle-hash-pinned: at test SF both sides of the bucket join sit
    // near the broadcast threshold and an unhinted join lets AQE pick
    // the build side by stage-arrival order — a genuine run-to-run plan
    // flip (the dedup_components class). The hint is also the honest
    // 100 TB shape: both sides are data-sized, keyed on the bucket.
    val cand = banded.as("a")
      .join(idxBands.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.doc").as("new_id"), col("b.doc").as("corpus_id"),
        col("a.sig").as("a_sig"))
      .distinct()
    // tombstone mask (only when deletes have landed): candidates
    // against deleted corpus docs drop BEFORE their signatures are
    // fetched — one keyed anti-join against a delete-sized relation
    val live = IndexTombstones.mask(cand, "corpus_id", tombstonesPath(path))
    val corpusSigs = IndexManifest.readTable(spark, path, "sigs")
      .select(col("doc").as("corpus_id"), col("sig").as("b_sig"))
    live
      .join(corpusSigs.hint("shuffle_hash"), "corpus_id")
      // unrolled codegen'd agree-sum over the k components (the same
      // shape the in-memory path uses over its sig_i columns): the
      // aggregate(zip_with(...)) higher-order form is interpreted —
      // ~8× slower per row — and this projection runs once per
      // candidate pair
      .select(col("new_id"), col("corpus_id"),
        round((0 until k).map(i =>
            when(element_at(col("a_sig"), i + 1) ===
              element_at(col("b_sig"), i + 1), 1).otherwise(0))
          .reduce(_ + _).cast("double") / k, 6).as("est_jaccard"))
      .orderBy(col("new_id"), col("corpus_id"))
  }

  /** Banded pairs WITHIN a (doc, sig) table — `minhashLshPairs` from
    * already-computed signature arrays (identical candidates and
    * estimates: the band hash folds the same seeded components, the
    * estimator is the same agree-sum). Batch-sized inputs only — both
    * sides of the band join carry the signature array. */
  private def minhashPairsFromSigArrays(sigs: DataFrame, bands: Int,
      rowsPerBand: Int, bucketDirs: Int): DataFrame = {
    val k = bands * rowsPerBand
    val banded = bandRowsOf(sigs, bands, rowsPerBand, bucketDirs,
      keepSig = true)
    banded.as("a")
      .join(banded.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id1"), col("b.doc").as("id2"),
        col("a.sig").as("a_sig"), col("b.sig").as("b_sig"))
      .distinct()
      .select(col("id1"), col("id2"),
        round((0 until k).map(i =>
            when(element_at(col("a_sig"), i + 1) ===
              element_at(col("b_sig"), i + 1), 1).otherwise(0))
          .reduce(_ + _).cast("double") / k, 6).as("est_jaccard"))
  }

  /**
   * ONE incremental-dedup arrival against a standing index — the
   * per-batch round a streaming/daily pipeline runs, with the batch
   * shingled and signed exactly ONCE (running probe, batch-internal
   * join and append as separate calls costs three signature passes
   * over the same text; this is the fused form):
   *
   *  1. sign the batch (one pass, materialized batch-sized);
   *  2. batch↔corpus candidate pairs via the pruned index probe;
   *  3. batch-internal pairs via the banded self-join on the same
   *     signatures;
   *  4. append the batch's signatures into the index (created on the
   *     first arrival) for the next round.
   *
   * Returns the round's emitted near-dup pairs, canonicalized to
   * (id1 < id2, est_jaccard). Ordering contract: the probe freezes its
   * view of the index (file listing) at CONSTRUCTION, before the
   * append lands, so the returned plan never sees the batch's own
   * rows no matter when the caller executes it. The union over
   * arrivals of these pair sets EQUALS the one-shot `minhashLshPairs`
   * over everything ingested — the registry's `stream_dedup_index`
   * proves that end to end.
   */
  def minhashRound(batch: DataFrame, path: String, idCol: String,
      textCol: String, n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      bucketDirs: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    val batchSigs = materialize(
      minhashSigRows(batch, idCol, textCol, n, bands * rowsPerBand))
    val intra = minhashPairsFromSigArrays(batchSigs, bands, rowsPerBand,
      bucketDirs)
    val p = new org.apache.hadoop.fs.Path(bandsPath(path))
    val exists = p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    val emitted =
      if (exists)
        intra.unionByName(
          probeFromSigs(batchSigs, path, bands, rowsPerBand, bucketDirs)
            .select(least(col("new_id"), col("corpus_id")).as("id1"),
              greatest(col("new_id"), col("corpus_id")).as("id2"),
              col("est_jaccard")))
      else intra
    writeIndexRowsFromSigs(batchSigs, path, bands, rowsPerBand, bucketDirs,
      if (exists) org.apache.spark.sql.SaveMode.Append
      else org.apache.spark.sql.SaveMode.Overwrite)
    emitted
  }

  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.dotd
    val guarded = ScaleGuard.allPairs(df, "dedup_embedding (exact pair stage)",
      "dedup_embedding_lsh")
    val d = guarded.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("v"))
    val withNorm = d.withColumn("nrm", sqrt(dotd(col("v"), col("v"))))
    withNorm.as("a").join(withNorm.as("b"), col("a.id") < col("b.id"))
      .withColumn("cos", round(
        dotd(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("cos"))
      .orderBy(col("id1"), col("id2"))
  }
}
