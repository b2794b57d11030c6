package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: treat image/audio/video payloads as
 * opaque `binary` columns with a typed metadata struct, and run
 * feature extraction as a batched per-partition map (the Scala
 * analogue of Python's mapInPandas/mapInArrow — rows stream through an
 * iterator, the decoder touches one partition's batch at a time, and
 * nothing is collected to the driver).
 *
 * The actual media decode is STUBBED (no image/audio libraries in this
 * environment): `fakeDecode` derives deterministic pseudo-features
 * from the payload bytes. The Spark-side contract — schema, binary
 * payload handling, partition-parallel extraction, feature vector
 * shape — is real and tested; swap `fakeDecode` for a JNI/library call
 * to go live.
 */
object Multimodal {

  case class Asset(asset_id: Long, media_type: String, payload: Array[Byte],
      n_bytes: Long, width: Int, height: Int, part: Int)
  case class AssetFeatures(asset_id: Long, media_type: String, n_bytes: Long,
      checksum: Long, mean_byte_e4: Long, hist_e4: Array[Long])

  /**
   * First 32 md5 bits of `c` + "#salt" as a non-negative long — the
   * deterministic pseudo-metadata source. md5, not xxhash64, so the
   * DuckDB oracle derives bit-identical values (`'0x'||substr(md5(…))`
   * cast); at scale both are one codegen'd hash per row.
   */
  private def md5Int(c: Column, salt: Int): Column =
    conv(substring(md5(concat(c.cast("string"), lit(s"#$salt"))
      .cast("binary")), 1, 8), 16, 10).cast("long")

  /**
   * Build a typed asset manifest from any table with an id and a
   * payload-bearing string column (the testdata stand-in for real
   * media bytes). Metadata (dimensions) is derived deterministically;
   * `part` is the layout key a writer would partitionBy — co-locating
   * assets so a downstream decode stage reads aligned batches.
   */
  def manifest(df: DataFrame, idCol: String, payloadCol: String,
      nPartitions: Int = 32): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      when(pmod(md5Int(col(idCol), 0), lit(3)) === 0, "image")
        .when(pmod(md5Int(col(idCol), 0), lit(3)) === 1, "audio")
        .otherwise("video").as("media_type"),
      col(payloadCol).cast("binary").as("payload"),
      length(col(payloadCol)).cast("long").as("n_bytes"),
      (pmod(md5Int(col(idCol), 1), lit(1280)) + 32).cast("int").as("width"),
      (pmod(md5Int(col(idCol), 2), lit(720)) + 32).cast("int").as("height"),
      pmod(col(idCol), lit(nPartitions)).cast("int").as("part"))

  /** Deterministic stand-in for a real media decoder (???-site):
    * an FNV-1a fold + byte-sum + 8-bin byte histogram. Emits integer
    * counts so the derived features are integer-exact end-to-end (the
    * DuckDB oracle reproduces the same fold via a HUGEINT list_reduce,
    * the wrapping 64-bit multiply emulated mod 2⁶⁴). */
  private def fakeDecode(payload: Array[Byte]): (Long, Long, Array[Long]) = {
    var checksum = 1469598103934665603L // FNV-1a offset (stub variant)
    var sum = 0L
    val hist = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      checksum = (checksum ^ b) * 1099511628211L
      sum += b
      hist(b % 8) += 1L
      i += 1
    }
    (checksum, sum, hist)
  }

  /**
   * Batched per-partition feature extraction over a manifest.
   * `mapPartitions` keeps the decoder call amortized across a
   * partition's rows — the distributed shape of a vectorized UDF.
   * Derived features are ×10⁴ integer fixed-point (truncating
   * division), never floats: the decode is imperative host code, so
   * every emitted value must be reproducible bit-for-bit by an
   * independent implementation of the same spec.
   */
  def extractFeatures(spark: SparkSession, manifestDf: DataFrame): Dataset[AssetFeatures] = {
    import spark.implicits._
    manifestDf.as[Asset].mapPartitions { rows =>
      rows.map { a =>
        val (checksum, byteSum, hist) = fakeDecode(a.payload)
        val n = math.max(a.payload.length, 1)
        AssetFeatures(a.asset_id, a.media_type, a.n_bytes, checksum,
          byteSum * 10000L / n, hist.map(_ * 10000L / n))
      }
    }
  }

  /**
   * Frame sampling plumbing: one asset row fans out to its sampled
   * frames (every `stride`-th frame of `bytesPerFrame` bytes) with the
   * byte offset a real decoder would seek to. The explode is the
   * scalable shape — frames land in the same partition as their asset,
   * no shuffle — and the per-frame "feature" is the deterministic stub
   * standing in for the codec call.
   */
  def sampleFrames(manifestDf: DataFrame, bytesPerFrame: Int = 256,
      stride: Int = 2): DataFrame =
    manifestDf.filter(col("media_type") === "video")
      .withColumn("n_frames",
        greatest(ceil(col("n_bytes") / bytesPerFrame).cast("int"), lit(1)))
      .select(col("asset_id"), col("n_bytes"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .withColumn("byte_offset", col("frame_idx").cast("long") * bytesPerFrame)
      .withColumn("frame_hash",
        md5Int(concat(col("asset_id").cast("string"), lit("#f"),
          col("frame_idx").cast("string")), 0))
      .orderBy(col("asset_id"), col("frame_idx"))

  /**
   * Resize planning for image assets: aspect-preserving fit into a
   * target box (scale = min of the per-axis ratios, letterbox padding
   * on the short side). All the geometry a real resampler needs is
   * computed as integer-exact columns; the pixel resample itself is
   * the stub site (`resized_checksum` stands in for the output bytes).
   * Pure per-row projection — no shuffle, fully codegen'd, scales
   * linearly with asset count.
   */
  def resizePlan(manifestDf: DataFrame, targetW: Int = 224,
      targetH: Int = 224): DataFrame =
    manifestDf.filter(col("media_type") === "image")
      .withColumn("scale_num", least(lit(targetW) * col("height"), lit(targetH) * col("width")))
      .select(col("asset_id"), col("width"), col("height"),
        // out dims from the integer-exact min ratio: floor(dim * scale)
        expr("(width * scale_num) div (width * height)").cast("int").as("out_w"),
        expr("(height * scale_num) div (width * height)").cast("int").as("out_h"),
        col("scale_num"),
        md5(concat(col("payload").cast("string"),
          lit(s"#${targetW}x$targetH")).cast("binary")).as("resized_checksum"))
      .withColumn("pad_x", lit(targetW) - col("out_w"))
      .withColumn("pad_y", lit(targetH) - col("out_h"))
      .orderBy(col("asset_id"))

  /**
   * Perceptual NEAR-dup media dedup — the stage after [[mm_dedup]]'s
   * exact content addressing: re-encoded/lightly-edited copies share
   * no content hash but land within a few bits of each other under a
   * locality-sensitive perceptual hash. The hash here is a SimHash
   * over the payload's char 3-grams (the deterministic stand-in for a
   * real pHash over decoded pixels — same seam as `fakeDecode`, and
   * the banding/query machinery is decode-agnostic), built from md5
   * so the DuckDB oracle reproduces every bit and the registry check
   * is ROW-exact, not a recall flag (contrast `dedup_simhash`, whose
   * xxhash64 bits the oracle can't recompute).
   *
   * Candidate generation is pigeonhole-COMPLETE, not probabilistic:
   * the `bands` 16-bit bands cover the fingerprint, and two hashes
   * within Hamming distance τ <= bands-1 differ in at most τ bands,
   * so they MATCH on at least one — every qualifying pair is a
   * candidate by construction. Scale defenses (all EXACT — the pair
   * set never changes; MediaBandSpec proves equality to the naive
   * band join + distinct):
   *  - EAGER CANDIDATE BUDGET: Σ C(bucket,2) is computed from a
   *    narrow aggregate BEFORE the self-join is planned and the query
   *    refuses BY NAME over `spark.graft.budget.bandCandPairs` — the
   *    Triangles wedge-guard contract. Candidate volume is ~n²/2¹⁶
   *    per band, quadratic in asset count; at 10⁹ assets this join
   *    must not plan, it must explain itself (use the wide
   *    fingerprint, pre-bucket by exact hash, or raise the budget on
   *    a sized-for-it cluster).
   *  - DENSE-BUCKET SALTING: buckets above
   *    `spark.graft.budget.maxBucketRows` split into ⌈size/cap⌉ salt
   *    groups (probe keeps one, build replicates), so one degenerate
   *    bucket can't serialize the stage.
   *  - FIRST-COLLIDING-BAND dedup: each unordered pair materializes
   *    exactly once — in the lowest band where the fingerprints
   *    agree (branch-free SWAR on xor of the packed codes) — so the
   *    candidate-sized `distinct` shuffle disappears, and the
   *    Hamming verify runs off the codes the join rows already carry
   *    (no signature fetch join at all).
   *
   * For real scale prefer [[nearDupMediaWide]]: the same machinery on
   * a 128-bit fingerprint (8 bands), whose buckets are ~2³² sparser
   * for the same τ<=3 — candidate volume stays near-linear far longer
   * (measured in MediaProbe, SURVEY §6).
   */
  def nearDupMedia(manifestDf: DataFrame, tau: Int = 3): DataFrame =
    simhashNearDup(manifestDf, words = 4, tau = tau, op = "mm_dedup_near")

  /** 128-bit wide-fingerprint variant: 8 bands of 16 bits, pigeonhole-
    * complete for τ <= 7. Same oracle-reproducible md5 bit source
    * (full 32 hex chars), same defenses; the per-band bucket space is
    * identical (2¹⁶) but a band collision now conditions on 16 of 128
    * bits, so random (non-near-dup) collisions are vastly rarer and
    * candidate volume grows near-linearly where the 64-bit form has
    * gone quadratic (MediaProbe measures the growth sf0.1 → sf10). */
  def nearDupMediaWide(manifestDf: DataFrame, tau: Int = 7): DataFrame =
    simhashNearDup(manifestDf, words = 8, tau = tau, op = "mm_dedup_near_wide")

  /** SPARSE-bucket geometry: the same 128-bit fingerprint cut into 4
    * bands of 32 BITS, pigeonhole-complete for τ <= 3. This — not a
    * longer fingerprint at the same band width — is the candidate-
    * density cure: per-band collisions go from ~n²/2¹⁶ to ~n²/2³², so
    * random co-bucketing is negligible until ~10⁵ assets per salt
    * domain and candidate volume tracks the TRUE near-dup count
    * (MediaProbe measures all three geometries side by side, §6). */
  def nearDupMediaW32(manifestDf: DataFrame, tau: Int = 3): DataFrame =
    simhashNearDup(manifestDf, words = 8, tau = tau, op = "mm_dedup_near_w32",
      bandBits = 32)

  /** Materialized packed SimHash signatures: (id, c_0[, c_1]) — 4
    * 16-bit md5 words per long. Shared by the dedup path and
    * MediaProbe's candidate-volume measurement. */
  private def simhashSig(manifestDf: DataFrame, bands: Int): DataFrame = {
    val bitsPerBand = 16
    require(bands == 4 || bands == 8, "fingerprint is 64-bit (4 words) or 128-bit (8)")
    val nV = bands / 4
    // per-gram feature bits: ONE md5 per gram, its hex parsed as
    // SIGNED 64-bit words — one conv(…, 16, -10) per 16 hex chars
    // (r11: the previous per-16-bit-word substring+conv chain ran 4-8
    // string parses per gram; bit j of word b is bit 16·(3 − b%4) + j
    // of v_{b/4}, so the same bits arrive in 1-2 parses)
    val grams = manifestDf
      .select(col("asset_id"), col("payload").cast("string").as("p"))
      .select(col("asset_id"), explode(expr(
        "transform(sequence(1, greatest(length(p) - 2, 1)), i -> substring(p, i, 3))"))
        .as("ng"))
      .withColumn("hex", md5(col("ng").cast("binary")))
      .select(col("asset_id") +:
        (0 until nV).map(k =>
          conv(substring(col("hex"), k * 16 + 1, 16), 16, -10)
            .cast("long").as(s"v_$k")): _*)
    // the SimHash majority vote, SWAR-packed (r11): each aggregate
    // long carries TWO 32-bit one-bit counters — bit (b, j) in the low
    // lane, (b, j+8) in the high — so the doc-keyed aggregate updates
    // bands×8 branch-free buffer slots per gram instead of bands×16
    // conditional ±1 sums (measured 2.4× on this stage at sf0.1; still
    // map-side-partial). The vote is unchanged bit for bit: the old
    // ±1 sum was sv = 2·c1 − n_grams, and sv >= 0 (ties to 1) ⟺
    // 2·c1 >= n_grams. Lane capacity: overflow needs ≈ 2³¹ grams in
    // one document, i.e. a payload within a hair of the engine-wide
    // 2³¹-char string cap — and under ANSI a longer sum would be a
    // loud error, never a silent wrong fingerprint.
    def bitAt(b: Int, j: Int) =
      shiftright(col(s"v_${b / 4}"), 16 * (3 - b % 4) + j).bitwiseAND(lit(1L))
    val sCols = for (b <- 0 until bands; j <- 0 until bitsPerBand / 2) yield
      sum(bitAt(b, j).bitwiseOR(shiftleft(bitAt(b, j + 8), 32))).as(s"sw_${b}_$j")
    val sums = grams.groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_g"), sCols: _*)
    // one-bit count for (b, j): low or high lane of its packed sum
    // (lanes are non-negative, so the arithmetic shift is exact)
    def ones(b: Int, j: Int): Column =
      if (j < bitsPerBand / 2) col(s"sw_${b}_$j").bitwiseAND(lit(0xFFFFFFFFL))
      else shiftright(col(s"sw_${b}_${j - bitsPerBand / 2}"), 32)
    val nCodes = bands / 4
    // bands packed 4-per-long: the join rows carry the whole
    // fingerprint as 1-2 longs, so first-band dedup and the Hamming
    // verify are pure bit math on columns already in flight
    Dedup.materialize(sums.select(col("asset_id").as("id") +:
      (0 until nCodes).map(k => (0 until 4).map(i => (0 until bitsPerBand).map(j =>
          when(ones(4 * k + i, j) * 2 >= col("n_g"),
            lit((1L << j) << (16 * i))).otherwise(lit(0L)))
        .reduce(_ + _)).reduce(_ + _).as(s"c_$k")): _*))
  }

  /** One row per (id, band, bucket) plus the packed codes: bands are
    * `bandBits`-wide segments of the packed longs (16-bit = one md5
    * word per band; 32-bit = two — the sparse-bucket geometry). */
  private def bandedOf(sig: DataFrame, nCodes: Int, bandBits: Int): DataFrame = {
    val perCode = 64 / bandBits
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val seg = (k: Int, i: Int) =>
      shiftright(col(s"c_$k"), bandBits * i).bitwiseAND(lit(mask))
    sig.select(col("id") +: (0 until nCodes).map(k => col(s"c_$k")) :+
      posexplode(array((for (k <- 0 until nCodes; i <- 0 until perCode)
        yield seg(k, i)): _*)).as(Seq("band", "bucket")): _*)
  }

  /** The eager guard's own candidate arithmetic, exposed for the
    * MediaProbe measurement: Σ C(bucket size, 2) over (band, bucket)
    * at the given fingerprint geometry — exactly the pair volume the
    * band self-join would face. */
  def bandedCandidatePairs(manifestDf: DataFrame, words: Int,
      bandBits: Int = 16): Long =
    bandedOf(simhashSig(manifestDf, words), words / 4, bandBits)
      .groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bsz"))
      .agg(coalesce(sum(expr("bsz * (bsz - 1) div 2")), lit(0L)))
      .head().getLong(0)

  private def simhashNearDup(manifestDf: DataFrame, words: Int, tau: Int,
      op: String, bandBits: Int = 16): DataFrame = {
    require(bandBits == 16 || bandBits == 32, "bands are 16- or 32-bit")
    val bands = words * 16 / bandBits
    require(tau <= bands - 1,
      s"$op: pigeonhole completeness needs tau <= bands-1 (= ${bands - 1}), got $tau")
    val nCodes = words / 4
    val perCode = 64 / bandBits
    val sig = simhashSig(manifestDf, words)
    val banded = bandedOf(sig, nCodes, bandBits)
    val spark = manifestDf.sparkSession
    // EAGER budget guard — priced off one narrow aggregate over the
    // materialized signatures, before the quadratic join is planned
    val budget = Budget.long(spark, Budget.BandCandPairs, 2000000000L)
    val sizes = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bsz"))
    if (budget >= 0L) {
      val candPairs = sizes
        .agg(coalesce(sum(expr("bsz * (bsz - 1) div 2")), lit(0L)))
        .head().getLong(0)
      require(candPairs <= budget,
        s"$op: $candPairs banded candidate pairs exceed " +
          s"spark.graft.budget.bandCandPairs=$budget — use the sparse " +
          "32-bit-band geometry (nearDupMediaW32), pre-split by exact " +
          "content hash, or raise the budget on a cluster sized for " +
          "the join")
    }
    val cap = Budget.int(spark, Budget.MaxBucketRows, 1024)
    val withG = banded.join(
      broadcast(sizes.select(col("band"), col("bucket"),
        greatest(lit(1L), ceil(col("bsz") / lit(cap))).cast("int").as("g"))),
      Seq("band", "bucket"))
    // dense buckets split across ⌈size/cap⌉ salt groups: probe keeps
    // one group per row, build replicates — same pairs, spread tasks.
    // The explicit partition count survives AQE coalescing (the banded
    // rows are bytes-tiny but carry quadratic downstream work — every
    // size heuristic misjudges this join; cf. Similarity.bandedHalfPairs)
    val par = spark.sparkContext.defaultParallelism
    val probe = withG.withColumn("salt",
        pmod(xxhash64(col("id"), col("band")), col("g")).cast("int"))
      .repartition(par, col("band"), col("bucket"), col("salt"))
    val build = withG.withColumn("salt",
      explode(sequence(lit(0), col("g") - 1)))
    // first-colliding-band: fold each bandBits-wide xor segment onto
    // its low bit (SWAR), invert+mask → one set bit per agreeing band;
    // the pair is emitted only where a.band is the LOWEST such band
    val lsbMask = (0 until perCode).map(i => 1L << (bandBits * i)).reduce(_ | _)
    def collidingMask(k: Int): Column = {
      val x = col(s"a.c_$k").bitwiseXOR(col(s"b.c_$k"))
      val folded = (0 until bandBits).map(j => shiftright(x, j))
        .reduce(_ bitwiseOR _).bitwiseAND(lit(lsbMask))
      bitwise_not(folded).bitwiseAND(lit(lsbMask))
    }
    def lowestRank(m: Column): Column =
      (bit_count(m.bitwiseAND(-m) - lit(1L)) / lit(bandBits)).cast("int")
    val firstBand =
      if (nCodes == 1) lowestRank(collidingMask(0))
      else when(collidingMask(0) =!= 0L, lowestRank(collidingMask(0)))
        .otherwise(lit(perCode) + lowestRank(collidingMask(1)))
    val hamming = (0 until nCodes).map(k =>
        bit_count(col(s"a.c_$k").bitwiseXOR(col(s"b.c_$k"))))
      .reduce(_ + _).cast("long")
    probe.as("a").join(build.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.salt") === col("b.salt") && col("a.id") < col("b.id"))
      .filter(col("a.band") === firstBand)
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        hamming.as("hamming"))
      .filter(col("hamming") <= tau)
      .orderBy(col("id1"), col("id2"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_dedup_near" -> ((s, d) =>
      nearDupMedia(manifest(graft.Tables.documents(s, d), "doc_id", "text"))),
    "mm_dedup_near_wide" -> ((s, d) =>
      nearDupMediaWide(manifest(graft.Tables.documents(s, d), "doc_id", "text"))),
    "mm_dedup_near_w32" -> ((s, d) =>
      nearDupMediaW32(manifest(graft.Tables.documents(s, d), "doc_id", "text"))),
    "mm_resize" -> ((s, d) =>
      resizePlan(manifest(graft.Tables.documents(s, d), "doc_id", "text"))),
    "mm_frames" -> ((s, d) =>
      sampleFrames(manifest(graft.Tables.documents(s, d), "doc_id", "text"))),
    "mm_manifest" -> ((s, d) =>
      manifest(graft.Tables.documents(s, d), "doc_id", "text")
        .drop("payload") // binary payload stays in the pipeline; dropped only for the dump
        .orderBy(col("asset_id"))),
    "mm_features" -> ((s, d) => {
      val feats = extractFeatures(s, manifest(graft.Tables.documents(s, d), "doc_id", "text"))
      feats.toDF()
        .select(col("asset_id"), col("media_type"), col("n_bytes"),
          col("checksum"), col("mean_byte_e4"),
          element_at(col("hist_e4"), 1).as("f0_e4"),
          element_at(col("hist_e4"), 8).as("f7_e4"))
        .orderBy(col("asset_id"))
    }),
    // content-addressed exact media dedup — the first stage every
    // multimodal pipeline runs (identical payload bytes ⇒ one stored
    // asset): hash the payload IN THE SCAN, then one window shuffle on
    // the content hash; the binary column is pruned before the
    // exchange (only the hash and metadata travel), so at 100 TB of
    // media the shuffle is metadata-sized
    "mm_dedup" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("content_hash"))
      manifest(graft.Tables.documents(s, d), "doc_id", "text")
        .withColumn("content_hash", md5(col("payload")))
        .withColumn("n_copies", count(lit(1)).over(w))
        .withColumn("keep", col("asset_id") === min(col("asset_id")).over(w))
        .select(col("asset_id"), col("media_type"), col("content_hash"),
          col("n_copies"), col("keep"))
        .orderBy(col("asset_id"))
    }))

  // DuckDB mirror of the md5-derived pseudo-metadata.
  private val Md5IntSql = (s: String) =>
    s"CAST(('0x' || substr(md5($s), 1, 8)) AS BIGINT)"

  def oracleSql: Map[String, String] = Map(
    // bit-exact mirror of the md5 SimHash + pigeonhole band join:
    // same grams, same 16-bit words, same ±1 majority vote with ties
    // to 1, same band candidates, same bit_count(xor) verify
    "mm_dedup_near" ->
      """WITH p AS (SELECT doc_id AS asset_id, text AS pl FROM documents),
        |g AS (SELECT asset_id, substr(pl, i, 3) AS ng
        |      FROM p, unnest(range(1, greatest(length(pl) - 2, 1) + 1)) t(i)),
        |hx AS (SELECT asset_id, substr(md5(ng), 1, 16) AS hex FROM g),
        |w AS (SELECT asset_id, b, ('0x' || substr(hex, b * 4 + 1, 4))::BIGINT AS wv
        |      FROM hx, unnest(range(0, 4)) tb(b)),
        |s AS (SELECT asset_id, b, j,
        |        sum(CASE WHEN (wv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS sv
        |      FROM w, unnest(range(0, 16)) tj(j) GROUP BY 1, 2, 3),
        |bv AS (SELECT asset_id, b,
        |        CAST(sum(CASE WHEN sv >= 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS bvv
        |       FROM s GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.asset_id AS id1, b2.asset_id AS id2
        |         FROM bv a JOIN bv b2 ON a.b = b2.b AND a.bvv = b2.bvv
        |           AND a.asset_id < b2.asset_id),
        |d AS (SELECT id1, id2,
        |        CAST(sum(bit_count(xor(x.bvv, y.bvv))) AS BIGINT) AS hamming
        |      FROM cand JOIN bv x ON x.asset_id = id1
        |        JOIN bv y ON y.asset_id = id2 AND y.b = x.b
        |      GROUP BY 1, 2)
        |SELECT id1, id2, hamming FROM d WHERE hamming <= 3
        |ORDER BY id1, id2""".stripMargin,
    // wide (128-bit) sibling: all 32 md5 hex chars -> 8 bands of 16
    // bits, tau = 7; same vote, same candidates, same verify
    "mm_dedup_near_wide" ->
      """WITH p AS (SELECT doc_id AS asset_id, text AS pl FROM documents),
        |g AS (SELECT asset_id, substr(pl, i, 3) AS ng
        |      FROM p, unnest(range(1, greatest(length(pl) - 2, 1) + 1)) t(i)),
        |hx AS (SELECT asset_id, md5(ng) AS hex FROM g),
        |w AS (SELECT asset_id, b, ('0x' || substr(hex, b * 4 + 1, 4))::BIGINT AS wv
        |      FROM hx, unnest(range(0, 8)) tb(b)),
        |s AS (SELECT asset_id, b, j,
        |        sum(CASE WHEN (wv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS sv
        |      FROM w, unnest(range(0, 16)) tj(j) GROUP BY 1, 2, 3),
        |bv AS (SELECT asset_id, b,
        |        CAST(sum(CASE WHEN sv >= 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS bvv
        |       FROM s GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.asset_id AS id1, b2.asset_id AS id2
        |         FROM bv a JOIN bv b2 ON a.b = b2.b AND a.bvv = b2.bvv
        |           AND a.asset_id < b2.asset_id),
        |d AS (SELECT id1, id2,
        |        CAST(sum(bit_count(xor(x.bvv, y.bvv))) AS BIGINT) AS hamming
        |      FROM cand JOIN bv x ON x.asset_id = id1
        |        JOIN bv y ON y.asset_id = id2 AND y.b = x.b
        |      GROUP BY 1, 2)
        |SELECT id1, id2, hamming FROM d WHERE hamming <= 7
        |ORDER BY id1, id2""".stripMargin,
    // sparse-geometry sibling: same 128-bit fingerprint, 4 bands of
    // 32 bits (two adjacent 16-bit words, low word first — matching
    // the packed-long layout), tau = 3
    "mm_dedup_near_w32" ->
      """WITH p AS (SELECT doc_id AS asset_id, text AS pl FROM documents),
        |g AS (SELECT asset_id, substr(pl, i, 3) AS ng
        |      FROM p, unnest(range(1, greatest(length(pl) - 2, 1) + 1)) t(i)),
        |hx AS (SELECT asset_id, md5(ng) AS hex FROM g),
        |w AS (SELECT asset_id, b, ('0x' || substr(hex, b * 4 + 1, 4))::BIGINT AS wv
        |      FROM hx, unnest(range(0, 8)) tb(b)),
        |s AS (SELECT asset_id, b, j,
        |        sum(CASE WHEN (wv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS sv
        |      FROM w, unnest(range(0, 16)) tj(j) GROUP BY 1, 2, 3),
        |bv AS (SELECT asset_id, b,
        |        CAST(sum(CASE WHEN sv >= 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS bvv
        |       FROM s GROUP BY 1, 2),
        |b32 AS (SELECT lo.asset_id, lo.b // 2 AS b2,
        |          lo.bvv + hi.bvv * 65536 AS v32
        |        FROM bv lo JOIN bv hi ON lo.asset_id = hi.asset_id
        |          AND hi.b = lo.b + 1 WHERE lo.b % 2 = 0),
        |cand AS (SELECT DISTINCT a.asset_id AS id1, c.asset_id AS id2
        |         FROM b32 a JOIN b32 c ON a.b2 = c.b2 AND a.v32 = c.v32
        |           AND a.asset_id < c.asset_id),
        |d AS (SELECT id1, id2,
        |        CAST(sum(bit_count(xor(x.bvv, y.bvv))) AS BIGINT) AS hamming
        |      FROM cand JOIN bv x ON x.asset_id = id1
        |        JOIN bv y ON y.asset_id = id2 AND y.b = x.b
        |      GROUP BY 1, 2)
        |SELECT id1, id2, hamming FROM d WHERE hamming <= 3
        |ORDER BY id1, id2""".stripMargin,
    // The decoder stub runs as imperative JVM code inside mapPartitions
    // — so its oracle re-implements the SAME byte-level spec in pure
    // SQL: the FNV-1a fold as a HUGEINT list_reduce with the wrapping
    // 64-bit multiply emulated mod 2⁶⁴ (payload text is ASCII in the
    // testdata, so ord(char) = UTF-8 byte), then mapped back to the
    // signed BIGINT the JVM's overflowing long arithmetic produces.
    "mm_features" ->
      s"""WITH m AS (SELECT doc_id AS asset_id, text,
         |  ${Md5IntSql("doc_id::VARCHAR || '#0'")} % 3 AS t,
         |  length(text) AS n_bytes FROM documents
         |  -- this oracle equates codepoints (ord/length) with UTF-8
         |  -- bytes (what the JVM folds); a non-ASCII document breaks
         |  -- that silently, so fail LOUDLY instead of hash-mismatching.
         |  -- CASE (not OR) because only CASE guarantees short-circuit.
         |  WHERE CASE WHEN strlen(text) = length(text) THEN TRUE
         |    ELSE error('mm_features oracle requires ASCII text; non-ASCII doc_id=' || doc_id) END),
         |b AS (SELECT asset_id, t, n_bytes,
         |  list_transform(range(1, length(text) + 1),
         |    i -> ord(text[i])::HUGEINT) AS bytes FROM m),
         |f AS (SELECT asset_id, t, n_bytes,
         |  list_reduce(list_prepend(1469598103934665603::HUGEINT, bytes),
         |    (acc, x) -> (xor(acc, x) * 1099511628211) % 18446744073709551616::HUGEINT) AS cks,
         |  list_sum(bytes) AS bsum,
         |  len(list_filter(bytes, x -> x % 8 = 0)) AS h0,
         |  len(list_filter(bytes, x -> x % 8 = 7)) AS h7
         | FROM b)
         |SELECT asset_id,
         | CASE WHEN t = 0 THEN 'image' WHEN t = 1 THEN 'audio'
         |      ELSE 'video' END AS media_type,
         | n_bytes,
         | CAST(CASE WHEN cks >= 9223372036854775808::HUGEINT
         |      THEN cks - 18446744073709551616::HUGEINT ELSE cks END AS BIGINT) AS checksum,
         | CAST(coalesce(bsum, 0) * 10000 // greatest(n_bytes, 1) AS BIGINT) AS mean_byte_e4,
         | CAST(h0 * 10000 // greatest(n_bytes, 1) AS BIGINT) AS f0_e4,
         | CAST(h7 * 10000 // greatest(n_bytes, 1) AS BIGINT) AS f7_e4
         |FROM f ORDER BY asset_id""".stripMargin,
    "mm_manifest" ->
      s"""WITH m AS (SELECT doc_id,
         |  ${Md5IntSql("doc_id::VARCHAR || '#0'")} % 3 AS t,
         |  ${Md5IntSql("doc_id::VARCHAR || '#1'")} % 1280 + 32 AS w,
         |  ${Md5IntSql("doc_id::VARCHAR || '#2'")} % 720 + 32 AS h,
         |  length(text) AS n_bytes, doc_id % 32 AS part
         | FROM documents)
         |SELECT doc_id AS asset_id,
         | CASE WHEN t = 0 THEN 'image' WHEN t = 1 THEN 'audio'
         |      ELSE 'video' END AS media_type,
         | n_bytes, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         | CAST(part AS INTEGER) AS part
         |FROM m ORDER BY asset_id""".stripMargin,
    // md5 of the payload string ≡ md5 of the binary cast — DuckDB
    // hashes the same bytes
    "mm_dedup" ->
      s"""WITH m AS (SELECT doc_id AS asset_id,
         |  ${Md5IntSql("doc_id::VARCHAR || '#0'")} % 3 AS t,
         |  md5(text) AS content_hash
         | FROM documents)
         |SELECT asset_id,
         | CASE WHEN t = 0 THEN 'image' WHEN t = 1 THEN 'audio'
         |      ELSE 'video' END AS media_type,
         | content_hash,
         | count(*) OVER (PARTITION BY content_hash) AS n_copies,
         | asset_id = min(asset_id) OVER (PARTITION BY content_hash) AS keep
         |FROM m ORDER BY asset_id""".stripMargin,
    "mm_frames" ->
      s"""WITH m AS (SELECT doc_id AS asset_id, length(text) AS n_bytes,
         |  ${Md5IntSql("doc_id::VARCHAR || '#0'")} % 3 AS t
         | FROM documents),
         |v AS (SELECT asset_id, n_bytes,
         |  CAST(greatest(CAST(ceil(n_bytes / 256.0) AS INTEGER), 1) AS INTEGER) AS n_frames
         | FROM m WHERE t >= 2)
         |SELECT asset_id, n_bytes, n_frames, CAST(i AS INTEGER) AS frame_idx,
         | i * 256 AS byte_offset,
         | ${Md5IntSql("asset_id::VARCHAR || '#f' || i::VARCHAR || '#0'")} AS frame_hash
         |FROM v, unnest(range(0, n_frames, 2)) s(i)
         |ORDER BY asset_id, frame_idx""".stripMargin,
    "mm_resize" ->
      s"""WITH m AS (SELECT doc_id AS asset_id, text,
         |  ${Md5IntSql("doc_id::VARCHAR || '#0'")} % 3 AS t,
         |  CAST(${Md5IntSql("doc_id::VARCHAR || '#1'")} % 1280 + 32 AS INTEGER) AS width,
         |  CAST(${Md5IntSql("doc_id::VARCHAR || '#2'")} % 720 + 32 AS INTEGER) AS height
         | FROM documents),
         |i AS (SELECT *, CAST(least(224 * height, 224 * width) AS INTEGER) AS scale_num
         |      FROM m WHERE t = 0)
         |SELECT asset_id, width, height,
         | CAST((width * scale_num) // (width * height) AS INTEGER) AS out_w,
         | CAST((height * scale_num) // (width * height) AS INTEGER) AS out_h,
         | scale_num,
         | md5(text || '#224x224') AS resized_checksum,
         | 224 - CAST((width * scale_num) // (width * height) AS INTEGER) AS pad_x,
         | 224 - CAST((height * scale_num) // (width * height) AS INTEGER) AS pad_y
         |FROM i ORDER BY asset_id""".stripMargin)
}
