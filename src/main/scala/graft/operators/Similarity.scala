package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Scale design: brute-force cosine is the correctness baseline — one
 * scan, no shuffle, fully codegen'd column math (zip_with/aggregate),
 * top-k via orderBy+limit which Spark executes as a per-partition
 * TakeOrdered then a driver merge of k·numPartitions rows, never a full
 * sort. The LSH path prunes with a 16-bit random-hyperplane code so the
 * full dot product only runs on candidates; at cluster scale the codes
 * become the bucketing/partition key so a query touches only its
 * bucket's partitions.
 */
object Similarity {

  import graft.functions.VectorFunctions.dotd

  /** Cast to double and attach the L2 norm. */
  private def withNorm(df: DataFrame, idCols: Seq[String], vecCol: String): DataFrame =
    df.select(idCols.map(col) :+ transform(col(vecCol), _.cast("double")).as("v"): _*)
      .withColumn("nrm", sqrt(dotd(col("v"), col("v"))))

  private def dot(a: Column, b: Column): Column = dotd(a, b)

  /**
   * Exact top-k by cosine against the embedding of `queryId`.
   * The query vector rides along as a broadcast nested-loop join of a
   * 1-row relation — no shuffle of the corpus.
   */
  def knnBrute(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, extraCols: Seq[String] = Nil): DataFrame = {
    val corpus = withNorm(df, idCol +: extraCols, vecCol)
    val query = withNorm(df.filter(col(idCol) === queryId), Seq(idCol), vecCol)
      .select(col("v").as("qv"), col("nrm").as("qnrm"))
    corpus.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(query))
      .withColumn("cos", round(dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6))
      .select((idCol +: extraCols).map(col) :+ col("cos"): _*)
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * Exact k-NN JOIN: every item gets its top-k cosine neighbors. The
   * symmetric pair matrix is computed as half-pairs (id1 < id2, n²/2
   * codegen'd dot products) then mirrored — cosine is symmetric, so
   * the expensive math runs once per unordered pair. This is the
   * correctness baseline the blocked variants (`annLsh`, hyperplane
   * bands) approximate; at corpus scale candidates come from those
   * buckets and only the within-bucket pairs take this path.
   */
  def knnJoin(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val d = withNorm(ScaleGuard.allPairs(df, "knn_join", "knn_join_blocked"),
        Seq(idCol), vecCol)
      .select(col(idCol).as("id"), col("v"), col("nrm"))
    val half = d.as("a").join(d.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("src_id"), col("b.id").as("nbr_id"),
        round(dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
    val sym = half.union(half.select(col("nbr_id"), col("src_id"), col("cos")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src_id")).orderBy(col("cos").desc, col("nbr_id"))
    sym.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("src_id"), col("rk"))
  }

  /**
   * Candidate half-pairs (id1 < id2) sharing at least one hyperplane
   * band bucket, from a coded table of (id, code) — the shared
   * candidate stage of `knnJoinBlocked` and
   * `Dedup.embeddingNearDupLsh`. Two scale defenses over the naive
   * band self-join + distinct, both EXACT (the pair set is identical
   * to the naive form's — no recall change):
   *
   *  1. FIRST-COLLIDING-BAND dedup: a pair sharing m band buckets is
   *     generated m times by the naive join and needs a
   *     candidate-sized distinct shuffle to collapse — on a dup-dense
   *     corpus (every LSH bucket maximally dense, the exact workload
   *     dedup exists for) that shuffle approaches the all-pairs count
   *     and was the measured sf1 bottleneck. Both join sides carry
   *     their full code, so the join emits a pair ONLY in the lowest
   *     band where the codes' segments agree: each unordered pair
   *     materializes exactly once, map-side, and the distinct
   *     disappears. The lowest agreeing band falls out of branch-free
   *     bit math on xor(codeA, codeB) (SWAR zero-segment detect, then
   *     lowest-set-bit rank via bit_count) — fully codegen'd longs.
   *  2. DENSE-BUCKET SALTING (`maxBucketRows`): within-bucket work is
   *     quadratic in bucket size and a hash join gives one task the
   *     whole bucket, so a single degenerate bucket serializes the
   *     stage. Buckets above the cap are split into
   *     g = ⌈size/cap⌉ salt groups — probe side keeps one group per
   *     row, build side replicates g ways (the `Salt.saltedJoin`
   *     replication scheme applied to a self-join) — the same pairs
   *     emerge, spread over g tasks. Bucket sizes come from one
   *     narrow aggregation, broadcast back (bands × 2^planes rows).
   *     Unlike dropping rows over the cap, salting costs no recall.
   */
  private[operators] def bandedHalfPairs(coded: DataFrame,
      bands: Int, planesPerBand: Int, maxBucketRows: Int = 1024): DataFrame = {
    val p = planesPerBand
    require(bands * p <= 64, s"bands*planesPerBand must fit a long code")
    require(maxBucketRows > 0, "maxBucketRows must be positive")
    val mask = (1L << p) - 1
    val banded = coded.select(col("id"), col("code"),
      posexplode(array((0 until bands).map { b =>
        shiftright(col("code"), b * p).bitwiseAND(lit(mask))
      }: _*)).as(Seq("band", "bucket")))
    val sizes = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bsz"))
      .select(col("band"), col("bucket"),
        greatest(lit(1L), ceil(col("bsz") / lit(maxBucketRows))).cast("int").as("g"))
    val withG = banded.join(broadcast(sizes), Seq("band", "bucket"))
    // PIN the probe side's parallelism by the join keys, with an
    // explicit partition count: the banded rows are bytes-tiny but
    // each carries quadratic downstream work, so every size-based
    // planner heuristic misjudges this join — AQE broadcasts the
    // build side (it IS small), making join parallelism the PROBE
    // side's inherited partitioning, i.e. the raw input's file count
    // (a guard-sized corpus = one parquet file → the 200M-pair
    // candidate stage observed running on 2 of 32 cores at sf1); and
    // an un-numbered repartition would be coalesced right back by
    // AQE's advisory size (15 MB of keys → 1 partition). A
    // user-numbered repartition survives AQE, and (band, bucket,
    // salt) hashing spreads salted dense buckets across tasks.
    val par = coded.sparkSession.sparkContext.defaultParallelism
    val probe = withG.withColumn("salt",
        pmod(xxhash64(col("id"), col("band")), col("g")).cast("int"))
      .repartition(par, col("band"), col("bucket"), col("salt"))
    val build = withG.withColumn("salt",
      explode(sequence(lit(0), col("g") - 1)))
    // first-colliding-band: segment i of xor == 0 iff the pair shares
    // band i's bucket. OR-fold each p-bit segment onto its low bit
    // (SWAR), invert+mask → set bit per colliding band, isolate the
    // lowest set bit, rank it with bit_count. The joined band is
    // guaranteed to collide, so the lowest-set-bit rank is well-defined.
    val lsbMask = (0 until bands).map(i => 1L << (i * p)).reduce(_ | _)
    val x = col("a.code").bitwiseXOR(col("b.code"))
    val folded = (0 until p).map(j => shiftright(x, j)).reduce(_ bitwiseOR _)
      .bitwiseAND(lit(lsbMask))
    val colliding = bitwise_not(folded).bitwiseAND(lit(lsbMask))
    val lowest = colliding.bitwiseAND(-colliding)
    val firstBand = (bit_count(lowest - lit(1L)) / lit(p)).cast("int")
    probe.as("a").join(build.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.salt") === col("b.salt") && col("a.id") < col("b.id"))
      .filter(col("a.band") === firstBand)
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
  }

  /**
   * Blocked k-NN JOIN — the 100 TB sibling of `knnJoin`: candidates
   * come from shared hyperplane-band buckets (`bandedHalfPairs` — the
   * same banding `Dedup.embeddingNearDupLsh` uses, with its
   * first-band dedup and dense-bucket salting), so no nested loop
   * ever sees the full corpus. Exact cosine runs only within buckets;
   * per-item top-k over the candidate set. Approximate by
   * construction (recall tunable via bands × planesPerBand — more
   * bands = more candidate buckets per item); `knnJoin` is its exact
   * oracle, and the recall spec pins the floor at test SF.
   *
   * SIZE `planesPerBand` TO THE CORPUS — `bandGeometry(n)` computes
   * it (2^p ≳ n / bucket target, remaining code budget on bands) and
   * `expectedRecall(cos, bands, planes)` checks the recall side;
   * `maxBucketRows` salting keeps dense buckets parallel, but
   * candidate COUNT still grows with bucket size². Measured at sf1
   * (SURVEY §6 r6): corpus-sized 8×8 runs 0.05× of the exact join
   * with recall 1.0; the test-SF 16×4 admits ~64% of all pairs and
   * manages only 0.76×.
   */
  def knnJoinBlocked(df: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int, bands: Int = 16, planesPerBand: Int = 4,
      maxBucketRows: Int = 1024): DataFrame = {
    val vecs = withNorm(df, Seq(idCol), vecCol)
      .select(col(idCol).as("id"), col("v"), col("nrm"))
    val coded = vecs.select(col("id"),
      hyperplaneCode(col("v"), dim, bands * planesPerBand).as("code"))
    // candidate generation is NARROW (id, code, band, bucket) longs —
    // vectors are fetched by equi-join once per unique half-pair
    // (id1 < id2), so each unordered pair's dot product is computed
    // exactly once, then mirrored
    val cands = bandedHalfPairs(coded, bands, planesPerBand, maxBucketRows)
    val half = cands
      .join(vecs.as("va"), col("id1") === col("va.id"))
      .join(vecs.as("vb"), col("id2") === col("vb.id"))
      .select(col("id1").as("src_id"), col("id2").as("nbr_id"),
        round(dot(col("va.v"), col("vb.v")) / (col("va.nrm") * col("vb.nrm")), 6).as("cos"))
    val sym = half.union(half.select(
      col("nbr_id").as("src_id"), col("src_id").as("nbr_id"), col("cos")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src_id")).orderBy(col("cos").desc, col("nbr_id"))
    sym.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("src_id"), col("rk"))
  }

  /**
   * Per-label centroid vectors as (label, dim, mean) rows: posexplode
   * to dimension granularity, one keyed aggregation. The row form IS
   * the scalable layout — a group-avg of array columns would need the
   * whole group's vectors co-resident; this shape is partial-agg
   * friendly and shuffles (label, dim)-keyed scalars.
   */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .withColumn("dim", col("dim").cast("long"))
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("x").cast("double")), 6).as("mean"),
        count(lit(1)).as("n_vectors"))
      .orderBy(col("label"), col("dim"))

  /**
   * Centroid-approximation silhouette — the standard "are these
   * clusters real?" screen over a labeled embedding table, with the
   * O(n²) pairwise terms replaced by distances to label centroids
   * (the simplified silhouette of Hruschka et al.; exact silhouette
   * is quadratic and never runs at corpus scale): per point,
   * a = cosine distance to its own label's centroid, b = the nearest
   * OTHER centroid's distance, s = (b − a)/max(a, b). Output is one
   * row per label: member count and mean silhouette — near 1 means
   * tight/separated, near 0 means overlapping labels.
   *
   * Scale shape: centroids are label-count-sized model parameters —
   * they aggregate in one keyed pass ([[labelCentroids]]) and re-enter
   * the plan as literal arrays, so scoring is a single scan with k
   * codegen'd dot products per row, no join, no second shuffle. The
   * collect is k·dim doubles, never data-sized. Determinism: the
   * centroid means are rounded (6 dp) before re-entering, per-point
   * cosines round at 6 (the cross-engine contract every cosine in
   * this registry uses), and the final means round at 4 to absorb
   * sum-order ulps.
   */
  def centroidSilhouette(df: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    val spark = df.sparkSession
    // label-count-sized model parameters (same class as ivfProbe's
    // centroid load): (label, dim) -> rounded mean
    val cents = labelCentroids(df, labelCol, vecCol).collect()
      .map(r => (r.getInt(0), r.getLong(1).toInt, r.getDouble(2)))
      .groupBy(_._1).map { case (l, rows) =>
        l -> rows.sortBy(_._2).map(_._3)
      }.toSeq.sortBy(_._1)
    require(cents.size >= 2, "silhouette needs at least two labels")
    def cnrm(c: Array[Double]): Double = math.sqrt(c.map(x => x * x).sum)
    val scored = df.select(col(labelCol).as("label"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dotd(col("v"), col("v"))))
    // one rounded cosine-distance column per centroid, codegen'd
    val dists = cents.map { case (l, c) =>
      l -> (lit(1.0) - round(
        dotd(col("v"), array(c.map(lit): _*)) / (col("nrm") * lit(cnrm(c))),
        6))
    }
    val aCol = dists.foldLeft(lit(null).cast("double")) { case (acc, (l, d)) =>
      when(col("label") === l, d).otherwise(acc)
    }
    val bCol = least(dists.map { case (l, d) =>
      when(col("label") === l, lit(null).cast("double")).otherwise(d)
    }: _*)
    scored
      .withColumn("a", aCol).withColumn("b", bCol)
      .withColumn("s",
        when(greatest(col("a"), col("b")) === 0, lit(0.0))
          .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_members"),
        round(avg(col("s")), 4).as("mean_silhouette"))
      .orderBy(col("label"))
  }

  /**
   * nPlanes-bit random-hyperplane code: bit p = sign(v · plane_p).
   * Planes are pseudo-random but deterministic (seeded), generated
   * driver-side — model parameters, not data. Computed by the native
   * codegen'd `HyperplaneCodeD` (one pass over the vector for all
   * bits); the interpreted aggregate/zip_with formulation of the same
   * math was ~8× slower and re-inlined the upstream cast per plane.
   */
  def hyperplaneCode(vecCol: Column, dim: Int, nPlanes: Int = 16,
      seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val planes = Array.fill(nPlanes, dim)(rng.nextGaussian())
    graft.functions.VectorFunctions.hyperplaneCode(vecCol, planes)
  }

  /**
   * IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
   * vector to a centroid; a query probes only the `nProbe` nearest
   * centroids' lists and runs exact cosine there. The centroid set is
   * the model (driver-held, tiny); the corpus stays distributed. This
   * in-memory form is the registry's correctness artifact — the
   * production path is `ivfIndexWrite`/`ivfProbe`, which fits the
   * quantizer once, persists the corpus partitioned by `cluster`, and
   * prunes probes to the probed clusters' directories.
   */
  def ivfAnn(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nCentroids: Int = 16, nProbe: Int = 2,
      extraCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val corpus = withNorm(df, idCol +: extraCols, vecCol)
      .withColumn("fv", array_to_vector(col("v")))
    val model = new KMeans().setK(nCentroids).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cluster")
      .fit(corpus.select(col("fv")))
    val assigned = model.transform(corpus)

    // model parameters + the single query vector: driver-side by design
    val qv = corpus.filter(col(idCol) === queryId)
      .select(col("v")).head().getSeq[Double](0).toArray
    val qnrm = math.sqrt(qv.map(x => x * x).sum)
    def cosTo(c: Array[Double]): Double = {
      val d = c.zip(qv).map { case (a, b) => a * b }.sum
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) -1 else d / (n * qnrm)
    }
    val probes = model.clusterCenters.map(_.toArray).zipWithIndex
      .sortBy { case (c, _) => -cosTo(c) }.take(nProbe).map(_._2)

    val qvCol = array(qv.map(lit): _*)
    assigned
      .filter(col("cluster").isin(probes.map(Integer.valueOf): _*) && col(idCol) =!= queryId)
      .withColumn("cos", round(dot(col("v"), qvCol) / (col("nrm") * lit(qnrm)), 6))
      .select((idCol +: extraCols).map(col) :+ col("cluster") :+ col("cos"): _*)
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * ANN top-k, band-bucketed: the corpus is exploded into (band,
   * bucket) rows from a bands×planesPerBand hyperplane code; candidates
   * are vectors sharing at least one band value with the query (an
   * equi-join against the query's `bands` broadcast rows), then exact
   * cosine on candidates only. At cluster scale the (band, bucket) key
   * IS the partition/bucketing key, so a query reads only its buckets'
   * partitions — the earlier scan-and-filter (hamming ≤ t over every
   * row's code) still touched the whole corpus per query.
   */
  def annLsh(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, dim: Int,
      bands: Int = 16, planesPerBand: Int = 4,
      extraCols: Seq[String] = Nil): DataFrame = {
    val coded = withNorm(df, idCol +: extraCols, vecCol)
      .withColumn("code", hyperplaneCode(col("v"), dim, bands * planesPerBand))
    val banded = coded.select(
      (idCol +: extraCols).map(col) ++ Seq(col("v"), col("nrm"),
        posexplode(array((0 until bands).map { b =>
          shiftright(col("code"), b * planesPerBand)
            .bitwiseAND(lit((1 << planesPerBand) - 1))
        }: _*)).as(Seq("band", "bucket"))): _*)
    val query = banded.filter(col(idCol) === queryId)
      .select(col("band"), col("bucket"),
        col("v").as("qv"), col("nrm").as("qnrm"))
    banded.filter(col(idCol) =!= queryId)
      .join(broadcast(query), Seq("band", "bucket"))
      .select((idCol +: extraCols).map(col) :+
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6).as("cos"): _*)
      .distinct()
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * Materialized IVF index — the claim in `ivfAnn`'s doc ("at scale
   * written partitioned by cluster") made physical, the way
   * `annIndexWrite` did for the banded ANN. The KMeans coarse
   * quantizer is fit ONCE at build time; the corpus is written
   * PARTITIONED BY its cluster assignment, and the centroid matrix
   * (model parameters — nCentroids × dim doubles) is persisted next
   * to the index as its own small parquet. A probe then needs no
   * KMeans fit and no full scan: it ranks centroids driver-side and
   * reads only the probed clusters' directories (partition pruning at
   * file-listing level — IvfIndexSpec pins PartitionFilters and the
   * numFiles scan metric).
   */
  def ivfIndexWrite(df: DataFrame, idCol: String, vecCol: String,
      path: String, nCentroids: Int = 16, seed: Long = 42L,
      extraCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val corpus = withNorm(df, idCol +: extraCols, vecCol)
    val model = new KMeans().setK(nCentroids).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cluster")
      .fit(corpus.select(array_to_vector(col("v")).as("fv")))
    val centers = model.clusterCenters.map(_.toArray)
    // assignment goes through the SAME deterministic expression the
    // append path uses (assignCluster), not model.transform: an
    // appended vector must land in exactly the cluster a build-time
    // assignment would have given it, and two codegen'd evaluations
    // of one expression are bit-identical where two independent
    // distance implementations need not be. IvfIndexSpec's parity
    // check against the in-memory `ivfAnn` (which DOES use
    // model.transform) pins that the expression reproduces MLlib's
    // assignment semantics on real data.
    ivfWriteAssigned(corpus, centers, path,
      org.apache.spark.sql.SaveMode.Overwrite)
    // centroids: model parameters, one row per (cluster, dim, value)
    val spark = df.sparkSession
    import spark.implicits._
    centers.zipWithIndex
      .flatMap { case (c, i) => c.zipWithIndex.map { case (x, d) => (i, d, x) } }
      .toSeq.toDF("cluster", "dim", "x")
      .coalesce(1).write.mode("overwrite").parquet(centroidsPath(path))
    IndexManifest.snapshot(spark, path, Seq(""))
  }

  /**
   * APPEND new vectors to a standing IVF index under its FROZEN
   * coarse quantizer — the production incremental-ANN pattern: the
   * quantizer (centroids, persisted at build time) is model
   * parameters and does NOT refit per batch; new vectors are assigned
   * to their nearest existing centroid and appended into only the
   * touched cluster directories. Pre-existing files are never
   * rewritten, and because build and append share one assignment
   * expression, probe-after-append ≡ probe over an index where the
   * batch had been present at (frozen-quantizer) build time —
   * IndexAppendSpec proves it. Periodic re-clustering (a full
   * `ivfIndexWrite`) remains the owner's cadence decision, exactly
   * as with any IVF deployment.
   */
  def ivfIndexAppend(df: DataFrame, idCol: String, vecCol: String,
      path: String, extraCols: Seq[String] = Nil): Unit = {
    // crash-safe append (the banded-index contract): stage the batch's
    // cluster files, promote, flip visibility in one manifest commit
    val spark = df.sparkSession
    val staging = IndexManifest.stagingRoot(path) + "/" +
      java.util.UUID.randomUUID().toString
    ivfWriteAssigned(withNorm(df, idCol +: extraCols, vecCol),
      loadCenters(spark, path), staging,
      org.apache.spark.sql.SaveMode.Overwrite)
    IndexManifest.commit(spark, path,
      IndexManifest.promoteStaged(spark, path, staging))
  }

  /**
   * Deterministic nearest-centroid assignment: squared euclidean via
   * d²(v,c) = v·v − 2·v·c + c·c (the c·c term a precomputed literal),
   * argmin as array_position(min) so ties break to the LOWEST cluster
   * id. One codegen'd projection, no MLlib vector conversion in the
   * written plan.
   */
  private def assignCluster(v: Column, centers: Array[Array[Double]]): Column = {
    val vv = dot(v, v)
    val d2s = centers.toSeq.map { c =>
      vv - lit(2.0) * dot(v, array(c.map(lit): _*)) + lit(c.map(x => x * x).sum)
    }
    val arr = array(d2s: _*)
    (array_position(arr, array_min(arr)) - 1).cast("int")
  }

  private def ivfWriteAssigned(corpus: DataFrame,
      centers: Array[Array[Double]], path: String,
      mode: org.apache.spark.sql.SaveMode): Unit =
    corpus.withColumn("cluster", assignCluster(col("v"), centers))
      // cluster rows by their target directory first — otherwise every
      // shuffle partition writes a file into every cluster directory
      // it touches (parallelism × nCentroids small files + commits;
      // see minhashIndexWrite for the measured cost of that shape).
      // Count pinned: AQE coalesces an unpinned tiny repartition to ~1
      // task, serializing every per-directory file open/commit
      // through it (minhashIndexWrite measured 13s vs 1s).
      .repartition(corpus.sparkSession.sessionState.conf.numShufflePartitions,
        col("cluster"))
      .write.mode(mode).partitionBy("cluster").parquet(path)

  /** The persisted centroid matrix, cluster-id ordered. */
  private def loadCenters(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Double]] = {
    val rows = spark.read.parquet(centroidsPath(path)).collect()
    val n = rows.map(_.getInt(0)).max + 1
    val dim = rows.map(_.getInt(1)).max + 1
    val out = Array.fill(n)(new Array[Double](dim))
    rows.foreach(r => out(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    out
  }

  private def centroidsPath(indexPath: String): String =
    indexPath.stripSuffix("/") + "_centroids"

  /**
   * Probe the materialized IVF index: centroids load driver-side
   * (model parameters), the `nProbe` nearest-by-cosine clusters are
   * picked locally, and the scan filter is a literal `cluster IN (…)`
   * over the partition column — Spark prunes to those directories at
   * file-listing time. Exact cosine runs on the probed lists only.
   */
  def ivfProbe(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, queryVec: Array[Double], k: Int, nProbe: Int = 2,
      excludeId: Option[Long] = None): DataFrame = {
    val centroids = spark.read.parquet(centroidsPath(path))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).map { case (c, rows) =>
        c -> rows.sortBy(_._2).map(_._3)
      }
    val qnrm = math.sqrt(queryVec.map(x => x * x).sum)
    def cosTo(c: Array[Double]): Double = {
      val d = c.zip(queryVec).map { case (a, b) => a * b }.sum
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) -1 else d / (n * qnrm)
    }
    val probes = centroids.toSeq.sortBy { case (_, c) => -cosTo(c) }
      .take(nProbe).map(_._1)
    val qv = array(queryVec.map(lit): _*)
    val hits = IndexTombstones.mask(
      IndexManifest.readTable(spark, path, "")
        .filter(col("cluster").isin(probes.map(Integer.valueOf): _*)),
      idCol, IndexTombstones.siblingPath(path))
    excludeId.fold(hits)(id => hits.filter(col(idCol) =!= id))
      .withColumn("cos", round(dot(col("v"), qv) / (col("nrm") * lit(qnrm)), 6))
      .select(col(idCol), col("cluster"), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * Auto-size the hyperplane band geometry to a corpus: pick
   * planesPerBand so a band's bucket count ~covers the corpus at
   * `targetBucketRows` rows per bucket (2^p ≥ n / target), then spend
   * the rest of the 64-bit code budget on bands (more bands = more
   * chances to collide = higher recall). The r6 sf1 measurements
   * behind this: at 20k vectors the test-SF default 16×4 admits ~64%
   * of ALL pairs as candidates (1−(15/16)¹⁶) and the blocked join
   * only reached 0.76× of brute force, while corpus-sized 8×8 pruned
   * to ~3% and ran 0.05× with recall 1.0. Pair recall at a target
   * cosine is `expectedRecall` — check it for YOUR threshold: low
   * thresholds (τ≈0.4) genuinely need wide-band geometry (the LSH
   * S-curve), which is why this is a helper, not a hidden default.
   * Beyond ~16 planes/band the one-long code budget is exhausted —
   * at billions of rows per bucket-set, split the corpus or widen
   * the code.
   */
  def bandGeometry(n: Long, targetBucketRows: Int = 64): (Int, Int) = {
    require(n > 0 && targetBucketRows > 0)
    val needed = math.max(1.0, n.toDouble / targetBucketRows)
    val p = math.min(16, math.max(2,
      math.ceil(math.log(needed) / math.log(2)).toInt))
    (64 / p, p)
  }

  /** Probability that a pair at cosine `cos` shares ≥1 band bucket
    * under random-hyperplane LSH: per-bit agreement is
    * 1 − θ/π (θ = arccos cos), a band of `planes` bits agrees with
    * that to the `planes`-th power, and `bands` independent chances
    * complement-multiply. The analytical form of RecallSpec's floor. */
  def expectedRecall(cos: Double, bands: Int, planes: Int): Double = {
    val pBit = 1.0 - math.acos(math.max(-1.0, math.min(1.0, cos))) / math.Pi
    1.0 - math.pow(1.0 - math.pow(pBit, planes), bands)
  }

  /**
   * Product-quantization codebook, trained DRIVER-SIDE on a bounded,
   * deterministic sample (first `trainN` rows by id): the vector is
   * split into `m` contiguous subspaces and each gets its own
   * `ksub`-centroid k-means (seeded Lloyd). The codebook is a model
   * parameter — m·ksub·subDim doubles (the defaults: 16·16·4 = 1 KB)
   * — trained on a sample because PQ codebooks converge on thousands
   * of vectors regardless of corpus size; the corpus itself never
   * feeds the fit. Returns the flat [sub][centroid][dim] layout
   * `VectorFunctions.pqEncode` consumes.
   */
  def pqTrainLocal(samples: Array[Array[Double]], m: Int, ksub: Int,
      iters: Int = 12, seed: Long = 42L): Array[Double] = {
    require(samples.nonEmpty, "PQ training needs a non-empty sample")
    val dim = samples.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val out = new Array[Double](m * ksub * subDim)
    val rng = new scala.util.Random(seed)
    var s = 0
    while (s < m) {
      val off = s * subDim
      val subs = samples.map(v => java.util.Arrays.copyOfRange(v, off, off + subDim))
      // seeded init from distinct sample positions; Lloyd with empty
      // clusters re-seeded deterministically
      val cents = Array.tabulate(ksub)(_ => subs(rng.nextInt(subs.length)).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ksub)(new Array[Double](subDim))
        val counts = new Array[Int](ksub)
        subs.foreach { v =>
          var best = 0; var bestD = Double.MaxValue; var c = 0
          while (c < ksub) {
            var d = 0.0; var i = 0
            while (i < subDim) { val x = v(i) - cents(c)(i); d += x * x; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < subDim) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        var c = 0
        while (c < ksub) {
          if (counts(c) > 0) {
            var i = 0
            while (i < subDim) { cents(c)(i) = sums(c)(i) / counts(c); i += 1 }
          } else {
            cents(c) = subs(rng.nextInt(subs.length)).clone()
          }
          c += 1
        }
        it += 1
      }
      var c = 0
      while (c < ksub) {
        System.arraycopy(cents(c), 0, out, (s * ksub + c) * subDim, subDim)
        c += 1
      }
      s += 1
    }
    out
  }

  /**
   * PQ ANN top-k — the COMPRESSED-DOMAIN scan path: vectors are
   * L2-normalized and encoded to one packed 8-byte code each (m=16
   * subspaces × 4 bits; `PqEncodeL`), the query's per-(subspace,
   * centroid) partial inner products become a 256-entry LUT computed
   * driver-side, and the scan ranks rows by `m` table lookups per row
   * (`PqAdcD` — no vector math, and over a persisted code table, no
   * vector BYTES: 8 bytes/row instead of 256 for a float32×64
   * embedding, a 32× I/O cut; see `pqIndexWrite`/`pqProbe`). The top
   * `k·refine` candidates by approximate inner product are then
   * re-ranked by EXACT cosine — vectors fetched by id equi-join, so
   * the expensive math touches k·refine rows, not the corpus.
   * Approximate by construction; `knnBrute` is its oracle and the
   * registry form self-checks recall.
   */
  def pqAnn(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, dim: Int, m: Int = 16, ksub: Int = 16,
      refine: Int = 16, trainN: Int = 2048, seed: Long = 42L): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val vecs = withNorm(df, Seq(idCol), vecCol)
      .select(col(idCol).as("id"), col("v"), col("nrm"))
      .withColumn("u", transform(col("v"), _ / col("nrm")))
    // codebook: driver-trained on the first trainN ids (deterministic
    // model fit on a bounded sample — not a corpus-sized collect)
    val sample = vecs.orderBy(col("id")).limit(trainN)
      .select(col("u")).collect()
      .map(_.getSeq[Double](0).toArray)
    val codebook = pqTrainLocal(sample, m, ksub, seed = seed)
    // narrow code table: (id, code) longs — the scan unit
    val codes = vecs.select(col("id"),
      graft.functions.VectorFunctions.pqEncode(col("u"), codebook, m, ksub, subDim)
        .as("code"))
    // query vector + LUT: model-parameter math, driver-side
    val q = vecs.filter(col("id") === queryId)
      .select(col("u"), col("nrm")).head()
    val qu = q.getSeq[Double](0).toArray
    val lut = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        var d = 0.0; var i = 0
        while (i < subDim) {
          d += qu(s * subDim + i) * codebook((s * ksub + c) * subDim + i)
          i += 1
        }
        lut(s * ksub + c) = d
        c += 1
      }
      s += 1
    }
    // ADC scan over codes only → top k·refine (TakeOrdered, no full
    // sort), then exact-cosine re-rank on the fetched candidates
    val cand = codes.filter(col("id") =!= queryId)
      .withColumn("aip",
        graft.functions.VectorFunctions.pqAdc(col("code"), lut, m, ksub))
      .orderBy(col("aip").desc, col("id"))
      .limit(k * refine)
    val quCol = array(qu.map(lit): _*)
    cand.join(vecs, Seq("id"))
      .withColumn("cos", round(dot(col("u"), quCol), 6))
      .select(col("id").as(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * Persist the PQ index: the narrow `(id, code)` table (8 bytes of
   * code per vector — at 100 TB of raw embeddings the code table is
   * ~3 TB, the difference between an ANN scan reading the corpus and
   * reading 3% of it) plus the codebook as a sibling parquet of
   * (sub, centroid, dim, x) rows. The codebook travels with the index
   * so `pqProbe` never retrains — encode-time and probe-time
   * codebooks are bit-identical by construction.
   */
  def pqIndexWrite(df: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int, m: Int = 16, ksub: Int = 16,
      trainN: Int = 2048, seed: Long = 42L): Unit = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val vecs = withNorm(df, Seq(idCol), vecCol)
      .select(col(idCol).as("id"), col("v"), col("nrm"))
      .withColumn("u", transform(col("v"), _ / col("nrm")))
    val sample = vecs.orderBy(col("id")).limit(trainN)
      .select(col("u")).collect()
      .map(_.getSeq[Double](0).toArray)
    val codebook = pqTrainLocal(sample, m, ksub, seed = seed)
    vecs.select(col("id"),
        graft.functions.VectorFunctions.pqEncode(col("u"), codebook, m, ksub, subDim)
          .as("code"))
      .write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    import spark.implicits._
    codebook.zipWithIndex.map { case (x, i) =>
      (i / (ksub * subDim), (i / subDim) % ksub, i % subDim, x)
    }.toSeq.toDF("sub", "centroid", "dim", "x")
      .coalesce(1).write.mode("overwrite").parquet(codebookPath(path))
    IndexManifest.snapshot(spark, path, Seq(""))
  }

  /**
   * APPEND new vectors to a standing PQ index under its FROZEN
   * codebook (persisted at build time — model parameters): the batch
   * encodes against exactly the sub-quantizer centroids `pqProbe`
   * builds its LUT from, so probe-after-append ≡ probe over a
   * frozen-codebook build that had included the batch
   * (IndexAppendSpec). Re-train (a full `pqIndexWrite`) on the
   * owner's re-clustering cadence, as with any PQ deployment.
   */
  def pqIndexAppend(df: DataFrame, idCol: String, vecCol: String,
      path: String, m: Int = 16, ksub: Int = 16): Unit = {
    val cb = df.sparkSession.read.parquet(codebookPath(path)).collect()
    val subDim = cb.map(_.getInt(2)).max + 1
    // m/ksub are recoverable from the persisted codebook exactly like
    // subDim; a caller passing build-mismatched values would otherwise
    // silently mis-index the flattened array and write garbage codes
    requireCodebookShape(cb, m, ksub)
    val codebook = new Array[Double](m * ksub * subDim)
    cb.foreach { r =>
      codebook((r.getInt(0) * ksub + r.getInt(1)) * subDim + r.getInt(2)) =
        r.getDouble(3)
    }
    val vecs = withNorm(df, Seq(idCol), vecCol)
      .select(col(idCol).as("id"), col("v"), col("nrm"))
      .withColumn("u", transform(col("v"), _ / col("nrm")))
    val spark = df.sparkSession
    val staging = IndexManifest.stagingRoot(path) + "/" +
      java.util.UUID.randomUUID().toString
    vecs.select(col("id"),
        graft.functions.VectorFunctions.pqEncode(col("u"), codebook, m, ksub,
          subDim).as("code"))
      .write.mode("overwrite").parquet(staging)
    IndexManifest.commit(spark, path,
      IndexManifest.promoteStaged(spark, path, staging))
  }

  private def codebookPath(indexPath: String): String =
    indexPath.stripSuffix("/") + "_codebook"

  /** Fail the contract loudly when the caller's (m, ksub) disagree with
    * the persisted codebook's dimensions instead of mis-indexing the
    * flattened array (garbage codes) or throwing ArrayIndexOutOfBounds
    * mid-encode. */
  private def requireCodebookShape(cb: Array[org.apache.spark.sql.Row],
      m: Int, ksub: Int): Unit = {
    val mCb = cb.map(_.getInt(0)).max + 1
    val ksubCb = cb.map(_.getInt(1)).max + 1
    require(m == mCb && ksub == ksubCb,
      s"PQ codebook at this path was built with m=$mCb, ksub=$ksubCb " +
        s"but caller passed m=$m, ksub=$ksub — pass the build parameters " +
        "(or rebuild via pqIndexWrite)")
  }

  /**
   * Probe the persisted PQ index: codebook loads driver-side (1 KB of
   * model parameters), the LUT is computed locally, and the scan
   * touches ONLY the `(id, code)` table — `ReadSchema` in the plan
   * shows two long columns, no embedding bytes (PqIndexSpec pins
   * this). Exact re-rank fetches the top `k·refine` candidates'
   * vectors from `vecsDf` by id equi-join.
   */
  def pqProbe(spark: org.apache.spark.sql.SparkSession, path: String,
      vecsDf: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Double], k: Int, m: Int = 16, ksub: Int = 16,
      refine: Int = 16, excludeId: Option[Long] = None): DataFrame = {
    val cb = spark.read.parquet(codebookPath(path)).collect()
    val subDim = cb.map(_.getInt(2)).max + 1
    requireCodebookShape(cb, m, ksub)
    val codebook = new Array[Double](m * ksub * subDim)
    cb.foreach { r =>
      codebook((r.getInt(0) * ksub + r.getInt(1)) * subDim + r.getInt(2)) =
        r.getDouble(3)
    }
    val qnrm = math.sqrt(queryVec.map(x => x * x).sum)
    val qu = queryVec.map(_ / qnrm)
    val lut = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        var d = 0.0; var i = 0
        while (i < subDim) {
          d += qu(s * subDim + i) * codebook((s * ksub + c) * subDim + i)
          i += 1
        }
        lut(s * ksub + c) = d
        c += 1
      }
      s += 1
    }
    val codes = IndexTombstones.mask(IndexManifest.readTable(spark, path, ""), "id",
      IndexTombstones.siblingPath(path))
    val scanned = excludeId.fold(codes)(id => codes.filter(col("id") =!= id))
      .withColumn("aip",
        graft.functions.VectorFunctions.pqAdc(col("code"), lut, m, ksub))
      .orderBy(col("aip").desc, col("id"))
      .limit(k * refine)
    val vecs = withNorm(vecsDf, Seq(idCol), vecCol)
      .select(col(idCol).as("id"), col("v"), col("nrm"))
      .withColumn("u", transform(col("v"), _ / col("nrm")))
    val quCol = array(qu.map(lit): _*)
    scanned.join(vecs, Seq("id"))
      .withColumn("cos", round(dot(col("u"), quCol), 6))
      .select(col("id").as(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** The persisted PQ codebook, flattened to the [sub][centroid][dim]
    * layout the encode/ADC expressions consume, with the caller's
    * (m, ksub) validated against the build's. Returns (codebook,
    * subDim). */
  private def loadCodebook(spark: org.apache.spark.sql.SparkSession,
      path: String, m: Int, ksub: Int): (Array[Double], Int) = {
    val cb = spark.read.parquet(codebookPath(path)).collect()
    val subDim = cb.map(_.getInt(2)).max + 1
    requireCodebookShape(cb, m, ksub)
    val codebook = new Array[Double](m * ksub * subDim)
    cb.foreach { r =>
      codebook((r.getInt(0) * ksub + r.getInt(1)) * subDim + r.getInt(2)) =
        r.getDouble(3)
    }
    (codebook, subDim)
  }

  /** The query's per-(subspace, centroid) partial inner products — the
    * ADC lookup table, m·ksub doubles computed driver-side. */
  private def pqLut(qu: Array[Double], codebook: Array[Double],
      m: Int, ksub: Int, subDim: Int): Array[Double] = {
    val lut = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        var d = 0.0; var i = 0
        while (i < subDim) {
          d += qu(s * subDim + i) * codebook((s * ksub + c) * subDim + i)
          i += 1
        }
        lut(s * ksub + c) = d
        c += 1
      }
      s += 1
    }
    lut
  }

  /**
   * IVF-PQ composed persisted index — the production ANN shape (the
   * FAISS `IVF<n>,PQ<m>` family): the IVF coarse quantizer prunes the
   * scan to `nProbe` cluster DIRECTORIES at file-listing time, and
   * inside those directories the scan reads only the 8-byte PQ code
   * per vector — both cuts in ONE probe. At 100 TB of raw embeddings
   * that composes a ~`nProbe/nCentroids` partition prune with the
   * ~32× code-vs-vector byte cut; the plain `ivfIndexWrite` gets only
   * the first, `pqIndexWrite` only the second. Codes are non-residual
   * (the unit vector is encoded directly, not its offset from the
   * cluster centroid), which keeps ONE query LUT valid across every
   * probed cluster — one scan, one ADC expression; residual encoding
   * would buy finer quantization at the cost of a per-cluster LUT and
   * is the documented upgrade path. Exact re-rank on the top
   * `k·refine` fetched vectors bounds the approximation exactly as in
   * `pqAnn`. Layout: `(id, code)` parquet partitioned by `cluster`,
   * centroid matrix at `<path>_centroids`, codebook at
   * `<path>_codebook`, manifest-committed like every index family.
   */
  def ivfpqIndexWrite(df: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int, nCentroids: Int = 16, m: Int = 16,
      ksub: Int = 16, trainN: Int = 2048, seed: Long = 42L): Unit = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = withNorm(df, Seq(idCol), vecCol)
      .select(col(idCol).as("id"), col("v"), col("nrm"))
      .withColumn("u", transform(col("v"), _ / col("nrm")))
    // coarse quantizer: fit ONCE at build time on the raw vectors —
    // the same model `ivfIndexWrite` persists, so the two families'
    // cluster geometry is comparable at a given seed
    val model = new KMeans().setK(nCentroids).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cluster")
      .fit(vecs.select(array_to_vector(col("v")).as("fv")))
    val centers = model.clusterCenters.map(_.toArray)
    // fine quantizer: PQ codebook on a bounded deterministic sample of
    // the unit vectors, exactly as pqIndexWrite trains it
    val sample = vecs.orderBy(col("id")).limit(trainN)
      .select(col("u")).collect().map(_.getSeq[Double](0).toArray)
    val codebook = pqTrainLocal(sample, m, ksub, seed = seed)
    ivfpqWriteCoded(vecs, centers, codebook, m, ksub, subDim, path,
      org.apache.spark.sql.SaveMode.Overwrite)
    val spark = df.sparkSession
    import spark.implicits._
    centers.zipWithIndex
      .flatMap { case (c, i) => c.zipWithIndex.map { case (x, d) => (i, d, x) } }
      .toSeq.toDF("cluster", "dim", "x")
      .coalesce(1).write.mode("overwrite").parquet(centroidsPath(path))
    codebook.zipWithIndex.map { case (x, i) =>
      (i / (ksub * subDim), (i / subDim) % ksub, i % subDim, x)
    }.toSeq.toDF("sub", "centroid", "dim", "x")
      .coalesce(1).write.mode("overwrite").parquet(codebookPath(path))
    IndexManifest.snapshot(spark, path, Seq(""))
  }

  /** One coded write shared by build and append: encode against the
    * given codebook, assign against the given centers (both frozen
    * model parameters on the append path), cluster rows by target
    * directory, write partitioned by cluster. */
  private def ivfpqWriteCoded(vecs: DataFrame, centers: Array[Array[Double]],
      codebook: Array[Double], m: Int, ksub: Int, subDim: Int,
      path: String, mode: org.apache.spark.sql.SaveMode): Unit =
    vecs.select(col("id"),
        graft.functions.VectorFunctions.pqEncode(col("u"), codebook, m, ksub,
          subDim).as("code"),
        assignCluster(col("v"), centers).as("cluster"))
      .repartition(vecs.sparkSession.sessionState.conf.numShufflePartitions,
        col("cluster"))
      .write.mode(mode).partitionBy("cluster").parquet(path)

  /**
   * APPEND under the FROZEN coarse quantizer AND frozen codebook —
   * both persisted at build time: the batch lands in exactly the
   * cluster directories and with exactly the codes a frozen-parameter
   * build would have given it, so probe-after-append ≡ probe over
   * that build (IvfPqIndexSpec proves it). Staged + one-rename
   * manifest commit, the family-wide crash contract.
   */
  def ivfpqIndexAppend(df: DataFrame, idCol: String, vecCol: String,
      path: String, m: Int = 16, ksub: Int = 16): Unit = {
    val spark = df.sparkSession
    val (codebook, subDim) = loadCodebook(spark, path, m, ksub)
    val centers = loadCenters(spark, path)
    val vecs = withNorm(df, Seq(idCol), vecCol)
      .select(col(idCol).as("id"), col("v"), col("nrm"))
      .withColumn("u", transform(col("v"), _ / col("nrm")))
    val staging = IndexManifest.stagingRoot(path) + "/" +
      java.util.UUID.randomUUID().toString
    ivfpqWriteCoded(vecs, centers, codebook, m, ksub, subDim, staging,
      org.apache.spark.sql.SaveMode.Overwrite)
    IndexManifest.commit(spark, path,
      IndexManifest.promoteStaged(spark, path, staging))
  }

  /**
   * Probe the composed index: centroids and codebook load driver-side
   * (model parameters — a few KB), the `nProbe` nearest-by-cosine
   * clusters become a literal `cluster IN (…)` over the PARTITION
   * column (directory pruning at file-listing time), and inside the
   * pruned directories the ADC scan ranks by `m` LUT lookups over the
   * 8-byte code — `ReadSchema` carries (id, code) only, no vector
   * bytes. ONE scan gets both cuts; exact cosine re-ranks the fetched
   * top `k·refine`.
   */
  def ivfpqProbe(spark: org.apache.spark.sql.SparkSession, path: String,
      vecsDf: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Double], k: Int, nProbe: Int = 2, m: Int = 16,
      ksub: Int = 16, refine: Int = 16,
      excludeId: Option[Long] = None): DataFrame = {
    val (codebook, subDim) = loadCodebook(spark, path, m, ksub)
    // coarse: rank clusters by cosine to the query, driver-side
    val centroids = spark.read.parquet(centroidsPath(path))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).map { case (c, rows) =>
        c -> rows.sortBy(_._2).map(_._3)
      }
    val qnrm = math.sqrt(queryVec.map(x => x * x).sum)
    def cosTo(c: Array[Double]): Double = {
      val d = c.zip(queryVec).map { case (a, b) => a * b }.sum
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) -1 else d / (n * qnrm)
    }
    val probes = centroids.toSeq.sortBy { case (_, c) => -cosTo(c) }
      .take(nProbe).map(_._1)
    // fine: the query LUT, valid across every probed cluster
    // (non-residual codes)
    val qu = queryVec.map(_ / qnrm)
    val lut = pqLut(qu, codebook, m, ksub, subDim)
    val codes = IndexTombstones.mask(
      IndexManifest.readTable(spark, path, "")
        .filter(col("cluster").isin(probes.map(Integer.valueOf): _*)),
      "id", IndexTombstones.siblingPath(path))
    val scanned = excludeId.fold(codes)(id => codes.filter(col("id") =!= id))
      .withColumn("aip",
        graft.functions.VectorFunctions.pqAdc(col("code"), lut, m, ksub))
      .orderBy(col("aip").desc, col("id"))
      .limit(k * refine)
    val vecs = withNorm(vecsDf, Seq(idCol), vecCol)
      .select(col(idCol).as("id"), col("v"), col("nrm"))
      .withColumn("u", transform(col("v"), _ / col("nrm")))
    val quCol = array(qu.map(lit): _*)
    scanned.join(vecs, Seq("id"))
      .withColumn("cos", round(dot(col("u"), quCol), 6))
      .select(col("id").as(idCol), col("cluster"), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * RESIDUAL IVF-PQ persisted index — the finer-quantization upgrade
   * `ivfpqIndexWrite` documents: each vector's PQ code encodes its
   * OFFSET from its cluster centroid (`r = u − c`) instead of the
   * unit vector itself. Residuals span a far smaller cell of the
   * space than the whole sphere, so the same 8-byte budget quantizes
   * them with less error (IvfPqResidualSpec measures the ADC-error
   * drop against the non-residual index on identical data). The
   * classic cost — one ADC lookup table PER PROBED CLUSTER under L2 —
   * vanishes under the inner-product metric this engine ranks by:
   * ⟨q, u⟩ = ⟨q, c⟩ + ⟨q, r⟩, where ⟨q, c⟩ is one driver-computed
   * double per cluster (a literal lookup on the partition column) and
   * ⟨q, r⟩ is the SAME query LUT for every cluster (the LUT depends
   * only on the query and the shared residual codebook). One scan,
   * one ADC expression, plus a per-cluster additive constant.
   *
   * Differences from the non-residual build, both deliberate: the
   * coarse quantizer fits on the UNIT vectors (the decomposition
   * lives in unit space), and the PQ codebook trains on a bounded
   * driver-side sample of RESIDUALS (assignment + subtraction are
   * driver-local replays of the same centroid math). Layout, append
   * contract, and manifest commit are identical to `ivfpqIndexWrite`.
   */
  def ivfpqrIndexWrite(df: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int, nCentroids: Int = 16, m: Int = 16,
      ksub: Int = 16, trainN: Int = 2048, seed: Long = 42L): Unit = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = withNorm(df, Seq(idCol), vecCol)
      .select(col(idCol).as("id"), col("v"), col("nrm"))
      .withColumn("u", transform(col("v"), _ / col("nrm")))
    val model = new KMeans().setK(nCentroids).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cluster")
      .fit(vecs.select(array_to_vector(col("u")).as("fv")))
    val centers = model.clusterCenters.map(_.toArray)
    // residual codebook: driver-side fit on residuals of a bounded
    // deterministic sample — assignment replayed locally with the
    // same d² = u·u − 2u·c + c·c argmin the distributed expression uses
    val sampleU = vecs.orderBy(col("id")).limit(trainN)
      .select(col("u")).collect().map(_.getSeq[Double](0).toArray)
    val residualSample = sampleU.map { u => residualLocal(u, centers) }
    val codebook = pqTrainLocal(residualSample, m, ksub, seed = seed)
    ivfpqrWriteCoded(vecs, centers, codebook, m, ksub, subDim, path,
      org.apache.spark.sql.SaveMode.Overwrite)
    val spark = df.sparkSession
    import spark.implicits._
    centers.zipWithIndex
      .flatMap { case (c, i) => c.zipWithIndex.map { case (x, d) => (i, d, x) } }
      .toSeq.toDF("cluster", "dim", "x")
      .coalesce(1).write.mode("overwrite").parquet(centroidsPath(path))
    codebook.zipWithIndex.map { case (x, i) =>
      (i / (ksub * subDim), (i / subDim) % ksub, i % subDim, x)
    }.toSeq.toDF("sub", "centroid", "dim", "x")
      .coalesce(1).write.mode("overwrite").parquet(codebookPath(path))
    IndexManifest.snapshot(spark, path, Seq(""))
  }

  /** Driver-local replay of assignCluster + subtraction: nearest
    * centroid by squared euclidean (ties to the lowest id, matching
    * array_position-of-min), residual = u − c. */
  private def residualLocal(u: Array[Double],
      centers: Array[Array[Double]]): Array[Double] = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < centers.length) {
      var d = 0.0; var i = 0
      while (i < u.length) { val x = u(i) - centers(c)(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    val r = new Array[Double](u.length)
    var i = 0
    while (i < u.length) { r(i) = u(i) - centers(best)(i); i += 1 }
    r
  }

  /** The distributed residual: u − centers[cluster], as one codegen'd
    * zip_with over a literal centroid matrix (nCentroids·dim doubles —
    * model parameters, never a join). */
  private def residualCol(u: Column, cluster: Column,
      centers: Array[Array[Double]]): Column = {
    val centersLit = array(centers.map(c => array(c.map(lit): _*)): _*)
    zip_with(u, element_at(centersLit, (cluster + 1).cast("int")), _ - _)
  }

  /** Shared by residual build and append: assign on the unit vector,
    * encode the residual, cluster rows by target directory, write
    * partitioned by cluster (the ivfWriteAssigned layout contract). */
  private def ivfpqrWriteCoded(vecs: DataFrame,
      centers: Array[Array[Double]], codebook: Array[Double], m: Int,
      ksub: Int, subDim: Int, path: String,
      mode: org.apache.spark.sql.SaveMode): Unit =
    vecs.withColumn("cluster", assignCluster(col("u"), centers))
      .select(col("id"),
        graft.functions.VectorFunctions.pqEncode(
          residualCol(col("u"), col("cluster"), centers),
          codebook, m, ksub, subDim).as("code"),
        col("cluster"))
      .repartition(vecs.sparkSession.sessionState.conf.numShufflePartitions,
        col("cluster"))
      .write.mode(mode).partitionBy("cluster").parquet(path)

  /** APPEND under the frozen quantizer AND frozen residual codebook —
    * the batch lands exactly where a frozen-parameter build would put
    * it, with exactly that build's codes; staged + one-rename manifest
    * commit (the family-wide crash contract). */
  def ivfpqrIndexAppend(df: DataFrame, idCol: String, vecCol: String,
      path: String, m: Int = 16, ksub: Int = 16): Unit = {
    val spark = df.sparkSession
    val (codebook, subDim) = loadCodebook(spark, path, m, ksub)
    val centers = loadCenters(spark, path)
    val vecs = withNorm(df, Seq(idCol), vecCol)
      .select(col(idCol).as("id"), col("v"), col("nrm"))
      .withColumn("u", transform(col("v"), _ / col("nrm")))
    val staging = IndexManifest.stagingRoot(path) + "/" +
      java.util.UUID.randomUUID().toString
    ivfpqrWriteCoded(vecs, centers, codebook, m, ksub, subDim, staging,
      org.apache.spark.sql.SaveMode.Overwrite)
    IndexManifest.commit(spark, path,
      IndexManifest.promoteStaged(spark, path, staging))
  }

  /**
   * Probe the residual index: clusters ranked by ⟨q_u, c⟩ driver-side
   * (the additive term of the decomposition — ranking by it probes
   * the clusters that contribute the largest constant), partition
   * prune via literal `cluster IN (…)`, and the estimate inside is
   * `⟨q_u, c_cluster⟩ + ADC(code)` — the per-cluster constant enters
   * as an `element_at` over an nProbe-sized literal array on the
   * partition column, so the scan stays ONE codegen'd projection over
   * (id, code, cluster). Exact cosine re-ranks the fetched top
   * `k·refine`, identical to every other family.
   */
  def ivfpqrProbe(spark: org.apache.spark.sql.SparkSession, path: String,
      vecsDf: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Double], k: Int, nProbe: Int = 2, m: Int = 16,
      ksub: Int = 16, refine: Int = 16,
      excludeId: Option[Long] = None): DataFrame = {
    val (codebook, subDim) = loadCodebook(spark, path, m, ksub)
    val centers = loadCenters(spark, path)
    val qnrm = math.sqrt(queryVec.map(x => x * x).sum)
    val qu = queryVec.map(_ / qnrm)
    def ipTo(c: Array[Double]): Double =
      c.zip(qu).map { case (a, b) => a * b }.sum
    val probes = centers.zipWithIndex
      .sortBy { case (c, _) => -ipTo(c) }.take(nProbe)
    val probeIds = probes.map(_._2)
    val lut = pqLut(qu, codebook, m, ksub, subDim)
    // per-cluster additive constant ⟨q_u, c⟩, dense over ALL clusters
    // (nCentroids doubles — a literal array indexed by the partition col)
    val clusterIp = array(centers.map(c => lit(ipTo(c))): _*)
    val codes = IndexTombstones.mask(
      IndexManifest.readTable(spark, path, "")
        .filter(col("cluster").isin(probeIds.map(Integer.valueOf): _*)),
      "id", IndexTombstones.siblingPath(path))
    val scanned = excludeId.fold(codes)(id => codes.filter(col("id") =!= id))
      .withColumn("aip",
        element_at(clusterIp, (col("cluster") + 1).cast("int")) +
          graft.functions.VectorFunctions.pqAdc(col("code"), lut, m, ksub))
      .orderBy(col("aip").desc, col("id"))
      .limit(k * refine)
    val vecs = withNorm(vecsDf, Seq(idCol), vecCol)
      .select(col(idCol).as("id"), col("v"), col("nrm"))
      .withColumn("u", transform(col("v"), _ / col("nrm")))
    val quCol = array(qu.map(lit): _*)
    scanned.join(vecs, Seq("id"))
      .withColumn("cos", round(dot(col("u"), quCol), 6))
      .select(col("id").as(idCol), col("cluster"), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * Per-dimension (min, max) over the UNIT vectors — the SQ8 model
   * parameters. ONE partial-aggregating pass (posexplode + min/max
   * groupBy on the dimension index; `dim` result rows), collected
   * driver-side like k-means centroids. Exact global extremes: at 8
   * bits/dim a stray outlier merely widens one dimension's step, it
   * cannot corrupt others (contrast PQ, where a skewed subspace skews
   * its whole codebook).
   */
  private def sq8Stats(vecs: DataFrame, dim: Int): (Array[Double], Array[Double]) = {
    val rows = vecs.select(posexplode(col("u")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect()
    val mins = new Array[Double](dim)
    val maxs = new Array[Double](dim)
    rows.foreach { r =>
      val d = r.getInt(0)
      if (d < dim) { mins(d) = r.getDouble(1); maxs(d) = r.getDouble(2) }
    }
    (mins, maxs)
  }

  private def sq8Scales(mins: Array[Double], maxs: Array[Double]): Array[Double] =
    mins.indices.map { i =>
      val range = maxs(i) - mins(i)
      if (range > 0) 255.0 / range else 0.0
    }.toArray

  /** Query-side SQ8 fold: approximate IP = qConst + Σ code_i·w_i. */
  private def sq8QueryFold(qu: Array[Double], mins: Array[Double],
      maxs: Array[Double]): (Array[Double], Double) = {
    val weights = qu.indices.map(i => qu(i) * (maxs(i) - mins(i)) / 255.0).toArray
    val qConst = qu.indices.map(i => qu(i) * mins(i)).sum
    (weights, qConst)
  }

  /**
   * Scalar-quantized (SQ8) ANN top-k — the third compression point on
   * the index spectrum (LSH buckets prune I/O by partition, PQ crushes
   * to 8 bytes at recall cost, SQ8 keeps 1 byte/dim: 4× smaller than
   * float32 with near-exact ranking). Vectors L2-normalize and encode
   * to a dim-byte BINARY (`Sq8EncodeB`, one codegen'd pass); the
   * query's inner product folds to a constant plus one multiply-add
   * per code byte (`Sq8AdcD`) — the scan reads codes, never vector
   * bytes. Top `k·refine` approximate candidates re-rank by exact
   * cosine via id equi-join. `knnBrute` is the oracle; the registry
   * form self-checks recall.
   */
  def sq8Ann(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, dim: Int, refine: Int = 4): DataFrame = {
    val vecs = withNorm(df, Seq(idCol), vecCol)
      .select(col(idCol).as("id"), col("v"), col("nrm"))
      .withColumn("u", transform(col("v"), _ / col("nrm")))
    val (mins, maxs) = sq8Stats(vecs, dim)
    val codes = vecs.select(col("id"),
      graft.functions.VectorFunctions.sq8Encode(col("u"), mins,
        sq8Scales(mins, maxs)).as("code"))
    val qu = vecs.filter(col("id") === queryId)
      .select(col("u")).head().getSeq[Double](0).toArray
    val (weights, qConst) = sq8QueryFold(qu, mins, maxs)
    val cand = codes.filter(col("id") =!= queryId)
      .withColumn("aip",
        graft.functions.VectorFunctions.sq8Adc(col("code"), weights, qConst))
      .orderBy(col("aip").desc, col("id"))
      .limit(k * refine)
    val quCol = array(qu.map(lit): _*)
    cand.join(vecs, Seq("id"))
      .withColumn("cos", round(dot(col("u"), quCol), 6))
      .select(col("id").as(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * Persist the SQ8 index: the narrow `(id, code)` table (1 byte/dim —
   * 4× less scan I/O than float32 embeddings, with near-exact
   * ranking) plus the per-dimension (min, max) as a sibling parquet.
   * The params travel with the index so `sq8Probe` never rescans the
   * corpus for extremes — encode-time and probe-time decode grids are
   * bit-identical by construction.
   */
  def sq8IndexWrite(df: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int): Unit = {
    val vecs = sq8Normalized(df, idCol, vecCol)
    val (mins, maxs) = sq8Stats(vecs, dim)
    sq8WriteEncoded(vecs, mins, maxs, path,
      org.apache.spark.sql.SaveMode.Overwrite)
    val spark = df.sparkSession
    import spark.implicits._
    mins.indices.map(i => (i, mins(i), maxs(i))).toDF("d", "vmin", "vmax")
      .coalesce(1).write.mode("overwrite").parquet(paramsPath(path))
    IndexManifest.snapshot(spark, path, Seq(""))
  }

  /**
   * APPEND new vectors to a standing SQ8 index under its FROZEN
   * per-dimension (min, max) grid: the params are model parameters
   * persisted at build time, so the appended codes decode on exactly
   * the grid `sq8Probe` already folds the query against — probe-after-
   * append ≡ probe over a frozen-grid build that had included the
   * batch (IndexAppendSpec). A batch value outside the build-time
   * range CLAMPS to the grid edge (`Sq8EncodeB` saturates at 0/255) —
   * the standard SQ tradeoff; re-run `sq8IndexWrite` when the corpus
   * distribution has drifted enough for clamping to matter
   * (`Curation.psiDrift` is the alarm for exactly that).
   */
  def sq8IndexAppend(df: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val spark = df.sparkSession
    val (mins, maxs) = loadSq8Params(spark, path)
    val staging = IndexManifest.stagingRoot(path) + "/" +
      java.util.UUID.randomUUID().toString
    sq8WriteEncoded(sq8Normalized(df, idCol, vecCol), mins, maxs, staging,
      org.apache.spark.sql.SaveMode.Overwrite)
    IndexManifest.commit(spark, path,
      IndexManifest.promoteStaged(spark, path, staging))
  }

  private def sq8Normalized(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    withNorm(df, Seq(idCol), vecCol)
      .select(col(idCol).as("id"), col("v"), col("nrm"))
      .withColumn("u", transform(col("v"), _ / col("nrm")))

  private def sq8WriteEncoded(vecs: DataFrame, mins: Array[Double],
      maxs: Array[Double], path: String,
      mode: org.apache.spark.sql.SaveMode): Unit =
    vecs.select(col("id"),
        graft.functions.VectorFunctions.sq8Encode(col("u"), mins,
          sq8Scales(mins, maxs)).as("code"))
      .write.mode(mode).parquet(path)

  private def loadSq8Params(spark: org.apache.spark.sql.SparkSession,
      path: String): (Array[Double], Array[Double]) = {
    val prm = spark.read.parquet(paramsPath(path)).collect()
    val dim = prm.map(_.getInt(0)).max + 1
    val mins = new Array[Double](dim)
    val maxs = new Array[Double](dim)
    prm.foreach { r =>
      mins(r.getInt(0)) = r.getDouble(1); maxs(r.getInt(0)) = r.getDouble(2)
    }
    (mins, maxs)
  }

  private def paramsPath(indexPath: String): String =
    indexPath.stripSuffix("/") + "_params"

  /**
   * Probe the persisted SQ8 index: params load driver-side (dim rows
   * of model parameters), the query folds to (weights, const)
   * locally, and the scan touches ONLY the `(id, code)` table —
   * `ReadSchema` carries a long and a binary, no embedding bytes
   * (Sq8IndexSpec pins this). Exact re-rank fetches the top
   * `k·refine` candidates' vectors from `vecsDf` by id equi-join.
   */
  def sq8Probe(spark: org.apache.spark.sql.SparkSession, path: String,
      vecsDf: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Double], k: Int, refine: Int = 4,
      excludeId: Option[Long] = None): DataFrame = {
    val prm = spark.read.parquet(paramsPath(path)).collect()
    val dim = prm.map(_.getInt(0)).max + 1
    val mins = new Array[Double](dim)
    val maxs = new Array[Double](dim)
    prm.foreach { r => mins(r.getInt(0)) = r.getDouble(1); maxs(r.getInt(0)) = r.getDouble(2) }
    val qnrm = math.sqrt(queryVec.map(x => x * x).sum)
    val qu = queryVec.map(_ / qnrm)
    val (weights, qConst) = sq8QueryFold(qu, mins, maxs)
    val codes = IndexTombstones.mask(IndexManifest.readTable(spark, path, ""), "id",
      IndexTombstones.siblingPath(path))
    val scanned = excludeId.fold(codes)(id => codes.filter(col("id") =!= id))
      .withColumn("aip",
        graft.functions.VectorFunctions.sq8Adc(col("code"), weights, qConst))
      .orderBy(col("aip").desc, col("id"))
      .limit(k * refine)
    val vecs = withNorm(vecsDf, Seq(idCol), vecCol)
      .select(col(idCol).as("id"), col("v"), col("nrm"))
      .withColumn("u", transform(col("v"), _ / col("nrm")))
    val quCol = array(qu.map(lit): _*)
    scanned.join(vecs, Seq("id"))
      .withColumn("cos", round(dot(col("u"), quCol), 6))
      .select(col("id").as(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Driver-side mirror of `HyperplaneCodeD` (bit p = sign(v·plane_p),
    * `>= 0` inclusive, same seeded planes) — for computing a QUERY
    * vector's buckets as model parameters, no Spark job. */
  def hyperplaneCodeLocal(v: Array[Double], dim: Int, nPlanes: Int = 16,
      seed: Long = 42L): Long = {
    val rng = new scala.util.Random(seed)
    val planes = Array.fill(nPlanes, dim)(rng.nextGaussian())
    (0 until nPlanes).foldLeft(0L) { (code, p) =>
      val s = (0 until math.min(v.length, dim))
        .foldLeft(0.0)((acc, i) => acc + planes(p)(i) * v(i))
      if (s >= 0) code | (1L << p) else code
    }
  }

  /**
   * Materialized ANN index, TWO tables under one root (the narrow-
   * bands + payload-fetched-once layout the minhash index v2
   * established — SURVEY §6 r9 has the 16×-payload measurements that
   * forced it there):
   *  - `bands/` — (id, band, bucket) longs, PARTITIONED BY
   *    (band, bucket): the claim "(band, bucket) IS the partition
   *    key" made physical. A probe touches only its `bands` buckets'
   *    directories out of bands×2^planesPerBand, and the pruned scan
   *    carries a few bytes per row — NOT the vector, which the v1
   *    layout duplicated onto every band row (bands× the corpus
   *    vector bytes on disk and in every candidate shuffle);
   *  - `vecs/` — one (id, v, nrm) row per vector, fetched by id
   *    equi-join once per surviving candidate.
   */
  def annIndexWrite(df: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int, bands: Int = 16, planesPerBand: Int = 4,
      extraCols: Seq[String] = Nil): Unit =
    annWriteBanded(df, idCol, vecCol, path, dim, bands, planesPerBand,
      extraCols, org.apache.spark.sql.SaveMode.Overwrite)

  private[operators] def annBandsPath(path: String): String =
    path.stripSuffix("/") + "/bands"
  private[operators] def annVecsPath(path: String): String =
    path.stripSuffix("/") + "/vecs"

  /**
   * APPEND a batch of new vectors to a standing banded index — the
   * write half of the incremental ANN loop. The hyperplane code is a
   * pure seeded function of the vector (same seed ⇒ same planes ⇒
   * same buckets), so probe-after-append is EXACTLY
   * probe-after-full-rebuild; only the batch's (band, bucket)
   * directories gain files and pre-existing files are never touched
   * (IndexAppendSpec pins both). (dim, bands, planesPerBand) MUST
   * match the index's build parameters — the `annProbe` contract.
   */
  def annIndexAppend(df: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int, bands: Int = 16, planesPerBand: Int = 4,
      extraCols: Seq[String] = Nil): Unit =
    annWriteBanded(df, idCol, vecCol, path, dim, bands, planesPerBand,
      extraCols, org.apache.spark.sql.SaveMode.Append)

  private def annWriteBanded(df: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int, bands: Int, planesPerBand: Int,
      extraCols: Seq[String], mode: org.apache.spark.sql.SaveMode): Unit = {
    val spark = df.sparkSession
    val vecRows = withNorm(df, idCol +: extraCols, vecCol)
      .select((idCol +: extraCols).map(col) ++ Seq(col("v"), col("nrm")): _*)
    // the vecs write runs at full parallelism and IS the
    // materialization of the normalize pass: band rows derive from
    // reading it back (the code is one deterministic projection over
    // the stored vector, cheap to recompute). On APPEND the read-back
    // would see the whole standing table, so the batch-sized relation
    // checkpoints instead — the minhash writeIndexRows contract.
    def writeBands(back: DataFrame, dest: String): Unit = back
      .withColumn("code", hyperplaneCode(col("v"), dim, bands * planesPerBand))
      .select(col(idCol),
        posexplode(array((0 until bands).map { b =>
          shiftright(col("code"), b * planesPerBand)
            .bitwiseAND(lit((1 << planesPerBand) - 1))
        }: _*)).as(Seq("band", "bucket")))
      // cluster rows by target directory, count pinned against AQE's
      // small-shuffle coalescing (see minhashIndexWrite)
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("band"), col("bucket"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("band", "bucket").parquet(dest)
    if (mode == org.apache.spark.sql.SaveMode.Overwrite) {
      vecRows.write.mode(mode).parquet(annVecsPath(path))
      writeBands(spark.read.parquet(annVecsPath(path)), annBandsPath(path))
      IndexManifest.snapshot(spark, path, Seq("vecs", "bands"))
    } else {
      // crash-safe append: stage both tables, promote, flip visibility
      // with one manifest commit (the minhash append contract —
      // IndexCommitSpec kills the append at each boundary)
      val staging = IndexManifest.stagingRoot(path) + "/" +
        java.util.UUID.randomUUID().toString
      vecRows.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(staging + "/vecs")
      writeBands(graft.operators.Dedup.materialize(vecRows), staging + "/bands")
      IndexManifest.commit(spark, path,
        IndexManifest.promoteStaged(spark, path, staging))
    }
  }

  /**
   * Probe the materialized index: the query vector's band buckets are
   * computed DRIVER-SIDE (`hyperplaneCodeLocal` — model math on one
   * vector), so the scan filter is a literal disjunction over the
   * partition columns and Spark prunes to exactly those directories
   * at file-listing time (`PartitionFilters` in the plan;
   * AnnIndexSpec pins the numFiles metric). Exact cosine then runs
   * on the candidates only.
   */
  def annProbe(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, queryVec: Array[Double], k: Int, dim: Int,
      bands: Int = 16, planesPerBand: Int = 4, seed: Long = 42L,
      excludeId: Option[Long] = None): DataFrame = {
    // dim MUST be the dim the index was written with: the seeded plane
    // stream is Array.fill(nPlanes, dim), so a different dim changes
    // every plane and the probe would silently read the wrong buckets
    require(queryVec.length <= dim,
      s"query vector has ${queryVec.length} dims but the index was written with $dim")
    val code = hyperplaneCodeLocal(queryVec, dim,
      bands * planesPerBand, seed)
    val mask = (1 << planesPerBand) - 1
    val pred = (0 until bands).map { b =>
      col("band") === b && col("bucket") === ((code >> (b * planesPerBand)) & mask)
    }.reduce(_ || _)
    val qnrm = math.sqrt(queryVec.map(x => x * x).sum)
    val qv = array(queryVec.map(lit): _*)
    // the pruned scan reads NARROW band rows; candidate ids dedup
    // before the vector fetch, so each candidate's payload travels
    // once. Exclude and tombstone-mask BEFORE ranking — a corpus-
    // resident query vector sits in its own buckets at cos 1.0 and
    // would eat a top-k slot.
    val hits = IndexManifest.readTable(spark, path, "bands").filter(pred)
      .select(col(idCol)).distinct()
    val live = IndexTombstones.mask(
      excludeId.fold(hits)(id => hits.filter(col(idCol) =!= id)),
      idCol, IndexTombstones.siblingPath(path))
    live
      .join(IndexManifest.readTable(spark, path, "vecs").hint("shuffle_hash"),
        Seq(idCol))
      .withColumn("cos", round(dot(col("v"), qv) / (col("nrm") * lit(qnrm)), 6))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * BATCH probe of the banded index — the embedding analogue of
   * `Dedup.minhashProbe`, and the missing read half of incremental
   * EMBEDDING dedup: a new batch of vectors dedups against the
   * standing corpus by coding only itself, collecting its distinct
   * (band, bucket) pairs (bounded by bands × min(batch, 2^planes) —
   * model-parameter-sized at any corpus size), pruning the band scan
   * to those directories with a literal predicate, and equi-joining
   * the bucket. Candidates dedup NARROW (new_id, corpus_id); both
   * sides' vectors are fetched by id once per surviving pair; exact
   * cosine ≥ `threshold` verifies. Because hyperplane codes are pure
   * seeded functions of the vector, the union of probe results over
   * arrivals equals the one-shot in-memory banded join over
   * everything ingested, cross-orientation — the `embed_dedup_index`
   * registry proof.
   */
  def annBatchProbe(batch: DataFrame, path: String, idCol: String,
      vecCol: String, threshold: Double, dim: Int, bands: Int = 16,
      planesPerBand: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions.dotd
    val spark = batch.sparkSession
    val p = planesPerBand
    val maskBits = (1L << p) - 1
    val bvecs = graft.operators.Dedup.materialize(
      withNorm(batch, Seq(idCol), vecCol)
        .select(col(idCol).as("new_id"), col("v"), col("nrm"))
        .withColumn("code", hyperplaneCode(col("v"), dim, bands * p)))
    val banded = bvecs.select(col("new_id"),
      posexplode(array((0 until bands).map { b =>
        shiftright(col("code"), b * p).bitwiseAND(lit(maskBits))
      }: _*)).as(Seq("band", "bucket")))
    // sorted literal predicate (plan-text determinism — the
    // minhashProbe contract)
    val touched = banded.select(col("band"), col("bucket")).distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted
    val byBand = touched.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val pred = byBand.toSeq.sortBy(_._1).map { case (b, bs) =>
      col("band") === b && col("bucket").isin(bs: _*)
    }.reduceOption(_ || _).getOrElse(lit(false))
    val idxBands = IndexManifest.readTable(spark, path, "bands").filter(pred)
      .select(col(idCol).as("corpus_id"), col("band"), col("bucket"))
    val cand = banded
      .join(idxBands.hint("shuffle_hash"), Seq("band", "bucket"))
      .select(col("new_id"), col("corpus_id"))
      .distinct()
    val live = IndexTombstones.mask(cand, "corpus_id",
      IndexTombstones.siblingPath(path))
    val cvecs = IndexManifest.readTable(spark, path, "vecs")
      .select(col(idCol).as("corpus_id"), col("v").as("cv"),
        col("nrm").as("cn"))
    live
      .join(cvecs.hint("shuffle_hash"), "corpus_id")
      .join(bvecs.select(col("new_id"), col("v").as("bv"),
        col("nrm").as("bn")).hint("shuffle_hash"), "new_id")
      .select(col("new_id"), col("corpus_id"),
        round(dotd(col("bv"), col("cv")) / (col("bn") * col("cn")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("new_id"), col("corpus_id"))
  }

  /**
   * DELETE vectors from ANY standing ANN index (banded-LSH, IVF, PQ,
   * SQ8 — encoding knows nothing about deletion, so one operation
   * serves the whole family): the ids land as an append-only
   * tombstone table at the index's `_tombstones` sibling and every
   * probe anti-joins its candidates against it BEFORE ranking, so a
   * deleted vector can neither appear in results nor eat a top-k
   * slot. Delete-sized write, pre-existing index files never opened
   * (IndexDeleteSpec pins the file contract per family). A tombstone
   * masks the id entirely — including rows appended later — until
   * the family's vacuum pass ([[annIndexVacuum]]/[[ivfIndexVacuum]]/
   * [[pqIndexVacuum]]/[[sq8IndexVacuum]]) physically drops masked
   * rows and clears the set.
   */
  def indexDelete(ids: DataFrame, path: String, idCol: String): Unit =
    IndexTombstones.delete(ids, idCol, IndexTombstones.siblingPath(path))

  /** VACUUM a banded-LSH index: drop masked rows from both tables
    * into a fresh root (same pinned cluster-by-directory write shape
    * as build/append so probe pruning survives) and start an empty
    * tombstone set. The seeded planes are implicit in
    * (dim, bands, planesPerBand), so rows rewrite verbatim — no
    * parameter table to carry. */
  def annIndexVacuum(spark: org.apache.spark.sql.SparkSession,
      src: String, dest: String, idCol: String): Unit = {
    val tp = IndexTombstones.siblingPath(src)
    IndexTombstones.mask(IndexManifest.readTable(spark, src, "vecs"), idCol, tp)
      .write.mode("overwrite").parquet(annVecsPath(dest))
    IndexTombstones.mask(IndexManifest.readTable(spark, src, "bands"), idCol, tp)
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("band"), col("bucket"))
      .write.mode("overwrite").partitionBy("band", "bucket")
      .parquet(annBandsPath(dest))
    IndexManifest.snapshot(spark, dest, Seq("vecs", "bands"))
  }

  /** VACUUM an IVF index: masked rows drop, the FROZEN centroid table
    * copies verbatim (vacuum is maintenance, not a refit — assignment
    * of every surviving row stays valid by construction). */
  def ivfIndexVacuum(spark: org.apache.spark.sql.SparkSession,
      src: String, dest: String, idCol: String): Unit = {
    IndexTombstones.mask(IndexManifest.readTable(spark, src, ""), idCol,
        IndexTombstones.siblingPath(src))
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(dest)
    spark.read.parquet(centroidsPath(src)).coalesce(1)
      .write.mode("overwrite").parquet(centroidsPath(dest))
    IndexManifest.snapshot(spark, dest, Seq(""))
  }

  /** VACUUM a PQ index: masked codes drop, the frozen codebook copies
    * verbatim. */
  def pqIndexVacuum(spark: org.apache.spark.sql.SparkSession,
      src: String, dest: String): Unit = {
    IndexTombstones.mask(IndexManifest.readTable(spark, src, ""), "id",
        IndexTombstones.siblingPath(src))
      .write.mode("overwrite").parquet(dest)
    spark.read.parquet(codebookPath(src)).coalesce(1)
      .write.mode("overwrite").parquet(codebookPath(dest))
    IndexManifest.snapshot(spark, dest, Seq(""))
  }

  /** VACUUM an SQ8 index: masked codes drop, the frozen (min, max)
    * grid copies verbatim (no re-quantization — the surviving codes
    * stay bit-identical, so probes are exact across the vacuum). */
  def sq8IndexVacuum(spark: org.apache.spark.sql.SparkSession,
      src: String, dest: String): Unit = {
    IndexTombstones.mask(IndexManifest.readTable(spark, src, ""), "id",
        IndexTombstones.siblingPath(src))
      .write.mode("overwrite").parquet(dest)
    spark.read.parquet(paramsPath(src)).coalesce(1)
      .write.mode("overwrite").parquet(paramsPath(dest))
    IndexManifest.snapshot(spark, dest, Seq(""))
  }
}
