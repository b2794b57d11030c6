package graft

import org.apache.spark.sql.SparkSession

/**
 * Times the approximate/blocked operators ALONE against their exact
 * all-pairs anchors — the registry's self-checking forms deliberately
 * run both sides in one query, so their bench timings can't show
 * whether the blocked path actually beats brute force. This probe
 * answers exactly that: min-of-N per side, same params as the
 * registry forms, consumed through `Bench.consumed` so nothing is
 * optimizer-pruned.
 *
 * Knobs via env (mirrors Bench/FpProbe):
 *   SPARK_GRAFT_SF_DIR   data dir      (default /root/testdata/sf0.1)
 *   SPARK_GRAFT_CPUS     local threads (default 32)
 *   SPARK_GRAFT_RUNS     runs/side     (default 3)
 *
 * Output: one JSON line with per-side min + all runs, and the
 * blocked/exact ratio the SURVEY records.
 */
object AnchorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    // band geometry: size planesPerBand to the corpus (2^p ≳ n/bucket)
    // per the operator's own sizing doc — the registry's 16×4 is sized
    // for the 2k-vector test SF, not a 20k-vector sweep
    val bands = sys.env.getOrElse("SPARK_GRAFT_BANDS", "16").toInt
    val planes = sys.env.getOrElse("SPARK_GRAFT_PLANES", "4").toInt
    // near-dup cosine threshold: geometry must match the THRESHOLD as
    // much as the corpus (LSH S-curve) — low thresholds need wide-band
    // (16x4) geometry, true near-dup thresholds (>=0.9) prune hard at 8x8
    val tau = sys.env.getOrElse("SPARK_GRAFT_TAU", "0.4").toDouble
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, Similarity}

    val sides: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "knn_join_blocked_raw" -> (() =>
        Similarity.knnJoinBlocked(Tables.embeddings(spark, sfDir), "vec_id",
          "embedding", k = 3, dim = 64, bands = bands, planesPerBand = planes)),
      "knn_join_exact" -> (() =>
        Similarity.knnJoin(Tables.embeddings(spark, sfDir), "vec_id",
          "embedding", k = 3)),
      "embedding_lsh_raw" -> (() =>
        Dedup.embeddingNearDupLsh(Tables.embeddings(spark, sfDir), "vec_id",
          "embedding", threshold = tau, dim = 64, bands = bands,
          planesPerBand = planes)),
      "embedding_exact" -> (() =>
        Dedup.embeddingNearDupPairs(Tables.embeddings(spark, sfDir), "vec_id",
          "embedding", threshold = tau))
    )
    val results = sides.map { case (name, mk) =>
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        Bench.consumed(mk()).collect()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        dt
      }
      println(f"  $name%-22s min ${ts.min}%7.2fs  runs [${ts.map(t => f"$t%.2f").mkString(", ")}]")
      name -> ts
    }.toMap
    def min(k: String) = results(k).min
    val knnRatio = min("knn_join_blocked_raw") / min("knn_join_exact")
    val dedupRatio = min("embedding_lsh_raw") / min("embedding_exact")
    // recall at the probed geometry — timing without recall is half an
    // answer (a too-aggressive geometry is fast AND useless)
    def recall(exact: org.apache.spark.sql.DataFrame,
        approx: org.apache.spark.sql.DataFrame, keys: Seq[String]): Double = {
      import org.apache.spark.sql.functions._
      val e = exact.select(keys.map(col): _*)
      val a = approx.select(keys.map(col): _*).withColumn("hit", lit(1))
      val r = e.join(a, keys, "left")
        .agg((count(col("hit")) / count(lit(1))).as("r")).head().getDouble(0)
      math.rint(r * 1000) / 1000
    }
    val knnRecall = recall(
      Similarity.knnJoin(Tables.embeddings(spark, sfDir), "vec_id", "embedding", 3),
      Similarity.knnJoinBlocked(Tables.embeddings(spark, sfDir), "vec_id",
        "embedding", k = 3, dim = 64, bands = bands, planesPerBand = planes),
      Seq("src_id", "nbr_id"))
    val lshRecall = recall(
      Dedup.embeddingNearDupPairs(Tables.embeddings(spark, sfDir), "vec_id",
        "embedding", threshold = tau),
      Dedup.embeddingNearDupLsh(Tables.embeddings(spark, sfDir), "vec_id",
        "embedding", threshold = tau, dim = 64, bands = bands,
        planesPerBand = planes),
      Seq("id1", "id2"))
    val js = results.map { case (k, ts) =>
      s""""$k":{"min":${ts.min},"runs":[${ts.mkString(",")}]}"""
    }.mkString(",")
    println(f"""{"sf":"$sfDir","runs":$runs,"bands":$bands,"planes":$planes,"tau":$tau,$js,"knn_blocked_over_exact":$knnRatio%.3f,"dedup_lsh_over_exact":$dedupRatio%.3f,"knn_recall":$knnRecall,"lsh_recall":$lshRecall}""")
    spark.stop()
  }
}
