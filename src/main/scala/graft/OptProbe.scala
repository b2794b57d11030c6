package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Stage-level timing probe for optimization work (guide §1: measure
 * first, attribute before changing). Times named sub-stages of the
 * expensive operators with the noop-equivalent consume the bench uses,
 * min-of-N in one JVM. Measurement tooling only — never part of a
 * registry query path.
 *
 *   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_RUNS as Bench.
 *   args: stage names (default: all).
 */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = Tables.documents(spark, sfDir)
    def mmManifest = operators.Multimodal.manifest(docs, "doc_id", "text")

    // private stages are reproduced inline (same expressions as
    // Multimodal.simhashSig) so the probe needs no visibility changes
    def mmGrams(bands: Int) = mmManifest
      .select(col("asset_id"), col("payload").cast("string").as("p"))
      .select(col("asset_id"), explode(expr(
        "transform(sequence(1, greatest(length(p) - 2, 1)), i -> substring(p, i, 3))"))
        .as("ng"))
      .withColumn("hex", substring(md5(col("ng").cast("binary")), 1, bands * 4))
      .select(col("asset_id") +:
        (0 until bands).map(b =>
          conv(substring(col("hex"), b * 4 + 1, 4), 16, 10)
            .cast("long").as(s"w_$b")): _*)
    def mmSums(bands: Int) = {
      val g = mmGrams(bands)
      val sCols = for (b <- 0 until bands; j <- 0 until 16) yield
        sum(when(shiftright(col(s"w_$b"), j).bitwiseAND(lit(1L)) === 1L, 1)
          .otherwise(-1)).as(s"s_${b}_$j")
      g.groupBy(col("asset_id")).agg(sCols.head, sCols.tail: _*)
    }

    // v2 prototype: hex parsed as signed 64-bit words (one conv per 16
    // hex chars), bit votes SWAR-packed two 32-bit lanes per aggregate
    // long — (b, j) pairs with (b, j+8)
    def mmGramsV2(bands: Int) = {
      val nV = bands / 4
      mmManifest
        .select(col("asset_id"), col("payload").cast("string").as("p"))
        .select(col("asset_id"), explode(expr(
          "transform(sequence(1, greatest(length(p) - 2, 1)), i -> substring(p, i, 3))"))
          .as("ng"))
        .withColumn("hex", md5(col("ng").cast("binary")))
        .select(col("asset_id") +:
          (0 until nV).map(k =>
            conv(substring(col("hex"), k * 16 + 1, 16), 16, -10)
              .cast("long").as(s"v_$k")): _*)
    }
    def mmSumsV2(bands: Int) = {
      val nV = bands / 4
      val g = mmGramsV2(bands)
      // bit j of word b lives at position 16*(3 - b%4) + j of v_{b/4}
      def bitAt(b: Int, j: Int) = {
        val v = col(s"v_${b / 4}")
        shiftright(v, 16 * (3 - b % 4) + j).bitwiseAND(lit(1L))
      }
      val sCols = for (b <- 0 until bands; j <- 0 until 8) yield
        sum(bitAt(b, j).bitwiseOR(shiftleft(bitAt(b, j + 8), 32)))
          .as(s"sw_${b}_$j")
      g.groupBy(col("asset_id"))
        .agg(count(lit(1)).as("n_g"), sCols: _*)
    }
    // pipeline_curate stage prefixes (public operators the query
    // composes, cumulative)
    import org.apache.spark.sql.expressions.Window
    def pcKept1 = {
      val train = docs.filter(col("doc_id") % 20 =!= 0)
      operators.Dedup.materialize(
        train.withColumn("keep_id",
            min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
          .filter(col("doc_id") === col("keep_id")).drop("keep_id"))
    }
    def pcKept2 = {
      val kept1 = pcKept1
      val pairs = operators.Dedup.ngramJaccardPairs(kept1, "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleFreq = 100)
      val dupIds = operators.Dedup.connectedComponents(pairs, "id1", "id2")
        .filter(col("node") =!= col("component"))
        .select(col("node").as("doc_id"))
      kept1.join(dupIds.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
    }
    def pcKept3 = {
      val kept2 = pcKept2
      val quality = operators.Dedup.materialize(
        operators.TextAnalysis.qualityScore(kept2, "doc_id", "text")
          .select(col("doc_id"), col("quality")))
      kept2.join(quality.hint("shuffle_hash"), "doc_id")
        .filter(col("quality") >= 0.5)
    }
    def pcKept4 = {
      val kept3 = pcKept3
      val eval = docs.filter(col("doc_id") % 20 === 0)
      val contaminated = operators.Dedup.materialize(
        operators.Curation.decontaminateBloom(kept3, eval, "doc_id", "text", n = 5)
          .filter(col("contaminated")).select(col("doc_id")))
      kept3.join(contaminated.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
    }
    // embed_dedup_index stage prefixes
    def emb = Tables.embeddings(spark, sfDir)
    def annWriteOnly = {
      val corpus = emb.filter(col("vec_id") % 10 =!= 0)
      val path = Scratch.tempDir("graft_opt_ann") + "/idx"
      operators.Similarity.annIndexWrite(corpus, "vec_id", "embedding", path, dim = 64)
      spark.range(1).toDF("ok")
    }
    def annWriteProbe = {
      val corpus = emb.filter(col("vec_id") % 10 =!= 0)
      val incoming = emb.filter(col("vec_id") % 10 === 0)
      val path = Scratch.tempDir("graft_opt_ann2") + "/idx"
      operators.Similarity.annIndexWrite(corpus, "vec_id", "embedding", path, dim = 64)
      operators.Similarity.annBatchProbe(incoming, path, "vec_id", "embedding",
        threshold = 0.4, dim = 64)
    }
    def embRefLsh = operators.Dedup.embeddingNearDupLsh(emb, "vec_id", "embedding",
      threshold = 0.4, dim = 64)

    // minhash signature stage: current (64 seeded xxhash64) vs affine
    // (one xxhash64 base + 64 odd-multiplier affine permutations)
    import graft.functions.TextFunctions.words
    def shingles = {
      val n = 3
      val byDoc = Window.partitionBy(col("doc")).orderBy(col("pos"))
      val wordTable = docs.select(col("doc_id").as("doc"),
        posexplode(words(col("text"))).as(Seq("pos", "w")))
      val withLeads = wordTable.select(col("doc") +: col("w").as("w0") +:
        (1 until n).map(k => lead(col("w"), k).over(byDoc).as(s"w$k")): _*)
      withLeads.filter(col(s"w${n - 1}").isNotNull)
        .select(col("doc"),
          xxhash64(concat_ws(" ", (0 until n).map(k => col(s"w$k")): _*)).as("s"))
        .distinct()
    }
    def mhSigBase = shingles.groupBy(col("doc"))
      .agg(min(xxhash64(lit(0), col("s"))).as("sig_0"),
        (1 until 64).map(i => min(xxhash64(lit(i), col("s"))).as(s"sig_$i")): _*)
    def ngramPairs = operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8, maxShingleFreq = 100)
    def ngramCc = operators.Dedup.connectedComponents(
      ngramPairs.select(col("id1"), col("id2")), "id1", "id2")
    def mhLshPairs = operators.Dedup.minhashLshPairs(docs, "doc_id", "text")
    val stages: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "ngram_pairs" -> (() => ngramPairs),
      "ngram_cc" -> (() => ngramCc),
      "mh_lsh_pairs" -> (() => mhLshPairs),
      "mh_shingles" -> (() => shingles),
      "mh_sig_base" -> (() => mhSigBase),
      "pc_kept1" -> (() => pcKept1),
      "pc_kept2" -> (() => pcKept2),
      "pc_kept3" -> (() => pcKept3),
      "pc_kept4" -> (() => pcKept4),
      "pc_full" -> (() => queries.TrainingDataQueries.queries("pipeline_curate")(spark, sfDir)),
      "ann_write_only" -> (() => annWriteOnly),
      "ann_write_probe" -> (() => annWriteProbe),
      "emb_ref_lsh" -> (() => embRefLsh),
      "emb_full" -> (() => queries.TrainingDataQueries.queries("embed_dedup_index")(spark, sfDir)),
      "mm_grams_w8_v2" -> (() => mmGramsV2(8)),
      "mm_sums_w8_v2" -> (() => mmSumsV2(8)),
      "mm_sums_w4_v2" -> (() => mmSumsV2(4)),
      "mm_manifest_only" -> (() => mmManifest),
      "mm_grams_w8" -> (() => mmGrams(8)),
      "mm_sums_w8" -> (() => mmSums(8)),
      "mm_sums_w4" -> (() => mmSums(4)),
      "mm_full_w32" -> (() => operators.Multimodal.nearDupMediaW32(mmManifest)),
      "mm_full_wide" -> (() => operators.Multimodal.nearDupMediaWide(mmManifest)),
      "mm_full_near" -> (() => operators.Multimodal.nearDupMedia(mmManifest))
    )
    val wanted = if (args.isEmpty) stages else stages.filter(s => args.contains(s._1))
    // warm
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }
    wanted.foreach { case (name, fn) =>
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        Bench.consumed(fn()).collect()
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[optprobe] $name%-18s min=${ts.min}%6.2f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
