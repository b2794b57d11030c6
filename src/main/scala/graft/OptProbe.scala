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
    val stages: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
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
