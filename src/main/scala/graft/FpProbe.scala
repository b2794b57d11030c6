package graft

import org.apache.spark.sql.SparkSession

/**
 * Plan-flip probe: runs registry queries N times in one JVM and writes
 * every DISTINCT normalized executed plan (post-AQE, same
 * normalization as `Bench.planFingerprint`) to an output directory as
 * `<query>_<fingerprint>.txt`. Diffing two such files shows exactly
 * what AQE (or a noisy fingerprint) changed between runs.
 *
 * Usage (all knobs via env so it composes with `sbt runMain`):
 *   SPARK_GRAFT_SF_DIR   data dir      (default /root/testdata/sf0.1)
 *   SPARK_GRAFT_CPUS     local threads (default 32, mirrors bench)
 *   SPARK_GRAFT_RUNS     runs/query    (default 4)
 *   SPARK_GRAFT_OUT      output dir    (default target/fpprobe)
 *   args                 query names; empty = whole registry
 */
object FpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "4").toInt
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_OUT", "target/fpprobe"))
    java.nio.file.Files.createDirectories(outDir)
    val names =
      if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (name <- names) {
      val plans = (1 to runs).map { _ =>
        val counted = Bench.consumed(SparkEntry.queries(name)(spark, sfDir))
        counted.collect()
        val p = Bench.normalizedPlan(counted)
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        p
      }
      val distinct = plans.distinct
      distinct.foreach { p =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val fp = md.digest(p.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString
        java.nio.file.Files.writeString(outDir.resolve(s"${name}_$fp.txt"), p)
      }
      println(s"$name: ${distinct.size} distinct plan(s) over $runs runs" +
        (if (distinct.size > 1) "  <-- FLIP" else ""))
    }
    spark.stop()
  }
}
