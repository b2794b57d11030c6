package graft.etl

import org.apache.spark.sql.SparkSession

/**
 * The graft half of the BASELINE measurement (`tools/baseline_bench
 * .py` drives both halves): time the reference's OWN end-to-end batch
 * job — extracted block envelopes → transactions/transfers/blocks/
 * errors task tables on disk (`FileOutput.py:130-169`'s write path) —
 * on this engine, over the exact same input files the reference half
 * reads. JVM + session startup are excluded on this side exactly as
 * interpreter + pool startup are excluded on the reference side: the
 * quotient compares steady-state single-node engine throughput, not
 * process bootstrap.
 *
 * args: <blocks_dir> <dest_dir> [runs]
 * prints one JSON line: {"graft_sec": best, "runs": [..]}
 */
object EtlBaselineBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: EtlBaselineBench <blocks_dir> <dest_dir> [runs]")
    val blocksDir = args(0)
    val destDir = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same task set as the reference run: its TransformTask enum has
    // TRANSACTIONS/TRANSFERS/BLOCKS (TransformTask.py:114-176) and
    // FileOutput.write always adds the errors table
    val tasks = Seq("transactions", "transfers", "blocks", "errors")
    val walls = (1 to runs).map { i =>
      val dest = s"$destDir/run$i/out"
      val t0 = System.nanoTime()
      // single-parse ingest (the cache-backed two-phase read) + the
      // four task writes overlapped as concurrent jobs over that cache
      val blocks = BlockIngest.readAutoCached(spark, blocksDir)
      FileSink.writeTasks(blocks, dest, tasks, persist = false,
        concurrent = true)
      val wall = (System.nanoTime() - t0) / 1e9
      // drop the run's cache so the next run re-parses from the gzip
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      wall
    }
    spark.stop()
    println(s"""{"graft_sec": ${walls.min}, "runs": [${walls.mkString(", ")}]}""")
  }
}
