package graft.etl

import org.apache.spark.sql.SparkSession

/**
 * End-to-end pipeline driver: block JSON glob in, the reference's
 * three task tables + error table out.
 *
 *   sbt "runMain graft.etl.EtlDemo <blocksGlob> <destDir>"
 */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    val Array(glob, dest) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val blocks = BlockIngest.readAuto(spark, glob)
    FileSink.writeAll(blocks, dest)
    Seq("transactions", "transfers", "blocks", "errors").foreach { t =>
      println(s"$t: ${spark.read.parquet(s"${dest}_$t").count()} rows")
    }
    spark.stop()
  }
}
