package graft.etl

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Drives the streaming ETL as a real incremental job: one block file
 * appears → first micro-batch; a second file appears → second batch
 * appends. Same transforms as batch, same outputs, arriving
 * incrementally.
 */
class StreamingEtlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("blocks stream through transforms to files incrementally") {
    val src = Files.createTempDirectory("graft_stream_src")
    val dest = Files.createTempDirectory("graft_stream_dest").toString + "/out"
    val fixtures = Paths.get(getClass.getResource("/blocks").getPath)

    Files.copy(fixtures.resolve("block_100.json.gz"),
      src.resolve("block_100.json.gz"), StandardCopyOption.REPLACE_EXISTING)
    val queries = StreamingEtl.start(spark, src.toString, dest)
    try {
      queries.foreach(_.processAllAvailable())
      assert(spark.read.parquet(s"${dest}_transactions").count() == 2) // block 100
      assert(spark.read.parquet(s"${dest}_transfers").count() == 2)

      // second block arrives -> incremental append
      Files.copy(fixtures.resolve("block_101.json"),
        src.resolve("block_101.json"), StandardCopyOption.REPLACE_EXISTING)
      queries.foreach(_.processAllAvailable())
      assert(spark.read.parquet(s"${dest}_transactions").count() == 3)
      assert(spark.read.parquet(s"${dest}_transfers").count() == 3)
    } finally queries.foreach(_.stop())
  }
}
