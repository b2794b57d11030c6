package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.FileSink

/**
 * Table-maintenance surface: small-file compaction preserves content
 * while collapsing the file count, and schema-merged reads absorb
 * additive schema evolution across file generations.
 */
class LayoutMaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("compact collapses a fragmented table without changing its rows") {
    val src = tmpDir("graft_compact_src") + "/t"
    val dest = tmpDir("graft_compact_dst") + "/t"
    // 64 partitions over 1000 rows → 64 tiny files
    (0L until 1000L).toDF("id").withColumn("v", col("id") * 3)
      .repartition(64).write.parquet(src)
    val (nIn, nOut) = Layout.compact(spark, src, dest, targetFileBytes = 1L << 20)
    assert(nIn == 64)
    assert(nOut == 1) // 64 tiny files total far below 1 MiB
    val before = spark.read.parquet(src).collect().map(_.toSeq).toSet
    val after = spark.read.parquet(dest)
    assert(after.inputFiles.length == 1)
    assert(after.collect().map(_.toSeq).toSet == before)
  }

  test("merged-schema read unifies file generations, nulling absent columns") {
    val dir = tmpDir("graft_evolve") + "/t"
    // generation 1: (id, v) — before the quality column existed
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(dir + "/gen=1")
    // generation 2: adds quality
    Seq((3L, "c", 0.9)).toDF("id", "v", "quality")
      .write.parquet(dir + "/gen=2")
    val merged = FileSink.readMergedParquet(spark, dir)
    assert(merged.columns.sorted.toSeq == Seq("gen", "id", "quality", "v"))
    val rows = merged.select(col("id"), col("quality")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(0.9)))
  }
}
