package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout operators: how rows are ORDERED inside files decides
 * how much a 100 TB scan can skip. Parquet keeps per-row-group
 * min/max stats; a single-column sort clusters one predicate
 * dimension, a Z-order (Morton) sort interleaves the bits of several
 * dimensions so rows close in ANY of them land close in the file —
 * multi-dimensional range filters then prune most row groups.
 */
object Layout {

  /**
   * Morton key: interleave the low `bits` bits of two non-negative
   * integer columns (x in even positions, y in odd). Pure bit
   * arithmetic — codegen'd, no UDF, exact in any engine.
   */
  def zOrder2(x: Column, y: Column, bits: Int = 21): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** DuckDB-side rendering of the same key, for oracle parity. */
  def zOrder2Sql(x: String, y: String, bits: Int = 21): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /**
   * Write `df` parquet with rows Z-ordered on (x, y) — sorted within
   * partitions only: the global shuffle is the caller's partitioning
   * choice, the z-sort is per-file clustering on top of it.
   */
  def zOrderWrite(df: DataFrame, path: String, xCol: String, yCol: String): Unit =
    df.withColumn("_z", zOrder2(col(xCol), col(yCol)))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /**
   * Small-file compaction — the maintenance job every incremental
   * pipeline needs: streaming/micro-batch appends produce files sized
   * by arrival rate, and a 100 TB table fragmented into 10^7 tiny
   * files pays per-file open/footer/list costs that dwarf the scan
   * itself. Rewrites `src` into `dest` with file count chosen from the
   * source's total on-disk bytes (compressed) over `targetFileBytes`.
   * Uses `repartition` (round-robin) for even output sizes; the write
   * is to a NEW directory — swapping it in atomically is the table
   * format's / orchestrator's job, not a file-system rename race here.
   *
   * @return (input file count, output partition count)
   */
  def compact(spark: org.apache.spark.sql.SparkSession, src: String,
      dest: String, targetFileBytes: Long = 128L << 20): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(p).getLength
    val df = spark.read.parquet(src)
    val nIn = df.inputFiles.length
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    df.repartition(nOut).write.mode("overwrite").parquet(dest)
    (nIn, nOut)
  }

  /**
   * Compaction for a PARTITIONED table — the maintenance pass the
   * appendable indexes need (`minhashIndexAppend` and the ANN appends
   * add one file set per batch per touched directory; after many
   * batches each (band, bucket_p) / cluster directory is a pile of
   * small files). [[compact]] would flatten the layout — the
   * partition columns would come back as data columns in unpartitioned
   * files and every probe's partition pruning would silently break —
   * so this variant re-clusters BY the partition columns and writes
   * `partitionBy` them again: each output directory ends up with the
   * files of the one task that owns it, directory paths (and therefore
   * probe-side PartitionFilters pruning) unchanged. IndexCompactSpec
   * proves probe-after-compact ≡ probe-before, that the file count
   * strictly drops, and that the probe's pruned numFiles metric still
   * holds on the compacted index.
   *
   * The write goes to a NEW directory, same contract as [[compact]]:
   * atomic swap-in is the table format's / orchestrator's job.
   *
   * @return (input file count, output file count)
   */
  def compactPartitioned(spark: org.apache.spark.sql.SparkSession,
      src: String, dest: String, partitionCols: Seq[String]): (Int, Int) = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    val df = spark.read.parquet(src)
    val nIn = df.inputFiles.length
    // count pinned against AQE's small-shuffle coalescing: unpinned,
    // a small table collapses to ~1 task that then opens/commits every
    // directory's file serially (see minhashIndexWrite)
    df.repartition(spark.sessionState.conf.numShufflePartitions,
        partitionCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(dest)
    (nIn, spark.read.parquet(dest).inputFiles.length)
  }
}
