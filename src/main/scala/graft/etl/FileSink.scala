package graft.etl

import org.apache.spark.sql.DataFrame

/**
 * Load side of the pipeline: write each transform's table plus the
 * error side-channel, as parquet or CSV — the reference's
 * `FileOutput.write` + `FileOutputFormat` (`FileOutput.py:126-183`)
 * with Spark writers.
 *
 * Scale: parquet is written partitioned (caller picks partition
 * columns — e.g. a day derived from `time`); CSV kept only for parity
 * with the reference's small-output mode. The reference's
 * `keep_subdirs` layout maps to `partitionBy` on a path-derived
 * column rather than driver-side directory loops.
 */
object FileSink {

  def writeParquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** ORC output — the other columnar format warehouses commonly mandate;
    * same partitioning contract as parquet. */
  def writeOrc(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
  }

  def readOrc(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /**
   * Schema-evolution read: merge the footers of every parquet file
   * under `path` into one unified schema — files written before a
   * column existed yield nulls for it. This is how a long-lived table
   * absorbs additive schema changes without rewriting history. Merge
   * is opt-in because footer merging lists and reads every footer
   * (expensive at 10^6 files — production tables keep the committed
   * schema in a catalog instead); the semantics are what matters here.
   */
  def readMergedParquet(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /**
   * Schema'd CSV read-back — the other half of the reference's CSV
   * mode. The explicit schema (from the writing DataFrame or a
   * declared one) is mandatory: schema inference scans the data twice
   * and guesses, both wrong at scale. PERMISSIVE + corrupt-record
   * column mirrors the JSON ingest's error channel.
   */
  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /**
   * All task tables + error table under `destDir`, mirroring the
   * `{destination}_{task}` naming of the reference (plus the accounts
   * surface the reference keeps internal).
   *
   * The parsed blocks persist (spilling to disk) for the fan-out:
   * five outputs over one parse. Re-parsing per output would read and
   * parse every block file five times — and large real blocks (a
   * mainnet block is a single ~40 MB JSON line) make the repeated
   * parse both the dominant cost and a transient-memory hazard.
   */
  def writeAll(blocks: DataFrame, destDir: String, asCsv: Boolean = false): Unit =
    writeTasks(blocks, destDir, TaskNames, asCsv)

  /** Task name → table plan, mirroring `TransformTask.from_names`. */
  val TaskNames: Seq[String] =
    Seq("transactions", "transfers", "accounts", "blocks", "errors")

  private def taskTable(blocks: DataFrame, name: String): DataFrame = name match {
    case "transactions" => SolanaTransforms.transactions(blocks)
    case "transfers" => SolanaTransforms.transfers(blocks)
    case "accounts" => SolanaTransforms.accounts(blocks)
    case "blocks" => SolanaTransforms.blockInfo(blocks)
    case "errors" => BlockIngest.errors(blocks)
    case other => throw new IllegalArgumentException(
      s"unknown task '$other' (tasks: ${TaskNames.mkString(", ")})")
  }

  /**
   * A chosen subset of task tables (the CLI's `--tasks`).
   *
   * `persist = false` for callers whose `blocks` is ALREADY cache-
   * backed (`BlockIngest.readAutoCached`) — a second persist here
   * would hold a duplicate copy of the parse.
   *
   * `concurrent = true` overlaps the task writes as parallel jobs on
   * the shared scheduler: each table's plan has phases that leave
   * cores idle (the blocks table collapses to one row per block; the
   * commit of each parquet write is serial), and with the parse
   * materialized in the cache the four jobs are pure cache-scan →
   * project → write pipelines that interleave cleanly. The cache is
   * materialized BEFORE the fan-out so concurrent first-actions don't
   * race to build it partition by partition.
   */
  def writeTasks(blocks: DataFrame, destDir: String, tasks: Seq[String],
      asCsv: Boolean = false, persist: Boolean = true,
      concurrent: Boolean = false): Unit = {
    require(tasks.nonEmpty, "no tasks selected")
    val out: (DataFrame, String) => Unit =
      if (asCsv) (df, p) => writeCsv(df, p) else (df, p) => writeParquet(df, p)
    val cached =
      if (persist)
        blocks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else blocks
    try SolanaTransforms.withBlockEtlPlanning(blocks.sparkSession) {
      if (!concurrent) {
        tasks.foreach(t => out(taskTable(cached, t), s"${destDir}_$t"))
      } else {
        cached.count() // materialize once, before the fan-out (cheap if
                       // the caller's cache is already fully built)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        try {
          val futures = tasks.map { t =>
            scala.concurrent.Future(out(taskTable(cached, t), s"${destDir}_$t"))
          }
          import scala.concurrent.duration.Duration
          scala.concurrent.Await.result(
            scala.concurrent.Future.sequence(futures), Duration.Inf)
        } finally pool.shutdown()
      }
    } finally if (persist) cached.unpersist()
  }
}
