package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming mode of the pipeline ≈ `ExtractStreaming.py`: blocks
 * stream through the SAME transforms and land in files incrementally.
 * The transactions/transfers transforms are stateless (explode +
 * projection), so they run under Structured Streaming unchanged —
 * one definition, two execution modes, which is the point of
 * declaring transforms as plans rather than per-block loops.
 *
 * New block files appearing under `blocksGlob` become micro-batches;
 * each batch appends to the task tables. blockInfo aggregates per
 * block (grouped state), so the streaming form would need a
 * watermark on block time — left to the batch path here, like the
 * reference which emits per-file aggregates at rotation time.
 */
object StreamingEtl {

  /** Streaming source over extracted block JSON (same schema as batch). */
  def readBlockStream(spark: SparkSession, blocksDir: String): DataFrame =
    spark.readStream
      .schema(BlockSchema.block)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(blocksDir)
      .withColumn("source", element_at(split(input_file_name(), "/"), -1))

  /** Start appending a stateless task table to parquet. */
  def startTask(table: DataFrame, destDir: String, checkpoint: String): StreamingQuery =
    table.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpoint)
      .start()

  /**
   * Wire the stateless task tables (transactions, transfers, accounts)
   * as streams from a blocks directory. Returns the running queries;
   * caller awaits/stops them.
   */
  def start(spark: SparkSession, blocksDir: String, destDir: String): Seq[StreamingQuery] = {
    val blocks = readBlockStream(spark, blocksDir)
    SolanaTransforms.withBlockEtlPlanning(spark) {
      Seq(
        startTask(SolanaTransforms.transactions(blocks),
          s"${destDir}_transactions", s"$destDir/.ckpt_transactions"),
        startTask(SolanaTransforms.transfers(blocks),
          s"${destDir}_transfers", s"$destDir/.ckpt_transfers"),
        startTask(SolanaTransforms.accounts(blocks),
          s"${destDir}_accounts", s"$destDir/.ckpt_accounts"))
    }
  }
}
