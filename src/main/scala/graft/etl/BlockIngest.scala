package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Ingest extracted block JSON (optionally gzipped — Spark decompresses
 * by extension) into a blocks DataFrame. Mirrors the read side of the
 * reference's `FileOutput` (dask `bag.read_text` over `*.json.gz`,
 * `FileOutput.py:120-165`) as a schema'd distributed JSON scan.
 *
 * PERMISSIVE mode + `_corrupt_record` is the reference's
 * ResultsAndErrors side-channel: malformed block files become error
 * rows instead of failing the job (`FileOutput.py:66-90`).
 *
 * Scale: one file ≈ one or more splits; gzip is not splittable, so the
 * extract side's `slots_per_file` grouping (small-ish files, many of
 * them) is exactly the right layout for parallel ingest.
 */
object BlockIngest {

  /** Read block JSON files; `source` = file name, like the reference's Block.source. */
  def read(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read
      .schema(BlockSchema.block)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(pathGlob)
      .withColumn("source",
        element_at(split(input_file_name(), "/"), -1))

  /**
   * Read legacy extracts whose accountKeys are bare strings and
   * normalize them to the jsonParsed struct form (signer/writable
   * unknown → null), so the transform layer has ONE input shape.
   */
  def readStringKeys(spark: SparkSession, pathGlob: String): DataFrame =
    readStringKeysPaths(spark, Seq(pathGlob))

  /** The same legacy read over an explicit file list — the re-read
    * half of `readAutoCached`'s two-phase routing. */
  def readStringKeysPaths(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .schema(BlockSchema.blockWithStringKeys)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(paths: _*)
      .withColumn("source", element_at(split(input_file_name(), "/"), -1))
      .withColumn("result", expr(
        """CASE WHEN result IS NULL THEN NULL ELSE named_struct(
          |  'blockhash', result.blockhash,
          |  'blockTime', result.blockTime,
          |  'parentSlot', result.parentSlot,
          |  'transactions', transform(result.transactions, tx -> named_struct(
          |    'meta', tx.meta,
          |    'transaction', named_struct(
          |      'signatures', tx.transaction.signatures,
          |      'message', named_struct(
          |        'accountKeys', transform(tx.transaction.message.accountKeys,
          |          k -> named_struct('pubkey', k,
          |                 'signer', CAST(NULL AS BOOLEAN),
          |                 'writable', CAST(NULL AS BOOLEAN))),
          |        'instructions', tx.transaction.message.instructions))))) END""".stripMargin))

  /**
   * Format-tolerant read: jsonParsed files parse directly; files that
   * only parse under the legacy string-keys schema are normalized and
   * merged in; files valid under neither stay as error rows. Both
   * passes are metadata-cheap scans of the same listing — no driver
   * loops, the routing is two left-semi joins on file name.
   */
  def readAuto(spark: SparkSession, pathGlob: String): DataFrame = {
    val parsed = read(spark, pathGlob)
    val legacy = readStringKeys(spark, pathGlob)
    val parsedBadSources = errors(parsed).select(col("block").as("source"))
    val legacyOnlyValid = valid(legacy)
      .join(parsedBadSources, Seq("source"), "left_semi")
    val bothBad = legacy
      .filter(col("_corrupt_record").isNotNull || col("result").isNull)
      .join(parsedBadSources, Seq("source"), "left_semi")
    valid(parsed).unionByName(legacyOnlyValid).unionByName(bothBad)
  }

  /**
   * Format-tolerant read that parses every file ONCE in the common
   * case — the scale-honest form of `readAuto`. `readAuto` is fully
   * declarative, and pays for it: the legacy-schema branches cannot be
   * pruned by the (almost always empty) bad-source semi-join, because
   * `source` is derived from `input_file_name()` — so every probe of
   * the union decompresses and JSON-parses the whole corpus up to
   * three times. Here the parse lands in a persisted cache, ONE
   * bounded driver action collects the full paths of the files that
   * failed the jsonParsed schema (model-parameter-sized: bad extracts
   * are exceptional, and `maxBadFiles` caps the collect — beyond it we
   * fall back to the declarative form rather than ship an unbounded
   * list to the driver), and only those named files are re-read under
   * the legacy schema. Every downstream task table then reads the
   * cache, not the gzip.
   *
   * The caller owns the cache's lifetime (it backs the returned
   * DataFrame): `unpersistAuto` releases it.
   */
  def readAutoCached(spark: SparkSession, pathGlob: String,
      maxBadFiles: Int = 10000): DataFrame = {
    val parsed = spark.read
      .schema(BlockSchema.block)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(pathGlob)
      .withColumn("_path", input_file_name())
      .withColumn("source", element_at(split(col("_path"), "/"), -1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bad = parsed
      .filter(col("_corrupt_record").isNotNull || col("result").isNull)
      .select(col("_path")).distinct()
      .limit(maxBadFiles + 1).collect().map(_.getString(0))
    if (bad.isEmpty) valid(parsed).drop("_path")
    else if (bad.length > maxBadFiles) {
      // pathological corpus (most files legacy/bad): the file list no
      // longer fits the model-parameter budget — declarative fallback
      parsed.unpersist()
      readAuto(spark, pathGlob)
    } else {
      val legacy = readStringKeysPaths(spark, bad.toSeq)
      val stillBad = legacy
        .filter(col("_corrupt_record").isNotNull || col("result").isNull)
      valid(parsed).drop("_path")
        .unionByName(valid(legacy))
        .unionByName(stillBad)
    }
  }

  /** Well-formed, non-missing blocks (`Block.py:40-47` missing check). */
  def valid(blocks: DataFrame): DataFrame =
    blocks.filter(col("_corrupt_record").isNull && col("result").isNotNull)

  /** Malformed inputs as an error table (name, block, message). */
  def errors(blocks: DataFrame): DataFrame =
    blocks.filter(col("_corrupt_record").isNotNull || col("result").isNull)
      .select(
        lit("json_to_blocks").as("name"),
        col("source").as("block"),
        coalesce(col("_corrupt_record"), lit("missing result")).as("message"))
}
