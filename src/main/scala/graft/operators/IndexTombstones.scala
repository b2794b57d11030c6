package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The DELETE mechanism shared by every persisted index in the repo
 * (the MinHash band index and the banded-LSH/IVF/PQ/SQ8 ANN family):
 * deletions land as an append-only TOMBSTONE table next to the index
 * and probes anti-join their candidates against it, so removing
 * documents never opens — let alone rewrites — a corpus-index file.
 * The write is delete-sized, the probe overhead is one keyed
 * anti-join against a delete-sized relation, and the never-deleted
 * common case costs nothing (no tombstone directory → no plan node).
 *
 * A tombstone masks an id ENTIRELY, including rows appended for that
 * id after the delete — the unambiguous contract when appends and
 * deletes interleave (no per-row versioning in the index). Re-adding
 * a previously-deleted id therefore requires the owner's vacuum pass
 * first (each index family exposes one: physically drop masked rows
 * into a fresh root, start an empty tombstone set). Encoding knows
 * nothing about deletion, so ONE mechanism serves every family; only
 * vacuum is per-family (each rewrites its own layout).
 */
object IndexTombstones {

  /** Sibling-path convention for the flat/partitioned ANN indexes
    * (their model parameters already live at `_centroids`/`_codebook`/
    * `_params`); the minhash index nests `tombstones/` under its root
    * instead, next to `bands/` and `sigs/`. */
  def siblingPath(indexPath: String): String =
    indexPath.stripSuffix("/") + "_tombstones"

  /** Append `ids` to the tombstone set at `tombstonesPath` — the whole
    * delete operation. Stored as a single `id` column in the id's
    * NATIVE type (the index writers accept arbitrary idCol types; a
    * long cast here would null out string ids under non-ANSI and make
    * the delete a silent no-op). Distinct within the batch
    * (re-deleting an id is idempotent semantically, and the table
    * stays delete-history-sized, compacted at vacuum).
    *
    * When a tombstone table already exists, the batch is CAST to the
    * table's id type before appending: a pre-r10 table (always written
    * as long) plus a native-typed batch would otherwise put
    * mixed-type parquet files under one path and break every
    * subsequent read with a schema-conversion error. A cast that can
    * lose information (e.g. string ids into a legacy long table)
    * fails loudly instead — the documented recovery is the owner's
    * vacuum pass, which rewrites the table in the native type. */
  def delete(ids: DataFrame, idCol: String, tombstonesPath: String): Unit = {
    val batch = ids.select(col(idCol).as("id")).distinct()
    val aligned = read(ids.sparkSession, tombstonesPath) match {
      case Some(existing) =>
        val want = existing.schema("id").dataType
        val have = batch.schema("id").dataType
        if (want == have) batch
        else {
          val cast = batch.select(col("id").cast(want).as("id"))
          // a cast that nulls out any non-null id is a silent-no-op
          // delete — refuse it (delete batches are small; the counts
          // are cheap)
          require(cast.filter(col("id").isNull).count() ==
              batch.filter(col("id").isNull).count(),
            s"IndexTombstones.delete: batch id type $have does not cast " +
              s"losslessly to the existing tombstone table's $want at " +
              s"$tombstonesPath — run the index owner's vacuum to rewrite " +
              s"the table in the native id type, then re-issue the delete")
          cast
        }
      case None => batch
    }
    aligned.write.mode(SaveMode.Append).parquet(tombstonesPath)
  }

  /** The tombstone ids if any delete has landed, else None — a missing
    * directory is the common never-deleted case and must not cost the
    * probe a plan node (or a parquet footer read). */
  def read(spark: SparkSession, tombstonesPath: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(tombstonesPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(spark.read.parquet(tombstonesPath)) else None
  }

  /** Drop `rows` whose `idCol` is tombstoned: one keyed anti-join
    * against the delete-sized relation (shuffle-hash-pinned — a
    * tombstone set is never the broadcast-vs-hash coin flip AQE should
    * decide from stage stats), or `rows` unchanged when no deletes
    * have landed. Apply BEFORE ranking/top-k so deleted rows can't eat
    * result slots. */
  def mask(rows: DataFrame, idCol: String, tombstonesPath: String): DataFrame =
    read(rows.sparkSession, tombstonesPath) match {
      case Some(tombs) =>
        val t = tombs.select(col("id").as("__tomb_id"))
        rows.join(t.hint("shuffle_hash"),
          rows(idCol) === t("__tomb_id"), "left_anti")
      case None => rows
    }
}
