package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * File-level and semantic contract of the persisted-index DELETE leg
 * (tombstones) and its VACUUM maintenance pass:
 *
 *  - a delete is purely additive: pre-existing data files untouched,
 *    new files appear ONLY under `tombstones/` — removing documents
 *    never rewrites the corpus index;
 *  - the masked probe equals the from-scratch path: probe-after-delete
 *    is compared against probe-after-full-rebuild over the corpus
 *    WITHOUT the deleted docs (estimate column included);
 *  - a tombstone masks the id entirely, including band rows APPENDED
 *    AFTER the delete (the documented contract: re-adding a deleted id
 *    requires vacuum first);
 *  - vacuum physically drops masked rows, clears the tombstone set,
 *    and preserves probe results exactly — after which the id can be
 *    re-appended and is visible again.
 */
class IndexDeleteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, dir)

  private def probeSet(incoming: org.apache.spark.sql.DataFrame,
      p: String): Set[(Long, Long, Double)] =
    Dedup.minhashProbe(incoming, p, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("delete: tombstone-only commit, probe == rebuild without deleted") {
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val deleted = docs.filter(col("doc_id") % 10 === 9)
    val root = graft.Scratch.tempDir("graft_del_mh")
    val idx = root + "/idx"
    val rebuilt = root + "/rebuilt"
    Dedup.minhashIndexWrite(corpus, "doc_id", "text", idx)
    val preDelete = probeSet(incoming, idx)

    val before = graft.Scratch.parquetFiles(idx)
    Dedup.minhashIndexDelete(deleted.select(col("doc_id")), idx, "doc_id")
    val after = graft.Scratch.parquetFiles(idx)
    val touched = before.filter { case (f, sz) => !after.get(f).contains(sz) }
    assert(touched.isEmpty, s"delete rewrote pre-existing files: $touched")
    val newFiles = after.keySet.diff(before.keySet)
    assert(newFiles.nonEmpty, "delete added no tombstone files")
    assert(newFiles.forall(_.contains("tombstones")),
      s"delete wrote outside tombstones/: ${newFiles.filterNot(_.contains("tombstones"))}")

    Dedup.minhashIndexWrite(
      docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 9),
      "doc_id", "text", rebuilt)
    val pa = probeSet(incoming, idx)
    assert(pa.nonEmpty)
    assert(pa == probeSet(incoming, rebuilt))
    // anti-vacuity: the delete actually removed candidates
    assert(pa != preDelete,
      "deleted slice produced no probe candidates — mask untested")
    assert(pa.forall { case (_, corpusId, _) => corpusId % 10 != 9 })
  }

  test("tombstone masks band rows appended after the delete") {
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 9)
    val slice = docs.filter(col("doc_id") % 10 === 9)
    val idx = graft.Scratch.tempDir("graft_del_mask") + "/idx"
    Dedup.minhashIndexWrite(corpus, "doc_id", "text", idx)
    val without = probeSet(incoming, idx)
    Dedup.minhashIndexDelete(slice.select(col("doc_id")), idx, "doc_id")
    Dedup.minhashIndexAppend(slice, idx, "doc_id", "text")
    assert(probeSet(incoming, idx) == without,
      "append after delete became visible — tombstone must mask the id " +
        "until vacuum")
  }

  test("vacuum: probe parity, tombstones cleared, masked rows dropped") {
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val deleted = docs.filter(col("doc_id") % 10 === 9)
    val root = graft.Scratch.tempDir("graft_del_vac")
    val idx = root + "/idx"
    val vacd = root + "/vacuumed"
    Dedup.minhashIndexWrite(corpus, "doc_id", "text", idx)
    Dedup.minhashIndexDelete(deleted.select(col("doc_id")), idx, "doc_id")
    val masked = probeSet(incoming, idx)

    Dedup.minhashIndexVacuum(spark, idx, vacd)
    assert(probeSet(incoming, vacd) == masked, "vacuum changed probe results")
    assert(graft.Scratch.parquetFiles(vacd).keySet
      .forall(!_.contains("tombstones")), "vacuum carried tombstones over")
    // masked rows are physically gone from both tables
    val bandDocs = spark.read.parquet(Dedup.bandsPath(vacd))
      .select(col("doc")).distinct().collect().map(_.getLong(0)).toSet
    assert(bandDocs.nonEmpty && bandDocs.forall(_ % 10 != 9))

    // after vacuum the id is re-addable: append the slice back and the
    // probe sees the full (undeleted) corpus again
    Dedup.minhashIndexAppend(deleted, vacd, "doc_id", "text")
    val full = graft.Scratch.tempDir("graft_del_full") + "/idx"
    Dedup.minhashIndexWrite(corpus, "doc_id", "text", full)
    assert(probeSet(incoming, vacd) == probeSet(incoming, full))
  }
}
