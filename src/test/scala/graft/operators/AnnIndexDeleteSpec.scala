package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * DELETE + VACUUM across the persisted ANN index family (banded-LSH,
 * IVF, PQ, SQ8) — one tombstone mechanism (`Similarity.indexDelete`,
 * shared with the minhash index via IndexTombstones), per-family
 * vacuum:
 *
 *  - a delete is purely additive: pre-existing index files untouched,
 *    new files only under `_tombstones`;
 *  - deleted ids disappear from probe results WITHOUT eating top-k
 *    slots (the mask runs before ranking, so the top-k refills from
 *    live rows) — anti-vacuity: the deleted set is chosen from the
 *    pre-delete top-k, so the mask is provably load-bearing;
 *  - for the seeded banded-LSH index, probe-after-delete EQUALS
 *    probe-after-rebuild over the live corpus (pure seeded codes —
 *    the same exactness class as the minhash contract);
 *  - for the frozen-parameter families (IVF/PQ/SQ8 — a rebuild refits
 *    the model, so rebuild-equality is not the contract), vacuum is
 *    the exactness anchor: probe-after-vacuum ≡ probe-after-delete
 *    (mask and physical drop are the same predicate), tombstones are
 *    cleared, masked rows are physically gone, and the frozen
 *    parameter table is carried verbatim.
 */
class AnnIndexDeleteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def queryVec: Array[Double] =
    emb.filter(col("vec_id") === 0L)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
      .head().getSeq[Double](0).toArray

  private def assertTombstoneOnly(before: Map[String, Long],
      after: Map[String, Long]): Unit = {
    val touched = before.filter { case (f, sz) => !after.get(f).contains(sz) }
    assert(touched.isEmpty, s"delete rewrote pre-existing files: $touched")
    val newFiles = after.keySet.diff(before.keySet)
    assert(newFiles.nonEmpty, "delete added no tombstone files")
    assert(newFiles.forall(_.contains("_tombstones")),
      s"delete wrote outside _tombstones: ${newFiles.filterNot(_.contains("_tombstones"))}")
  }

  private def deleteIds(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("vec_id")
  }

  test("banded ANN: tombstone-only commit, probe == rebuild over live") {
    val root = graft.Scratch.tempDir("graft_del_ann")
    val idx = root + "/idx"
    val rebuilt = root + "/rebuilt"
    Similarity.annIndexWrite(emb, "vec_id", "embedding", idx, dim = 64)
    val q = queryVec
    def top(p: String) =
      Similarity.annProbe(spark, p, "vec_id", q, k = 10, dim = 64,
          excludeId = Some(0L))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val preDelete = top(idx)
    // delete the current top-k's ids: the strongest anti-vacuity choice
    val doomed = preDelete.map(_._1).toSeq.sorted.take(5)

    val before = graft.Scratch.parquetFiles(root)
    Similarity.indexDelete(deleteIds(doomed), idx, "vec_id")
    val after = graft.Scratch.parquetFiles(root)
    assertTombstoneOnly(before, after)

    val pa = top(idx)
    assert(pa.nonEmpty)
    assert(pa != preDelete, "deleting top-k members changed nothing")
    assert(pa.forall { case (id, _) => !doomed.contains(id) })
    // top-k refilled from live rows, not truncated by the mask
    assert(pa.size == preDelete.size)

    Similarity.annIndexWrite(
      emb.join(deleteIds(doomed), Seq("vec_id"), "left_anti"),
      "vec_id", "embedding", rebuilt, dim = 64)
    assert(pa == top(rebuilt))
  }

  test("banded ANN: tombstone masks rows appended after the delete") {
    val slice = emb.filter(col("vec_id") % 10 === 9)
    val base = emb.filter(col("vec_id") % 10 =!= 9)
    val idx = graft.Scratch.tempDir("graft_del_ann_mask") + "/idx"
    Similarity.annIndexWrite(base, "vec_id", "embedding", idx, dim = 64)
    val q = queryVec
    def top() = Similarity.annProbe(spark, idx, "vec_id", q, k = 10,
        dim = 64, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val without = top()
    Similarity.indexDelete(
      slice.select(col("vec_id")), idx, "vec_id")
    Similarity.annIndexAppend(slice, "vec_id", "embedding", idx, dim = 64)
    assert(top() == without,
      "append after delete became visible — tombstone must mask the id " +
        "until vacuum")
  }

  test("banded ANN vacuum: parity, tombstones cleared, re-appendable") {
    val root = graft.Scratch.tempDir("graft_del_ann_vac")
    val idx = root + "/idx"
    val vacd = root + "/vacuumed"
    Similarity.annIndexWrite(emb, "vec_id", "embedding", idx, dim = 64)
    val doomed = emb.filter(col("vec_id") % 10 === 9)
    Similarity.indexDelete(doomed.select(col("vec_id")), idx, "vec_id")
    val q = queryVec
    def top(p: String) =
      Similarity.annProbe(spark, p, "vec_id", q, k = 10, dim = 64,
          excludeId = Some(0L))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val masked = top(idx)

    Similarity.annIndexVacuum(spark, idx, vacd, "vec_id")
    assert(top(vacd) == masked, "vacuum changed probe results")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(vacd + "_tombstones")),
      "vacuum carried tombstones over")
    val liveIds = spark.read.parquet(Similarity.annVecsPath(vacd))
      .select(col("vec_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(liveIds.nonEmpty && liveIds.forall(_ % 10 != 9))

    // re-append the slice: visible again, index equals a full build
    Similarity.annIndexAppend(doomed, "vec_id", "embedding", vacd, dim = 64)
    val full = graft.Scratch.tempDir("graft_del_ann_full") + "/idx"
    Similarity.annIndexWrite(emb, "vec_id", "embedding", full, dim = 64)
    assert(top(vacd) == top(full))
  }

  test("IVF: delete drops from probe, vacuum is exact and carries centroids") {
    val root = graft.Scratch.tempDir("graft_del_ivf")
    val idx = root + "/idx"
    val vacd = root + "/vacuumed"
    Similarity.ivfIndexWrite(emb, "vec_id", "embedding", idx)
    val q = queryVec
    def top(p: String) =
      Similarity.ivfProbe(spark, p, "vec_id", q, k = 10, nProbe = 2,
          excludeId = Some(0L))
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    val preDelete = top(idx)
    val doomed = preDelete.map(_._1).toSeq.sorted.take(5)

    val before = graft.Scratch.parquetFiles(root)
    Similarity.indexDelete(deleteIds(doomed), idx, "vec_id")
    assertTombstoneOnly(before, graft.Scratch.parquetFiles(root))

    val masked = top(idx)
    assert(masked.nonEmpty && masked != preDelete)
    assert(masked.forall { case (id, _) => !doomed.contains(id) })
    assert(masked.size == preDelete.size, "top-k did not refill")

    Similarity.ivfIndexVacuum(spark, idx, vacd, "vec_id")
    assert(top(vacd) == masked, "vacuum changed probe results")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(vacd + "_tombstones")))
    // frozen centroids carried verbatim
    val srcC = spark.read.parquet(idx.stripSuffix("/") + "_centroids")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    val dstC = spark.read.parquet(vacd.stripSuffix("/") + "_centroids")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    assert(srcC == dstC, "vacuum changed the frozen centroid table")
    val live = spark.read.parquet(vacd)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(doomed.forall(!live.contains(_)), "masked rows survived vacuum")
  }

  test("PQ: delete drops from probe, vacuum is exact and carries the codebook") {
    val root = graft.Scratch.tempDir("graft_del_pq")
    val idx = root + "/idx"
    val vacd = root + "/vacuumed"
    Similarity.pqIndexWrite(emb, "vec_id", "embedding", idx, dim = 64)
    val q = queryVec
    def top(p: String) =
      Similarity.pqProbe(spark, p, emb, "vec_id", "embedding", q, k = 10,
          excludeId = Some(0L))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val preDelete = top(idx)
    val doomed = preDelete.map(_._1).toSeq.sorted.take(5)

    val before = graft.Scratch.parquetFiles(root)
    Similarity.indexDelete(deleteIds(doomed), idx, "vec_id")
    assertTombstoneOnly(before, graft.Scratch.parquetFiles(root))

    val masked = top(idx)
    assert(masked.nonEmpty && masked != preDelete)
    assert(masked.forall { case (id, _) => !doomed.contains(id) })
    assert(masked.size == preDelete.size, "top-k did not refill")

    Similarity.pqIndexVacuum(spark, idx, vacd)
    assert(top(vacd) == masked, "vacuum changed probe results")
    val srcCb = spark.read.parquet(idx.stripSuffix("/") + "_codebook")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .toSet
    val dstCb = spark.read.parquet(vacd.stripSuffix("/") + "_codebook")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(srcCb == dstCb, "vacuum changed the frozen codebook")
  }

  test("SQ8: delete drops from probe, vacuum is exact and carries the grid") {
    val root = graft.Scratch.tempDir("graft_del_sq8")
    val idx = root + "/idx"
    val vacd = root + "/vacuumed"
    Similarity.sq8IndexWrite(emb, "vec_id", "embedding", idx, dim = 64)
    val q = queryVec
    def top(p: String) =
      Similarity.sq8Probe(spark, p, emb, "vec_id", "embedding", q, k = 10,
          excludeId = Some(0L))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val preDelete = top(idx)
    val doomed = preDelete.map(_._1).toSeq.sorted.take(5)

    val before = graft.Scratch.parquetFiles(root)
    Similarity.indexDelete(deleteIds(doomed), idx, "vec_id")
    assertTombstoneOnly(before, graft.Scratch.parquetFiles(root))

    val masked = top(idx)
    assert(masked.nonEmpty && masked != preDelete)
    assert(masked.forall { case (id, _) => !doomed.contains(id) })
    assert(masked.size == preDelete.size, "top-k did not refill")

    Similarity.sq8IndexVacuum(spark, idx, vacd)
    assert(top(vacd) == masked, "vacuum changed probe results")
    val srcP = spark.read.parquet(idx.stripSuffix("/") + "_params")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSet
    val dstP = spark.read.parquet(vacd.stripSuffix("/") + "_params")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(srcP == dstP, "vacuum changed the frozen quantization grid")
  }
}
