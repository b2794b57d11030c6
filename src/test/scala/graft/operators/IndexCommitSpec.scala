package graft.operators

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Crash-atomicity of the persisted-index APPEND commit protocol
 * (IndexManifest): an append is invisible until its single manifest
 * flip, so killing the writer at ANY earlier boundary leaves the next
 * probe byte-identical to pre-append. The spec simulates each crash
 * state precisely:
 *
 *  - crash BEFORE promote: batch files sit under `_staging/` only —
 *    probes never look there;
 *  - crash AFTER promote, BEFORE commit: batch files live in the real
 *    partition directories but no manifest references them — the
 *    worst case the pre-r10 layout could not survive. Simulated by
 *    running the real append and then rolling the manifest head back
 *    one version (exactly the on-disk state of a writer killed
 *    between promote and commit);
 *  - [[IndexManifest.orphans]] names exactly the uncommitted debris;
 *  - a re-run of the append after the "crash" converges: the next
 *    probe equals a from-scratch rebuild that includes the batch, and
 *    the orphaned files stay invisible forever (no double-candidates,
 *    the failure a blind re-append caused before the manifest).
 */
class IndexCommitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, dir)
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  /** Roll the manifest head back one version — the on-disk state of a
    * writer killed after promoting files but before the commit. */
  private def rollbackManifest(root: String): Unit = {
    val mdir = Paths.get(root, "_manifest")
    val head = Files.list(mdir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("v")).maxBy(_.getFileName.toString)
    Files.delete(head)
  }

  test("minhash append: invisible until the manifest flip, convergent re-run") {
    val base = docs.filter(col("doc_id") % 10 < 6)
    val batch = docs.filter(col("doc_id") % 10 === 6)
    val probeDocs = docs.filter(col("doc_id") % 10 === 9)
    val root = graft.Scratch.tempDir("graft_commit_mh")
    val idx = root + "/idx"
    Dedup.minhashIndexWrite(base, "doc_id", "text", idx)
    val pre = rows(Dedup.minhashProbe(probeDocs, idx, "doc_id", "text"))

    // crash BEFORE promote: staged junk is invisible
    val staging = IndexManifest.stagingRoot(idx) + "/dead-writer"
    batch.limit(5).write.parquet(staging + "/sigs")
    assert(rows(Dedup.minhashProbe(probeDocs, idx, "doc_id", "text")) == pre)
    // a fresh append ignores and never resurrects foreign staging dirs
    // (promoteStaged only touches its own uuid dir)

    // crash AFTER promote, BEFORE commit: run the real append, then
    // roll the manifest back — files are live but uncommitted
    Dedup.minhashIndexAppend(batch, idx, "doc_id", "text")
    rollbackManifest(idx)
    assert(rows(Dedup.minhashProbe(probeDocs, idx, "doc_id", "text")) == pre,
      "uncommitted promoted files leaked into a probe")
    val debris = IndexManifest.orphans(spark, idx, Seq("sigs", "bands"))
    assert(debris.nonEmpty && debris.forall(f =>
      f.startsWith("sigs/") || f.startsWith("bands/")))

    // the recovery every production writer does: re-run the append.
    // Probe must now equal a rebuild that includes the batch, and the
    // orphans must NOT double any candidate (est_jaccard rows would
    // duplicate if the dead files were visible).
    Dedup.minhashIndexAppend(batch, idx, "doc_id", "text")
    val rebuilt = root + "/rebuilt"
    Dedup.minhashIndexWrite(base.unionByName(batch), "doc_id", "text", rebuilt)
    val got = Dedup.minhashProbe(probeDocs, idx, "doc_id", "text")
    assert(rows(got) == rows(
      Dedup.minhashProbe(probeDocs, rebuilt, "doc_id", "text")))
    val pairs = got.select(col("new_id"), col("corpus_id")).collect()
      .map(_.toString)
    assert(pairs.length == pairs.distinct.length,
      "orphaned sig files doubled a candidate")
  }

  test("ann append: invisible until the manifest flip, convergent re-run") {
    val base = emb.filter(col("vec_id") % 4 < 2)
    val batch = emb.filter(col("vec_id") % 4 === 2)
    val q = emb.orderBy(col("vec_id")).limit(1)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    val root = graft.Scratch.tempDir("graft_commit_ann")
    val idx = root + "/idx"
    Similarity.annIndexWrite(base, "vec_id", "embedding", idx, dim = 64)
    def probe() = rows(Similarity.annProbe(spark, idx, "vec_id", q, k = 10,
      dim = 64))
    val pre = probe()

    Similarity.annIndexAppend(batch, "vec_id", "embedding", idx, dim = 64)
    rollbackManifest(idx)
    assert(probe() == pre, "uncommitted ann append leaked into a probe")
    assert(IndexManifest.orphans(spark, idx, Seq("vecs", "bands")).nonEmpty)

    Similarity.annIndexAppend(batch, "vec_id", "embedding", idx, dim = 64)
    val rebuilt = root + "/rebuilt"
    Similarity.annIndexWrite(base.unionByName(batch), "vec_id", "embedding",
      rebuilt, dim = 64)
    assert(probe() == rows(Similarity.annProbe(spark, rebuilt, "vec_id", q,
      k = 10, dim = 64)))
  }

  test("flat family (ivf): append invisible until the flip, convergent re-run") {
    val base = emb.filter(col("vec_id") % 4 < 2)
    val batch = emb.filter(col("vec_id") % 4 === 2)
    val q = emb.orderBy(col("vec_id").desc).limit(1)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    val root = graft.Scratch.tempDir("graft_commit_ivf")
    val idx = root + "/idx"
    Similarity.ivfIndexWrite(base, "vec_id", "embedding", idx, nCentroids = 4)
    def probe() = rows(Similarity.ivfProbe(spark, idx, "vec_id", q, k = 10,
      nProbe = 2))
    val pre = probe()
    Similarity.ivfIndexAppend(batch, "vec_id", "embedding", idx)
    rollbackManifest(idx)
    assert(probe() == pre, "uncommitted ivf append leaked into a probe")
    assert(IndexManifest.orphans(spark, idx, Seq("")).nonEmpty)
    // recovery re-run: the appended batch becomes visible exactly once
    Similarity.ivfIndexAppend(batch, "vec_id", "embedding", idx)
    val ids = Similarity.ivfProbe(spark, idx, "vec_id", q, k = 100000,
        nProbe = 4).select(col("vec_id")).collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length,
      "orphaned ivf files doubled a row")
    // with every cluster probed, exactly base + batch rows are visible
    assert(ids.length == base.count() + batch.count())
  }

  test("manifest read/commit round-trip and version fencing") {
    val root = graft.Scratch.tempDir("graft_commit_mf")
    assert(IndexManifest.read(spark, root).isEmpty)
    val v0 = IndexManifest.commit(spark, root, Seq("t/a.parquet"))
    val v1 = IndexManifest.commit(spark, root, Seq("t/b.parquet"))
    assert(v0 == 0 && v1 == 1)
    assert(IndexManifest.read(spark, root).get ==
      (1L, Seq("t/a.parquet", "t/b.parquet")))
    // snapshot REPLACES the file list in one atomic version flip —
    // versions stay monotone (r11: the old delete-then-recommit shape
    // restarted at v0 through a window with NO manifest at all, where
    // readers fell back to raw directory listing)
    Files.createDirectories(Paths.get(root, "t"))
    Files.write(Paths.get(root, "t", "c.parquet"), Array[Byte](1))
    val v2 = IndexManifest.snapshot(spark, root, Seq("t"))
    assert(v2 == 2L)
    assert(IndexManifest.read(spark, root).get._2 == Seq("t/c.parquet"))
  }

  test("concurrent committers: claim fence keeps both commits' files") {
    // the r10 fence was exists+rename — on a local FS rename OVERWRITES,
    // so two racing committers could both "win" one version and one
    // commit's files silently vanished from the manifest. The r11
    // claim (create-no-overwrite) forces the loser to rebuild on the
    // winner's head: after N racing commits, every file is present.
    val root = graft.Scratch.tempDir("graft_commit_race")
    IndexManifest.commit(spark, root, Seq("t/base.parquet"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            IndexManifest.commit(spark, root, Seq(s"t/race-$i.parquet"))
        })
      }
      val versions = futures.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      // every committer got its own version — no two "won" the same one
      assert(versions.distinct.length == versions.length,
        s"duplicate versions handed out: $versions")
    } finally pool.shutdown()
    val finalFiles = IndexManifest.read(spark, root).get._2.toSet
    val expected = Set("t/base.parquet") ++
      (0 until 8).map(i => s"t/race-$i.parquet")
    assert(finalFiles == expected,
      s"a racing commit's files were dropped: missing ${expected -- finalFiles}")
  }
}
