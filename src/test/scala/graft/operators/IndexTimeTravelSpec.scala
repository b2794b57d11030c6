package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Time-travel reads over the manifest-committed index family: every
 * commit/replace is a numbered snapshot, `readTableAt` opens exactly
 * the files a PINNED version named, and the retention-aware orphan
 * sweep decides how much history stays reclaimable — the
 * reproducibility contract (re-run an audit against the index it
 * actually probed) and its storage cost, stated together.
 */
class IndexTimeTravelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def ids(df: DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("append history: each version reads exactly its committed rows") {
    val base = emb.filter(col("vec_id") % 4 < 2)
    val b1 = emb.filter(col("vec_id") % 4 === 2)
    val b2 = emb.filter(col("vec_id") % 4 === 3)
    val idx = graft.Scratch.tempDir("graft_tt_ivf") + "/idx"
    Similarity.ivfpqIndexWrite(base, "vec_id", "embedding", idx, dim = 64)
    Similarity.ivfpqIndexAppend(b1, "vec_id", "embedding", idx)
    Similarity.ivfpqIndexAppend(b2, "vec_id", "embedding", idx)

    val vs = IndexManifest.versions(spark, idx)
    assert(vs == Seq(0L, 1L, 2L), s"expected versions 0,1,2, got $vs")

    val baseIds = base.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val b1Ids = b1.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val b2Ids = b2.select(col("vec_id")).collect().map(_.getLong(0)).toSet

    assert(ids(IndexManifest.readTableAt(spark, idx, "", 0L)) == baseIds)
    assert(ids(IndexManifest.readTableAt(spark, idx, "", 1L)) == baseIds ++ b1Ids)
    assert(ids(IndexManifest.readTableAt(spark, idx, "", 2L)) ==
      baseIds ++ b1Ids ++ b2Ids)
    // the head read and the pinned head version agree
    assert(ids(IndexManifest.readTable(spark, idx, "")) ==
      ids(IndexManifest.readTableAt(spark, idx, "", 2L)))

    val err = intercept[IllegalStateException] {
      IndexManifest.readTableAt(spark, idx, "", 7L)
    }
    assert(err.getMessage.contains("never committed"))
  }

  test("replace history: retention decides whether old versions stay readable") {
    val root = graft.Scratch.tempDir("graft_tt_rep") + "/snap"
    import spark.implicits._
    def publish(tag: String): Unit = {
      val staging = IndexManifest.stagingRoot(root) + "/" + tag
      Seq((1L, tag), (2L, tag)).toDF("id", "tag")
        .write.mode("overwrite").parquet(staging)
      IndexManifest.replace(spark, root,
        IndexManifest.promoteStaged(spark, root, staging))
    }
    publish("v0-state")
    publish("v1-state")

    // both versions readable while their files survive
    assert(IndexManifest.readTableAt(spark, root, "", 0L)
      .select("tag").collect().map(_.getString(0)).toSet == Set("v0-state"))
    assert(IndexManifest.readTableAt(spark, root, "", 1L)
      .select("tag").collect().map(_.getString(0)).toSet == Set("v1-state"))

    // retain=2 protects v0's files; the default head-only sweep names them
    assert(IndexManifest.orphans(spark, root, Seq(""), retainVersions = 2).isEmpty)
    val reclaimable = IndexManifest.orphans(spark, root, Seq(""))
    assert(reclaimable.nonEmpty, "superseded snapshot files should be orphans at retain=1")
    val v0Files = IndexManifest.readAt(spark, root, 0L).get.toSet
    assert(reclaimable.toSet == v0Files,
      "head-only sweep must name exactly the superseded version's files")
  }
}
