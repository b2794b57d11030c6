package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * The exact all-pairs oracle anchors must refuse to start above the
 * configured row threshold — at corpus scale they are the queries a
 * user must not run, and "slow" is the wrong failure mode for O(n²).
 */
class ScaleGuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def vecs(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, Array.fill(4)(i.toFloat + 1)))
      .toDF("vec_id", "embedding")
  }

  test("anchors refuse oversized inputs, naming the blocked sibling") {
    spark.conf.set(ScaleGuard.ConfKey, "10")
    try {
      val e1 = intercept[IllegalStateException] {
        Dedup.embeddingNearDupPairs(vecs(11), "vec_id", "embedding", 0.9)
      }
      assert(e1.getMessage.contains("dedup_embedding_lsh"))
      val e2 = intercept[IllegalStateException] {
        Similarity.knnJoin(vecs(11), "vec_id", "embedding", 3)
      }
      assert(e2.getMessage.contains("knn_join_blocked"))
    } finally spark.conf.unset(ScaleGuard.ConfKey)
  }

  test("inputs at or under the threshold pass through unchanged") {
    spark.conf.set(ScaleGuard.ConfKey, "10")
    try {
      assert(Similarity.knnJoin(vecs(10), "vec_id", "embedding", 2).count() > 0)
    } finally spark.conf.unset(ScaleGuard.ConfKey)
  }

  test("-1 disables the guard for intentional exact sweeps") {
    spark.conf.set(ScaleGuard.ConfKey, "-1")
    try {
      assert(Similarity.knnJoin(vecs(12), "vec_id", "embedding", 2).count() > 0)
    } finally spark.conf.unset(ScaleGuard.ConfKey)
  }
}
