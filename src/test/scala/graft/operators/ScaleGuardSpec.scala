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

  test("the guard's eager count costs exactly one count action on a parquet input") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    val src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    spark.sparkContext.addSparkListener(listener)
    try {
      // construction alone runs the guard's count — and nothing else.
      // One count() action = up to 2 Spark jobs under AQE (the map
      // stage materializes as its own job, then the final stage); the
      // assertion documents that bound so a future guard accidentally
      // counting twice (or materializing the quadratic subtree) fails.
      ScaleGuard.allPairs(src, "op", "sibling")
      // listener delivery is async; poll for the first event, then
      // settle briefly to catch any unexpected extra job
      val deadline = System.currentTimeMillis() + 10000
      while (jobs.get() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      Thread.sleep(250)
      assert(jobs.get() >= 1 && jobs.get() <= 2,
        s"expected the guard's single count (1-2 jobs under AQE), saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
