package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The self-checking registry forms (recall floors, estimator bounds,
 * set equalities) aggregate over the EXACT sibling's rows — over an
 * empty exact set every bound holds vacuously. Each self-check
 * therefore emits a `nonempty` flag the DuckDB oracle pins TRUE: this
 * spec feeds an EMPTY corpus through the self-checks and proves the
 * flag actually flips to false (so emptied testdata fails the oracle
 * loudly), and stays true on the real sf0.001 tables.
 */
class SelfCheckSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Write structurally-valid but EMPTY documents/embeddings tables. */
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_sf").toString
    val src = "/root/testdata/sf0.001"
    Seq("documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def flag(name: String, dir: String, colName: String): Boolean =
    SparkEntry.queries(name)(spark, dir)
      .select(col(colName)).head().getBoolean(0)

  test("nonempty flags are TRUE on real data (the oracle pins them)") {
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_lsh",
        "knn_join_blocked", "ann_lsh"))
      assert(flag(q, dir, "nonempty"), s"$q.nonempty false on real data")
  }

  test("an emptied exact side flips nonempty to false — loud, not vacuous") {
    // ivf_ann is excluded: its KMeans fit is undefined on an empty
    // corpus and throws before the fold (an equally loud failure)
    for (q <- Seq("dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_lsh",
        "knn_join_blocked", "ann_lsh")) {
      assert(!flag(q, emptyDir, colName = "nonempty"),
        s"$q.nonempty stayed true on an EMPTY corpus — vacuity guard broken")
    }
  }
}
