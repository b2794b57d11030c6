package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the two scale defenses in `Similarity.bandedHalfPairs` on a
 * deliberately degenerate corpus — a large cluster of IDENTICAL
 * vectors, so every band maps the whole cluster into one maximally
 * dense bucket (the dup-dense shape real dedup workloads have):
 *
 *  - first-colliding-band dedup: each unordered pair materializes
 *    exactly once with NO distinct stage, even though a dup pair
 *    collides in every band;
 *  - dense-bucket salting (`maxBucketRows`): buckets over the cap are
 *    split into salt groups for the candidate join — the pair set is
 *    IDENTICAL to the unsalted join's (salting spreads work, it never
 *    drops rows), and the join carries the salt key in its condition.
 */
class DenseBucketSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val bands = 4
  private val planes = 4

  /** 60 identical vectors (one max-dense bucket per band) + 40 distinct. */
  private def fixture: DataFrame = {
    import spark.implicits._
    val dup = (0L until 60L).map(i => (i, Array.fill(8)(1.0f)))
    val rng = new scala.util.Random(7)
    val rest = (60L until 100L).map(i => (i, Array.fill(8)(rng.nextFloat() * 2 - 1)))
    (dup ++ rest).toDF("id", "embedding")
  }

  private def coded(df: DataFrame): DataFrame =
    df.select(col("id"),
      Similarity.hyperplaneCode(
        transform(col("embedding"), _.cast("double")), 8, bands * planes).as("code"))

  test("each candidate pair is emitted exactly once, without a distinct stage") {
    val pairs = Similarity.bandedHalfPairs(coded(fixture), bands, planes,
      maxBucketRows = 16)
    val rows = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.distinct.length,
      "a pair was generated more than once — first-band dedup failed")
    // the 60-dup cluster collides in EVERY band; all its pairs must
    // still appear exactly once each
    val dupPairs = rows.filter { case (a, b) => a < 60 && b < 60 }
    assert(dupPairs.length == 60 * 59 / 2,
      s"expected ${60 * 59 / 2} in-cluster pairs, got ${dupPairs.length}")
    assert(rows.forall { case (a, b) => a < b })
  }

  test("salting dense buckets changes the plan, never the pair set") {
    val base = coded(fixture)
    val unsalted = Similarity.bandedHalfPairs(base, bands, planes,
        maxBucketRows = 1 << 30)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Similarity.bandedHalfPairs(base, bands, planes,
      maxBucketRows = 16)
    assert(salted.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == unsalted, "salting altered the candidate pair set")
    // the salt key must actually reach the join condition
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("salt"), s"no salt key in the candidate join:\n$plan")
  }

  test("the blocked kNN join is invariant to the cap") {
    val emb = fixture
    def run(cap: Int) = Similarity.knnJoinBlocked(emb, "id", "embedding",
        k = 3, dim = 8, bands = bands, planesPerBand = planes,
        maxBucketRows = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(run(16).toSeq == run(1 << 30).toSeq)
  }

  test("candidate-join parallelism is pinned, not inherited from the input") {
    // the banded rows are bytes-tiny, so AQE broadcasts the build side
    // and join task count falls back to the probe side's partitioning —
    // for a single-file corpus that was 1-2 tasks carrying the whole
    // quadratic stage (observed at sf1: 200M pairs on 2 of 32 cores).
    // The probe side must therefore carry an explicit user-numbered
    // repartition on (band, bucket, salt), which AQE cannot coalesce.
    val pairs = Similarity.bandedHalfPairs(coded(fixture.coalesce(1)),
      bands, planes, maxBucketRows = 16)
    val logical = pairs.queryExecution.optimizedPlan.toString
    assert(logical.contains("RepartitionByExpression [band"),
      s"no pinned repartition of the candidate probe side:\n$logical")
    pairs.collect()
    val physical = pairs.queryExecution.executedPlan.toString
    assert(physical.contains("REPARTITION_BY_NUM"),
      s"repartition is not user-numbered (AQE may coalesce it):\n$physical")
  }
}
