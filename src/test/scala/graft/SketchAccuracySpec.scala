package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Error-bound evidence for the sketch-based queries: both emit their
 * exact counterpart next to the sketch, so the spec simply asserts
 * the relative error the sketch parameters promise (HLL++ at rsd 0.01,
 * approx_percentile at accuracy 1000). Deterministic inputs →
 * deterministic sketches → stable numbers; the bounds leave margin.
 */
class SketchAccuracySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct stays within 5% of the exact count per group") {
    val rows = queries.RelationalQueries.approxDistinctRaw(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(exact > 0)
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.05,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact err=$relErr")
    }
  }

  test("approx_percentile stays within 5% of the exact quantiles per group") {
    val rows = queries.RelationalQueries.approxPercentileRaw(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for ((a, e) <- Seq(("approx_p50", "exact_p50"), ("approx_p99", "exact_p99"))) {
        val approx = r.getAs[Double](a)
        val exact = r.getAs[Double](e)
        assert(exact > 0)
        val relErr = math.abs(approx - exact) / exact
        assert(relErr <= 0.05,
          s"${r.getAs[String]("l_returnflag")} $a: approx=$approx exact=$exact err=$relErr")
      }
    }
  }

  test("registry forms report within_bound = true on every group") {
    for (q <- Seq("q_approx_distinct", "q_approx_percentile")) {
      val rows = SparkEntry.queries(q)(spark, dir).collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getAs[Boolean]("within_bound")), s"$q out of bound")
    }
  }
}
