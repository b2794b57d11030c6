package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed exact percentiles must equal the `percentile()`
  * aggregate (which is exact but buffers whole groups in memory). */
class QuantilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("matches percentile() across group sizes, ties, and n=1 groups") {
    // deterministic values with heavy ties; group sizes 1, 7, 1000, 4096
    val rows = Seq(("tiny", Seq(42.0)),
      ("seven", (1 to 7).map(i => (i * 31 % 5).toDouble)),
      ("big", (1 to 1000).map(i => ((i * 2654435761L) % 997).toDouble)),
      ("pow2", (1 to 4096).map(i => ((i * 40503L) % 64).toDouble)))
      .flatMap { case (g, vs) => vs.zipWithIndex.map { case (v, i) => (g, v, i.toLong) } }
    val df = rows.toDF("g", "v", "id").repartition(7) // scatter input
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val got = Quantiles.exactPercentilesByGroup(df, "g", "v", Seq("id"), qs)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val want = df.groupBy(col("g")).agg(
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.9)").as("p90"),
        expr("percentile(v, 0.99)").as("p99"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == want.keySet)
    got.keySet.foreach { g =>
      val (a, b) = (got(g), want(g))
      assert(math.abs(a._1 - b._1) < 1e-9 && math.abs(a._2 - b._2) < 1e-9 &&
        math.abs(a._3 - b._3) < 1e-9, s"group $g: got $a want $b")
    }
  }

  test("quantile endpoints 0.0 and 1.0 return group min and max") {
    val df = (1 to 100).map(i => ("g", i.toDouble, i.toLong))
      .toDF("g", "v", "id")
    val got = Quantiles.exactPercentilesByGroup(df, "g", "v", Seq("id"),
      Seq("lo" -> 0.0, "hi" -> 1.0)).collect().head
    assert(got.getDouble(1) == 1.0 && got.getDouble(2) == 100.0)
  }
}
