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

  test("NULL values are ignored and a NULL group ranks like any other") {
    // percentile() semantics: null v never shifts a rank; null group
    // key forms its own group (null-safe joins must carry it through)
    val rows: Seq[(String, java.lang.Double, Long)] =
      (1 to 50).map(i => ("a", java.lang.Double.valueOf(i.toDouble), i.toLong)) ++
        Seq(("a", null: java.lang.Double, 51L), ("a", null: java.lang.Double, 52L)) ++
        (1 to 30).map(i => (null: String, java.lang.Double.valueOf(i * 2.0), 100L + i))
    val df = rows.toDF("g", "v", "id").repartition(5)
    val got = Quantiles.exactPercentilesByGroup(df, "g", "v", Seq("id"),
        Seq("p50" -> 0.5, "p90" -> 0.9))
      .collect().map(r => Option(r.getString(0)) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    val want = df.groupBy(col("g")).agg(
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.9)").as("p90"))
      .collect().map(r => Option(r.getString(0)) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet) // includes None (the null group)
    got.keySet.foreach { g =>
      assert(math.abs(got(g)._1 - want(g)._1) < 1e-9 &&
        math.abs(got(g)._2 - want(g)._2) < 1e-9, s"group $g: got ${got(g)} want ${want(g)}")
    }
  }

  test("a NULL tie column never scatters a group (bounds exclude ties)") {
    val rows: Seq[(String, Double, java.lang.Long)] =
      (1 to 200).map { i =>
        val tie: java.lang.Long = if (i % 3 == 0) null else java.lang.Long.valueOf(i.toLong)
        ("g", (i % 17).toDouble, tie)
      }
    val df = rows.toDF("g", "v", "id").repartition(6)
    val got = Quantiles.exactPercentilesByGroup(df, "g", "v", Seq("id"),
      Seq("p50" -> 0.5)).collect().head.getDouble(1)
    val want = df.selectExpr("percentile(v, 0.5)").collect().head.getDouble(0)
    assert(math.abs(got - want) < 1e-9)
  }

  test("out-of-range quantiles are rejected eagerly") {
    val df = Seq(("g", 1.0, 1L)).toDF("g", "v", "id")
    intercept[IllegalArgumentException] {
      Quantiles.exactPercentilesByGroup(df, "g", "v", Seq("id"), Seq("bad" -> 1.5))
    }
    intercept[IllegalArgumentException] {
      Quantiles.exactPercentilesByGroup(df, "g", "v", Seq("id"), Seq("bad" -> -0.1))
    }
  }

  test("no localCheckpoint / ExistingRDD anywhere in the plan") {
    val df = (1 to 500).map(i => ("g" + (i % 3), i.toDouble, i.toLong))
      .toDF("g", "v", "id")
    val p = Quantiles.exactPercentilesByGroup(df, "g", "v", Seq("id"),
      Seq("p50" -> 0.5)).queryExecution.executedPlan.toString
    assert(!p.contains("ExistingRDD"), "plan still materializes a checkpoint")
  }
}
