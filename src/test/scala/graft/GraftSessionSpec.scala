package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {

  test("extensions register dot_product_d for SQL users") {
    // extensions only apply to a freshly-built session
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = GraftSession.builder(cores = 4).getOrCreate()
    try {
      val v = spark.sql(
        "SELECT dot_product_d(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head().getDouble(0)
      assert(v == 11.0)
      // SQL hyperplane_code == the Scala API's codes (same seed/planes)
      import org.apache.spark.sql.functions._
      val df = spark.range(1).select(
        expr("array(0.5d, -1.25d, 2.0d, 0.1d)").as("v"))
      val sqlCode = df.selectExpr("hyperplane_code(v, 4, 8, 42) AS c")
        .head().getLong(0)
      val apiCode = df.select(
        graft.operators.Similarity.hyperplaneCode(col("v"), dim = 4,
          nPlanes = 8, seed = 42L).as("c")).head().getLong(0)
      assert(sqlCode == apiCode)
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
