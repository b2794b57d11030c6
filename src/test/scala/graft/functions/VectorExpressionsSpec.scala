package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("dotd matches the interpreted zip_with/aggregate dot product") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(50)((Array.fill(24)(rng.nextGaussian().toFloat),
      Array.fill(24)(rng.nextGaussian().toFloat)))
    val df = rows.toDF("a", "b")
      .withColumn("native", VectorFunctions.dotd(col("a"), col("b")))
      .withColumn("hof", aggregate(
        zip_with(col("a").cast("array<double>"), col("b").cast("array<double>"),
          (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x))
    // same left-to-right summation order -> bit-identical doubles
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("HyperplaneCodeD matches the per-plane sign-bit formula") {
    val dim = 16
    val nPlanes = 16
    val rng = new scala.util.Random(42)
    val planes = Array.fill(nPlanes, dim)(rng.nextGaussian())
    val data = Seq.fill(100)(Array.fill(dim)(rng.nextGaussian().toFloat))
    val df = data.toDF("v")
      .withColumn("native", VectorFunctions.hyperplaneCode(col("v"), planes))
      .withColumn("hof", (0 until nPlanes).map { p =>
        val plane = array(planes(p).map(w => lit(w)): _*)
        val d = aggregate(
          zip_with(col("v").cast("array<double>"), plane, (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x)
        when(d >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
      }.reduce(_ + _))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("HyperplaneCodeD interpreted eval agrees with codegen") {
    val dim = 8
    val rng = new scala.util.Random(3)
    val planes = Array.fill(4, dim)(rng.nextGaussian())
    val data = Seq.fill(20)(Array.fill(dim)(rng.nextGaussian()))
    val expected = data.map { v =>
      (0 until 4).map { p =>
        val s = (0 until dim).map(i => planes(p)(i) * v(i)).sum
        if (s >= 0) 1L << p else 0L
      }.sum
    }
    val got = data.toDF("v")
      .select(VectorFunctions.hyperplaneCode(col("v"), planes).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected)
  }
}
