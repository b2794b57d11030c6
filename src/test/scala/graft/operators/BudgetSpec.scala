package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Resolution contract of the unified `spark.graft.budget.*`
  * namespace: budget key wins, legacy alias still honored, default
  * otherwise — and the wired operators actually read through it. */
class BudgetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def cleared(keys: String*)(body: => Unit): Unit =
    try body finally keys.foreach(spark.conf.unset)

  test("precedence: budget key > legacy alias > default") {
    val legacy = "spark.graft.allPairs.maxRows"
    val budget = Budget.Prefix + Budget.AllPairsMaxRows
    cleared(legacy, budget) {
      assert(Budget.long(spark, Budget.AllPairsMaxRows, 7L, Some(legacy)) == 7L)
      spark.conf.set(legacy, "11")
      assert(Budget.long(spark, Budget.AllPairsMaxRows, 7L, Some(legacy)) == 11L)
      spark.conf.set(budget, "13")
      assert(Budget.long(spark, Budget.AllPairsMaxRows, 7L, Some(legacy)) == 13L)
    }
  }

  test("ScaleGuard honors both spellings") {
    import spark.implicits._
    val df = (1L to 50L).toDF("id")
    cleared(Budget.Prefix + Budget.AllPairsMaxRows) {
      spark.conf.set(Budget.Prefix + Budget.AllPairsMaxRows, "10")
      val e = intercept[IllegalStateException](
        ScaleGuard.allPairs(df, "op_under_test", "blocked_sibling"))
      assert(e.getMessage.contains("op_under_test"))
    }
    cleared("spark.graft.allPairs.maxRows") {
      spark.conf.set("spark.graft.allPairs.maxRows", "10")
      intercept[IllegalStateException](
        ScaleGuard.allPairs(df, "op_under_test", "blocked_sibling"))
    }
  }

  test("triangle wedge budget reads the namespace when the param is defaulted") {
    import spark.implicits._
    // K5: 5·C(4,2)… oriented wedges = sum over lo of C(d,2) = 10 wedges
    val edges = (for { i <- 1L to 5L; j <- (i + 1) to 5L } yield (i, j))
      .toDF("a", "b")
    cleared(Budget.Prefix + Budget.MaxWedges) {
      spark.conf.set(Budget.Prefix + Budget.MaxWedges, "3")
      val e = intercept[IllegalArgumentException](
        Triangles.triangleCount(edges, "a", "b"))
      assert(e.getMessage.contains("maxWedges=3"))
      // explicit param still wins over the conf
      assert(Triangles.triangleCount(edges, "a", "b", maxWedges = 100L)
        .head().getLong(3) == 10L)
    }
  }
}
