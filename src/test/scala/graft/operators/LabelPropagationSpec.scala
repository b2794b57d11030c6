package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class LabelPropagationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("two cliques joined by one bridge settle into two communities") {
    // clique A: a1..a4 complete; clique B: b1..b4 complete; bridge a1-b1
    def clique(p: String): Seq[(String, String)] =
      (for {
        i <- 1 to 4; j <- (i + 1) to 4
      } yield (s"$p$i", s"$p$j"))
    val edges = (clique("a") ++ clique("b") :+ ("a1", "b1"))
      .toDF("src", "dst")
    val got = LabelPropagation.lpa(edges, "src", "dst", rounds = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // within each clique every node sees the same neighbor multiset
    // after round 1, so min-label ties collapse each clique to "a1"/"b1";
    // the single bridge edge can't outvote 3 in-clique neighbors
    assert(got.filter(_._1.startsWith("a")).values.toSet == Set("a1"))
    assert(got.filter(_._1.startsWith("b")).values.toSet == Set("b1"))
  }

  test("synchronous update: a star adopts the hub's label in one round") {
    val edges = Seq(("h", "x1"), ("h", "x2"), ("h", "x3")).toDF("src", "dst")
    val r1 = LabelPropagation.lpa(edges, "src", "dst", rounds = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // leaves see only the hub; the hub sees {x1,x2,x3} and takes min
    assert(r1 == Map("h" -> "x1", "x1" -> "h", "x2" -> "h", "x3" -> "h"))
  }

  test("reruns are bit-identical") {
    val edges = (1 to 60).map(i => (s"n${i % 20}", s"n${(i * 7) % 20}"))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val a = LabelPropagation.lpa(edges, "src", "dst", rounds = 3).collect().toSeq
    val b = LabelPropagation.lpa(edges, "src", "dst", rounds = 3).collect().toSeq
    assert(a == b)
  }
}
