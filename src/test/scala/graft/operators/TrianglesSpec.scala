package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class TrianglesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def count(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    import spark.implicits._
    val r = Triangles.triangleCount(edges.toDF("a", "b"), "a", "b").head()
    (r.getLong(0), r.getLong(1), r.getLong(3))
  }

  test("known motifs") {
    // K4: 4 triangles
    assert(count(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
      == (4L, 6L, 4L))
    // star: wedges but no closures
    assert(count(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))) == (5L, 4L, 0L))
    // one triangle with a tail; duplicate + reversed edges collapse
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 4L), (2L, 1L)))
      == (4L, 4L, 1L))
  }

  test("matches brute force on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val norm = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = norm.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    var brute = 0L
    for {
      i <- nodes.indices; j <- i + 1 until nodes.length; k <- j + 1 until nodes.length
      if norm((nodes(i), nodes(j))) && norm((nodes(j), nodes(k))) &&
        norm((nodes(i), nodes(k)))
    } brute += 1
    val (_, nEdges, nTri) = count(edges)
    assert(nEdges == norm.size)
    assert(nTri == brute, s"engine $nTri vs brute $brute")
  }

  test("wedge guard refuses over-budget graphs by name") {
    import spark.implicits._
    // K10: oriented wedge total = C(10,3)·3/3 = Σ C(out_i, 2) = 120.
    // (A star, by contrast, is the motif the orientation DEFUSES: every
    // leaf orients toward the hub, out-degrees are all 1, wedges 0 —
    // that's the skew claim, asserted below.)
    val k10 = (for {
      a <- 0L until 10L; b <- a + 1 until 10L
    } yield (a, b)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Triangles.triangleCount(k10, "a", "b", maxWedges = 10)
    }
    assert(e.getMessage.contains("maxWedges"))

    val star = (1L to 1000L).map(i => (0L, i)).toDF("a", "b")
    val r = Triangles.triangleCount(star, "a", "b", maxWedges = 10).head()
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L,
      "a star must produce zero oriented wedges regardless of hub degree")
  }
}
