package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class KCoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // AQE splits each shuffle-stage materialization into its own job,
    // which would make the loop-hygiene job count below a function of
    // plan shape rather than loop structure; results are AQE-agnostic
    .config("spark.sql.adaptive.enabled", "false")
    .getOrCreate()

  /** Reference peel: iteratively drop nodes with < k live neighbors;
    * returns node -> 1-based round removed (0 = in the k-core). */
  private def brutePeel(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    val undirected = edges.filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    var adj = undirected.groupBy(_._1).map { case (n, es) =>
      n -> es.map(_._2).toSet
    }
    var out = Map.empty[Long, Int]
    var round = 1
    var done = false
    while (!done) {
      val dead = adj.collect { case (n, nbrs) if nbrs.size < k => n }.toSet
      if (dead.isEmpty) done = true
      else {
        out ++= dead.map(_ -> round)
        adj = (adj -- dead).map { case (n, nbrs) => n -> (nbrs -- dead) }
        round += 1
      }
    }
    out ++ adj.keys.map(_ -> 0)
  }

  private def peel(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    import spark.implicits._
    KCore.kCorePeel(edges.toDF("a", "b"), "a", "b", k)
      .collect().map(r => r.getString(0).toLong -> r.getInt(1)).toMap
  }

  test("known graph: K4 plus a pendant path, k=2") {
    // K4 on 1..4 is the 2-core; 5 hangs off 4, 6 hangs off 5
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val got = peel(edges, k = 2)
    // 6 has degree 1 -> peeled round 1; then 5 drops to degree 1 -> round 2
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 2, 6L -> 1))
  }

  test("matches brute force on a random graph, several k") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 400).map(_ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
    for (k <- Seq(2, 3, 5)) {
      val got = peel(edges, k)
      val want = brutePeel(edges, k)
      assert(got == want, s"k=$k: engine $got vs brute $want")
    }
  }

  test("loop hygiene: bounded jobs per round, no per-round accumulator I/O") {
    import spark.implicits._
    // a 10-deep pendant chain off a K5 peels one node per round for 10
    // rounds — long enough that an O(rounds x peeled-size) accumulator
    // re-materialization (the pre-r10 shape) would dominate the count
    val core = for {
      i <- 1L to 5L; j <- (i + 1) to 5L
    } yield (i, j)
    val chain = (0 until 10).map(i => (5L + i, 6L + i))
    val edges = (core ++ chain).toDF("a", "b")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val result = KCore.kCorePeel(edges, "a", "b", k = 2)
      // the listener bus is async; settle until the job count is stable
      var prev = -1
      while (jobs.get() != prev) { prev = jobs.get(); Thread.sleep(200) }
      val loopJobs = jobs.get()
      // 10 peel rounds + 1 convergence round. Per non-final round: the
      // survivor checkpoint, its count, and the live-edge checkpoint
      // (3 jobs); the final round pays checkpoint + count. Setup adds a
      // constant (edge/adjacency/alive materializations + alive count).
      // The old shape added >= 1 accumulator checkpoint per round and a
      // dead.isEmpty job per round on top — assert we stayed below it.
      assert(loopJobs <= 3 * 10 + 2 + 8,
        s"peel loop launched $loopJobs jobs — accumulator or probe " +
          "re-materialization crept back in")
      // and the result is still exact
      val got = result.collect()
        .map(r => r.getString(0).toLong -> r.getInt(1)).toMap
      val want = brutePeel(core ++ chain, 2)
      assert(got == want)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
