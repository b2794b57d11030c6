package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * `spark.graft.checkpointDir` contract: the iterative operators'
 * loop-boundary materializations (CC's per-round edge set, PageRank's
 * lineage window) switch from localCheckpoint to RELIABLE checkpoints
 * rooted in the configured directory — the fault-tolerant deployment
 * shape — and the results are IDENTICAL under either setting.
 */
class CheckpointDirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("CC under a reliable checkpoint dir equals the default, and uses it") {
    import spark.implicits._
    // a graph big enough in rounds: chain + cliques, and force the
    // ITERATIVE path (the driver union-find would bypass the loop)
    val edges = ((0L until 200L).map(i => (i, i + 1)) ++
      Seq((500L, 501L), (501L, 502L), (502L, 500L))).toDF("a", "b")
    val expected = withConf(Dedup.CcLocalMaxEdgesKey -> "-1") {
      Dedup.connectedComponents(edges, "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val ckpt = graft.Scratch.tempDir("graft_ckpt")
    val got = withConf(Dedup.CcLocalMaxEdgesKey -> "-1",
        "spark.graft.checkpointDir" -> ckpt) {
      Dedup.connectedComponents(edges, "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == expected)
    // the loop actually checkpointed into the configured directory
    val any = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.count(java.nio.file.Files.isRegularFile(_))
      } finally walk.close()
    }
    assert(any > 0, s"no reliable checkpoint files written under $ckpt")
  }

  test("PageRank under a reliable checkpoint dir equals the default") {
    val expected = graft.queries.EtlQueries.graphPageRank(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val ckpt = graft.Scratch.tempDir("graft_ckpt_pr")
    val got = withConf("spark.graft.checkpointDir" -> ckpt) {
      graft.queries.EtlQueries.graphPageRank(spark, dir)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    }
    assert(got == expected)
  }
}
