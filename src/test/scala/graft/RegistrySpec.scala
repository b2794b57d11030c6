package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries._

/**
 * Driver-contract integrity: Map ++ silently overwrites duplicate
 * keys, an oracle without a query is dead weight, and a query that
 * returns zero rows at the smoke SF would pass the hash compare
 * vacuously. All three are regressions the oracle can't catch.
 */
class RegistrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("no query name collides across groups") {
    val groups = Seq(
      RelationalQueries.queries, EtlQueries.queries,
      TrainingDataQueries.queries, TemporalQueries.queries,
      graft.streaming.EventStreams.queries,
      graft.operators.Multimodal.queries)
    assert(SparkEntry.queries.size == groups.map(_.size).sum)
  }

  test("every oracle belongs to a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("entry and every registry query return rows at the smoke SF") {
    assert(SparkEntry.entry(spark).count() > 0)
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows at sf0.001: $empty")
  }
}
