package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      EtlQueries.queries ++
      TrainingDataQueries.queries ++
      TemporalQueries.queries ++
      graft.streaming.EventStreams.queries ++
      graft.operators.Multimodal.queries

  /** DuckDB-runnable oracle SQL per query (same column aliases). */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++
      EtlQueries.oracleSql ++
      TrainingDataQueries.oracleSql ++
      TemporalQueries.oracleSql ++
      graft.streaming.EventStreams.oracleSql ++
      graft.operators.Multimodal.oracleSql
}
