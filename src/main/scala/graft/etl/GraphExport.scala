package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph export ≈ the reference's `GraphBuilder` (`GraphBuilder.py:1-16`
 * — a neo4j loader stub for the coin-transfer graph), completed as a
 * distributed bulk-export: account nodes and TRANSFER edges in the
 * neo4j-admin import CSV convention (`:ID` / `:START_ID` / `:END_ID` /
 * `:TYPE` headers), which the importer ingests offline without a live
 * driver session. A row-at-a-time Cypher loader would be the wrong
 * shape at scale; bulk CSVs from a keyed aggregation are exactly what
 * neo4j-admin (and most graph stores) want for initial loads.
 */
object GraphExport {

  /**
   * One edge per (source, destination, mint): transfer count and total
   * value (exact integer sum; `scale` rides along, NumberWithScale
   * semantics). One keyed shuffle with map-side partial aggregation.
   */
  def transferEdges(transfers: DataFrame): DataFrame =
    transfers
      .filter(col("source").isNotNull && col("destination").isNotNull)
      .groupBy(col("source"), col("destination"), col("mint"), col("scale"))
      .agg(count(lit(1)).as("n_transfers"),
        sum(col("value")).as("total_value"))

  /** Distinct account nodes appearing on either side of a transfer. */
  def accountNodes(transfers: DataFrame): DataFrame =
    transfers.select(col("source").as("key"))
      .unionByName(transfers.select(col("destination").as("key")))
      .filter(col("key").isNotNull)
      .distinct()

  /**
   * Write the neo4j-admin bulk-import layout under `destDir`:
   * `nodes/` (`key:ID`, `:LABEL`) and `relationships/` (`:START_ID`,
   * `:END_ID`, `:TYPE`, typed properties). Headers use the importer's
   * name:type convention so the CSVs load with
   * `neo4j-admin database import full --nodes --relationships`.
   */
  def writeNeo4jBulk(transfers: DataFrame, destDir: String): Unit = {
    accountNodes(transfers)
      .select(col("key").as("key:ID"), lit("Account").as(":LABEL"))
      .write.mode("overwrite").option("header", "true")
      .csv(s"$destDir/nodes")
    transferEdges(transfers)
      .select(
        col("source").as(":START_ID"),
        col("destination").as(":END_ID"),
        lit("TRANSFER").as(":TYPE"),
        col("mint"),
        col("scale").as("scale:int"),
        col("n_transfers").as("n_transfers:long"),
        col("total_value").as("total_value:long"))
      .write.mode("overwrite").option("header", "true")
      .csv(s"$destDir/relationships")
  }
}
