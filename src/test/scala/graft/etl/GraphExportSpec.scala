package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphExportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val fixture =
    "/root/reference/test/resources/blocks/110130000/110130000.json.gz"

  test("transfer graph export conserves counts and writes importable CSVs") {
    assume(new java.io.File(fixture).exists(), "reference fixture not present")
    val dest = java.nio.file.Files.createTempDirectory("graft_graph").toString
    // materialize the transfers table once through the heavy block
    // parse (whole-stage fusion off per the §3 plan rule; persist()
    // through that scan OOMs), then run everything off the parquet
    val blocks = BlockIngest.read(spark, fixture)
    SolanaTransforms.withBlockEtlPlanning(spark) {
      FileSink.writeParquet(SolanaTransforms.transfers(blocks), s"$dest/transfers")
    }
    val transfers = spark.read.parquet(s"$dest/transfers")

    val edges = GraphExport.transferEdges(transfers)
    val nodes = GraphExport.accountNodes(transfers)

    // every transfer with both endpoints lands in exactly one edge
    val withEndpoints = transfers
      .filter(col("source").isNotNull && col("destination").isNotNull)
    assert(edges.agg(sum(col("n_transfers"))).head().getLong(0)
      == withEndpoints.count())
    // total value conserved per mint (exact integer sums)
    val perMintEdges = edges.groupBy(col("mint"))
      .agg(sum(col("total_value")).as("v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perMintTransfers = withEndpoints.groupBy(col("mint"))
      .agg(sum(col("value")).as("v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perMintEdges == perMintTransfers)
    // nodes cover every edge endpoint
    val nodeKeys = nodes.collect().map(_.getString(0)).toSet
    val endpointKeys = edges.select(col("source")).collect().map(_.getString(0)).toSet ++
      edges.select(col("destination")).collect().map(_.getString(0)).toSet
    assert(endpointKeys.subsetOf(nodeKeys))

    // bulk CSVs: neo4j-admin header convention, row counts match
    GraphExport.writeNeo4jBulk(transfers, dest)
    val nodesCsv = spark.read.option("header", "true").csv(s"$dest/nodes")
    val relsCsv = spark.read.option("header", "true").csv(s"$dest/relationships")
    assert(nodesCsv.columns.toSeq == Seq("key:ID", ":LABEL"))
    assert(relsCsv.columns.toSeq == Seq(":START_ID", ":END_ID", ":TYPE",
      "mint", "scale:int", "n_transfers:long", "total_value:long"))
    assert(nodesCsv.count() == nodes.count())
    assert(relsCsv.count() == edges.count())
  }
}
