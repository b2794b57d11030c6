package graft.etl

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * JDBC source against embedded Derby (on the Spark classpath): proves
 * the partitioned read fans out into N concurrent range scans and that
 * filters/pruning push into the generated SQL — the two properties
 * that make a JDBC ingest usable beyond dimension tables.
 */
class JdbcSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val url = {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby")
      .resolve("db").toString
    val u = s"jdbc:derby:$dbDir;create=true"
    val conn = DriverManager.getConnection(u)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE accounts (id BIGINT PRIMARY KEY, balance BIGINT, kind VARCHAR(16))")
      val ps = conn.prepareStatement("INSERT INTO accounts VALUES (?, ?, ?)")
      (0L until 1000L).foreach { i =>
        ps.setLong(1, i); ps.setLong(2, i * 7 % 997)
        ps.setString(3, if (i % 3 == 0) "system" else "user")
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
    u
  }

  test("partitioned read fans out into the requested range scans") {
    val df = JdbcSource.readPartitioned(spark, url, "accounts",
      "id", lower = 0L, upper = 999L, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 1000)
    // every row lands in exactly one stride — totals must reconcile
    assert(df.agg(sum(col("balance"))).head().getLong(0) ==
      (0L until 1000L).map(i => i * 7 % 997).sum)
  }

  test("filters and column pruning push into the JDBC scan") {
    val df = JdbcSource.read(spark, url, "accounts")
      .filter(col("kind") === "system")
      .select(col("id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("KIND"),
      s"filter not pushed into JDBC source:\n$plan")
    assert(df.count() == (0L until 1000L).count(_ % 3 == 0))
  }
}
