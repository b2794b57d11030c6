package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Proves the co-located join layout: two tables bucketed by the join
 * key join WITHOUT any shuffle exchange — the physical plan contains
 * no ShuffleExchange over the join inputs. This is the 100 TB answer
 * to repeated fact⋈fact joins: pay the partitioning once at write
 * time, never again at read time.
 */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** Force the SMJ path with a SCOPED conf: a builder-level
    * autoBroadcastJoinThreshold=-1 would leak into the shared JVM
    * session (getOrCreate applies builder options to an existing
    * session) and flip join strategies for every suite that runs
    * after this one. */
  private def withNoAutoBroadcast[A](f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Drop the table AND its physical location: warehouse.dir is a
    * STATIC conf, so when another suite created the JVM's session
    * first this spec runs against the default ./spark-warehouse — and
    * a leftover directory from a previous JVM (whose in-memory
    * metastore is gone) makes saveAsTable fail LOCATION_ALREADY_EXISTS. */
  private def dropManaged(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(wh, name)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(loc)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
  }

  test("bucketed tables join with zero shuffle exchanges") { withNoAutoBroadcast {
    val dir = "/root/testdata/sf0.001"
    dropManaged("orders_b")
    dropManaged("lineitem_b")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), "o_orderkey")
      .groupBy("o_orderstatus")
      .agg(round(sum(col("l_extendedprice")), 4).as("total"))

    val plan = joined.queryExecution.executedPlan.toString
    val shufflesInJoin = "Exchange hashpartitioning\\(o_orderkey".r
      .findAllIn(plan).size
    assert(shufflesInJoin == 0, s"expected no join-key shuffle, plan:\n$plan")
    assert(joined.count() == 3)
  } }

  test("date-partitioned writes prune partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date(col("ts")))
    events.write.mode("overwrite").partitionBy("day").parquet(s"$dir/events")

    val days = events.select(col("day")).distinct().collect()
      .map(_.getAs[java.sql.Date](0).toString).sorted
    assert(days.length > 1, "fixture needs multiple days to prove pruning")
    val oneDay = spark.read.parquet(s"$dir/events")
      .filter(col("day") === lit(days.head))

    // partition filter must reach the file listing, not a post-scan Filter
    val scan = oneDay.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(day"),
      s"partition filter not pushed, plan:\n$scan")
    assert(oneDay.count() ==
      events.filter(col("day") === lit(days.head)).count())
  }
}
