package graft

import org.apache.spark.sql.SparkSession

/**
 * Plan inspection utility: prints the formatted physical plan for the
 * named queries (or all).
 *
 *   sbt "runMain graft.Explain <sfDir> [query ...]"
 */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n===== $name =====")
      // GRAFT_EXPLAIN_MODE=simple shows the *(n) whole-stage-codegen
      // markers that formatted mode omits
      val mode = sys.env.getOrElse("GRAFT_EXPLAIN_MODE", "formatted") match {
        case "simple" => org.apache.spark.sql.execution.SimpleMode
        case _ => org.apache.spark.sql.execution.FormattedMode
      }
      // GRAFT_EXPLAIN_EXEC=1 runs the query first and prints the
      // POST-AQE executed plan (ReusedExchange/QueryStage visible)
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (sys.env.contains("GRAFT_EXPLAIN_EXEC")) {
          // execute df's OWN QueryExecution (so the AQE plan finalizes
          // in place) without materializing the result on the driver:
          // toRdd runs the executed plan and count() ships only
          // per-partition counts back — df.collect() pulled the full
          // result set driver-side just to finalize the plan
          df.queryExecution.toRdd.count()
          println(df.queryExecution.executedPlan.toString)
        } else println(df.queryExecution.explainString(mode))
      }
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
