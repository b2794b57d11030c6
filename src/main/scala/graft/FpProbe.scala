package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
object FpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    def planOnce(i: Int): String = {
      val counted = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").groupBy().count()
      counted.collect()
      val executed = counted.queryExecution.executedPlan
      val fin = executed match { case a: AdaptiveSparkPlanExec => a.executedPlan; case p => p }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      fin.toString
    }
    val p1 = planOnce(1); val p2 = planOnce(2)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"/tmp/plan_${name}_1.txt"), p1)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"/tmp/plan_${name}_2.txt"), p2)
    println("WROTE " + name)
    spark.stop()
  }
}
