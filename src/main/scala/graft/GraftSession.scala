package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.functions.DotProductD

/**
 * Session extension + factory. `GraftExtensions` registers the
 * library's native expressions with the SQL function registry so pure
 * SQL users get them too:
 *
 *   SparkSession.builder().withExtensions(new GraftExtensions) ...
 *   spark.sql("SELECT dot_product_d(a.embedding, b.embedding) ...")
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product_d"),
      new ExpressionInfo(classOf[DotProductD].getName, "dot_product_d"),
      (exprs: Seq[Expression]) => DotProductD(exprs.head, exprs(1))))
  }
}

object GraftSession {
  /**
   * Recommended local-mode session: AQE on, shuffle parallelism sized
   * to the machine (not the 200 default), UTC, extensions installed.
   * On a cluster the same confs apply minus the master override.
   */
  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
}
