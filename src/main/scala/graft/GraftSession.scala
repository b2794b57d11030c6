package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.functions.{DotProductD, HyperplaneCodeD}

/**
 * Session extension + factory. `GraftExtensions` registers the
 * library's native expressions with the SQL function registry so pure
 * SQL users get them too:
 *
 *   SparkSession.builder().withExtensions(new GraftExtensions) ...
 *   spark.sql("SELECT dot_product_d(a.embedding, b.embedding) ...")
 *   spark.sql("SELECT hyperplane_code(embedding, 64, 16, 42) ...")
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product_d"),
      new ExpressionInfo(classOf[DotProductD].getName, "dot_product_d"),
      (exprs: Seq[Expression]) => DotProductD(exprs.head, exprs(1))))
    // hyperplane_code(vec, dim, nPlanes, seed): the plane matrix is a
    // model parameter derived from (dim, nPlanes, seed) — literal args,
    // evaluated at resolution time, same seeded convention as
    // Similarity.hyperplaneCode so SQL and Scala codes are identical
    e.injectFunction((
      FunctionIdentifier("hyperplane_code"),
      new ExpressionInfo(classOf[HyperplaneCodeD].getName, "hyperplane_code"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4,
          "usage: hyperplane_code(vec, dim, nPlanes, seed) with literal ints")
        def lit(i: Int): Long = {
          require(exprs(i).foldable, s"hyperplane_code arg $i must be a literal")
          exprs(i).eval().asInstanceOf[Number].longValue()
        }
        val dim = lit(1).toInt
        val nPlanes = lit(2).toInt
        val rng = new scala.util.Random(lit(3))
        val planes = Array.fill(nPlanes, dim)(rng.nextGaussian())
        HyperplaneCodeD(Cast(exprs.head, ArrayType(DoubleType)),
          planes.flatten, nPlanes)
      }))
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
