package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge between Catalyst `Expression`s and user-facing `Column`s.
 * `classic.ExpressionUtils` is `private[sql]`, so this lives in an
 * `org.apache.spark.sql` subpackage — the established pattern for
 * libraries that add native expressions (cf. how external Spark
 * extensions expose package-private constructors).
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
