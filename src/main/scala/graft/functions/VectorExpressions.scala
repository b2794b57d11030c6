package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Native Catalyst expression for the vector-math hot path.
 *
 * `zip_with` + `aggregate` express a dot product declaratively, but
 * higher-order functions are interpreted (lambda dispatch per element,
 * boxed accumulators) — on an all-pairs similarity join that's the
 * entire runtime. This expression participates in whole-stage codegen:
 * the generated code is a tight primitive loop over the two
 * ArrayData buffers, keeping pairwise cosine inside one codegen stage
 * with the join that produces the pairs.
 *
 * Elements are assumed non-null (embedding vectors); length mismatch
 * truncates to the shorter side, like zip_with-without-padding.
 */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  // no ExpectsInputTypes (AbstractDataType is private[sql]); callers
  // pass array<double> — graft.functions.VectorFunctions.dotd casts
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge

  /** Codegen'd dot product of two array<double> columns. */
  def dotd(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductD(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
}
