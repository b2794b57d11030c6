package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

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

/**
 * All `nPlanes` random-hyperplane sign bits in ONE codegen'd pass over
 * the vector: bit p = (v · plane_p ≥ 0). The planes matrix is a model
 * parameter (seeded, driver-built) carried as a flat `double[]`
 * reference object — not literal expression trees, so the optimizer
 * can't re-inline the input vector's construction once per plane (the
 * round-1 formulation paid 16 interpreted aggregate/zip_with chains
 * plus 16× CollapseProject duplication of the upstream cast).
 */
case class HyperplaneCodeD(child: Expression, planes: Array[Double],
    nPlanes: Int) extends UnaryExpression {

  private val dim = planes.length / nPlanes

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_code_d"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    var code = 0L
    var p = 0
    while (p < nPlanes) {
      val base = p * dim
      var s = 0.0
      var i = 0
      while (i < n) { s += planes(base + i) * v.getDouble(i); i += 1 }
      if (s >= 0) code |= (1L << p)
      p += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val code = ctx.freshName("code")
      s"""
        int $n = java.lang.Math.min($v.numElements(), $dim);
        long $code = 0L;
        for (int $p = 0; $p < $nPlanes; $p++) {
          int $base = $p * $dim;
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $s += $planesRef[$base + $i] * $v.getDouble($i);
          }
          if ($s >= 0) $code |= (1L << $p);
        }
        ${ev.value} = $code;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge

  /** Codegen'd dot product of two array<double> columns. */
  def dotd(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductD(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  /** Codegen'd hyperplane sign-bit code; `planes` is row-major (plane, dim). */
  def hyperplaneCode(v: Column, planes: Array[Array[Double]]): Column = {
    require(planes.nonEmpty && planes.map(_.length).distinct.length == 1,
      "planes must be a non-empty rectangular matrix")
    ColumnBridge.column(HyperplaneCodeD(
      ColumnBridge.expression(v.cast("array<double>")),
      planes.flatten, planes.length))
  }
}
