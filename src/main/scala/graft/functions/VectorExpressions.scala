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

/**
 * Product-quantization encode, all subspaces in ONE codegen'd pass:
 * the vector is split into `m` contiguous subvectors of `subDim`
 * dims; each is assigned its nearest (L2) centroid out of `ksub`
 * from that subspace's codebook, and the `m` centroid ids — each
 * `log2(ksub)` bits — pack into a single LONG. With the library
 * defaults (m=16, ksub=16) a 64-dim float vector compresses to one
 * 8-byte code: the compressed-domain scan unit of `Similarity.pqAnn`.
 * The codebook is a model parameter (driver-trained) carried as a
 * flat `double[]` reference object, laid out [sub][centroid][dim].
 */
case class PqEncodeL(child: Expression, codebook: Array[Double],
    m: Int, ksub: Int, subDim: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_encode_l"
  private val bits = java.lang.Integer.numberOfTrailingZeros(ksub)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var code = 0L
    var s = 0
    while (s < m) {
      val off = s * subDim
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val cOff = (s * ksub + c) * subDim
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val x = v.getDouble(off + i) - codebook(cOff + i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      code |= best.toLong << (s * bits)
      s += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val code = ctx.freshName("code")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val off = ctx.freshName("off")
      val cOff = ctx.freshName("cOff")
      s"""
        long $code = 0L;
        for (int $s = 0; $s < $m; $s++) {
          int $off = $s * $subDim;
          int $best = 0;
          double $bestD = Double.MAX_VALUE;
          for (int $c = 0; $c < $ksub; $c++) {
            int $cOff = ($s * $ksub + $c) * $subDim;
            double $d = 0.0;
            for (int $i = 0; $i < $subDim; $i++) {
              double $x = $v.getDouble($off + $i) - $cbRef[$cOff + $i];
              $d += $x * $x;
            }
            if ($d < $bestD) { $bestD = $d; $best = $c; }
          }
          $code |= ((long) $best) << ($s * $bits);
        }
        ${ev.value} = $code;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Asymmetric-distance lookup over a packed PQ code: the query's
 * per-(subspace, centroid) partial inner products are precomputed
 * driver-side into a flat LUT (`m`×`ksub` doubles — model-parameter
 * sized), and each row's approximate inner product is `m` table
 * lookups indexed by bit-sliced code segments — no vector math, no
 * vector bytes read. This is the PQ scan's entire per-row cost.
 */
case class PqAdcD(child: Expression, lut: Array[Double],
    m: Int, ksub: Int) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_d"
  private val bits = java.lang.Integer.numberOfTrailingZeros(ksub)
  private val mask = ksub - 1

  override def nullSafeEval(input: Any): Any = {
    val code = input.asInstanceOf[Long]
    var s = 0
    var acc = 0.0
    while (s < m) {
      acc += lut(s * ksub + ((code >>> (s * bits)).toInt & mask))
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("lut", lut, "double[]")
    nullSafeCodeGen(ctx, ev, code => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      s"""
        double $acc = 0.0;
        for (int $s = 0; $s < $m; $s++) {
          $acc += $lutRef[$s * $ksub + (int) (($code >>> ($s * $bits)) & $mask)];
        }
        ${ev.value} = $acc;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Scalar (int8) quantization encode, one codegen'd pass: element i
 * maps to `clamp(round((x_i − min_i)·scale_i), 0, 255)` stored as one
 * byte — a 64-dim float vector becomes a 64-byte BINARY (4× smaller
 * than float32, 8× smaller than the double array). min/scale are
 * per-dimension model parameters (driver-computed from one partial-agg
 * min/max pass). A dimension with zero range encodes 0.
 */
case class Sq8EncodeB(child: Expression, mins: Array[Double],
    scales: Array[Double]) extends UnaryExpression {

  private val dim = mins.length

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "sq8_encode_b"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Byte](dim)
    var i = 0
    while (i < n) {
      val q = Math.round((v.getDouble(i) - mins(i)) * scales(i))
      out(i) = Math.max(0L, Math.min(255L, q)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("mins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("scales", scales, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      s"""
        int $n = java.lang.Math.min($v.numElements(), $dim);
        byte[] $out = new byte[$dim];
        for (int $i = 0; $i < $n; $i++) {
          long $q = java.lang.Math.round(
            ($v.getDouble($i) - $minsRef[$i]) * $scalesRef[$i]);
          $out[$i] = (byte) java.lang.Math.max(0L, java.lang.Math.min(255L, $q));
        }
        ${ev.value} = $out;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Asymmetric scalar-quantized inner product: with per-dim decode
 * x̂_i = min_i + code_i·Δ_i, the approximate query inner product
 * Σ q_i·x̂_i folds to `qConst + Σ code_i·w_i` where w_i = q_i·Δ_i and
 * qConst = Σ q_i·min_i — both driver-precomputed model parameters, so
 * the scan's per-row cost is one multiply-add per byte of code and
 * reads NO vector bytes.
 */
case class Sq8AdcD(child: Expression, weights: Array[Double],
    qConst: Double) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_adc_d"

  override def nullSafeEval(input: Any): Any = {
    val code = input.asInstanceOf[Array[Byte]]
    val n = math.min(code.length, weights.length)
    var acc = qConst
    var i = 0
    while (i < n) { acc += (code(i) & 0xff) * weights(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, code => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($code.length, $wRef.length);
        double $acc = $qConst;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ($code[$i] & 0xff) * $wRef[$i];
        }
        ${ev.value} = $acc;
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

  /** Codegen'd PQ encode to one packed long; `codebook` is flat
    * [sub][centroid][dim], `ksub` must be a power of two with
    * m·log2(ksub) ≤ 64. */
  def pqEncode(v: Column, codebook: Array[Double], m: Int, ksub: Int,
      subDim: Int): Column = {
    require(ksub > 0 && (ksub & (ksub - 1)) == 0, "ksub must be a power of two")
    val bits = java.lang.Integer.numberOfTrailingZeros(ksub)
    require(m * bits <= 64, s"$m subspaces x $bits bits exceed one long")
    require(codebook.length == m * ksub * subDim, "codebook shape mismatch")
    ColumnBridge.column(PqEncodeL(
      ColumnBridge.expression(v.cast("array<double>")), codebook, m, ksub, subDim))
  }

  /** Codegen'd ADC lookup: approximate inner product of the encoded
    * row against the query LUT (flat [sub][centroid]). */
  def pqAdc(code: Column, lut: Array[Double], m: Int, ksub: Int): Column = {
    require(lut.length == m * ksub, "lut shape mismatch")
    ColumnBridge.column(PqAdcD(ColumnBridge.expression(code), lut, m, ksub))
  }

  /** Codegen'd int8 scalar-quantization encode to a dim-byte BINARY;
    * `mins`/`scales` are per-dimension model parameters. */
  def sq8Encode(v: Column, mins: Array[Double], scales: Array[Double]): Column = {
    require(mins.length == scales.length && mins.nonEmpty,
      "mins/scales must be same non-empty length")
    ColumnBridge.column(Sq8EncodeB(
      ColumnBridge.expression(v.cast("array<double>")), mins, scales))
  }

  /** Codegen'd SQ8 asymmetric inner product: qConst + Σ code_i·w_i. */
  def sq8Adc(code: Column, weights: Array[Double], qConst: Double): Column =
    ColumnBridge.column(Sq8AdcD(ColumnBridge.expression(code), weights, qConst))
}
