package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Column-level counterpart of the reference's `NumberWithScale`
 * (`NumberWithScale.py:1-65` in zuyezheng/solana-etl): an exact
 * decimal carried as struct<v: bigint, scale: int>. Sums of int64 are
 * associative — aggregation order (hence parallelism) can never drift
 * the result, unlike double sums. Arithmetic requires matching scales,
 * like the reference's operators returning NotImplemented on
 * mismatch — here mismatches produce null, surfacing in data quality
 * checks instead of silently mixing scales.
 */
object ScaledNumber {

  val LamportScale = 9

  def make(v: Column, scale: Column): Column =
    struct(v.cast("long").as("v"), scale.cast("int").as("scale"))

  def lamports(v: Column): Column = make(v, lit(LamportScale))

  private def sameScale(a: Column, b: Column)(out: => Column): Column =
    when(a("scale") === b("scale"), out)

  def plus(a: Column, b: Column): Column =
    sameScale(a, b)(make(a("v") + b("v"), a("scale")))

  def minus(a: Column, b: Column): Column =
    sameScale(a, b)(make(a("v") - b("v"), a("scale")))

  def absScaled(a: Column): Column = make(abs(a("v")), a("scale"))

  def zero(a: Column): Column = make(lit(0L), a("scale"))

  /** `NumberWithScale.float`: the value scaled down to a double. */
  def toDouble(a: Column): Column =
    a("v").cast("double") / pow(lit(10.0), a("scale").cast("double"))

  /** Exact aggregate: sum the int64 parts, keep the (uniform) scale. */
  def sumScaled(a: Column): Column =
    make(sum(a("v")), first(a("scale")))
}
