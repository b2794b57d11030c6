package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text primitives shared by dedup / text-analysis operators. All pure
 * column expressions (codegen'd, no UDFs): they run inside
 * whole-stage codegen and never leave the JVM hot path.
 */
object TextFunctions {

  /** Lowercased whitespace-tokenized words. */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /**
   * Word n-gram shingles (space-joined), empty array when the document
   * has fewer than n words. `sequence` would count DOWN for a negative
   * span, hence the explicit guard.
   */
  def wordShingles(text: Column, n: Int): Column = {
    val ws = words(text)
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => array_join(slice(ws, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /**
   * 64 MinHash signature values over a shingle array: sig_i =
   * min over shingles of xxhash64(i, shingle). One pass, no shuffle —
   * the signature is computed row-local from the shingle array.
   */
  def minhashSignature(shingles: Column, k: Int = 64): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, s => xxhash64(i, s))))

  /**
   * 64-bit SimHash over a token array. Bits accumulated MSB-first via
   * acc*2 (shiftleft takes only literal offsets, so `expr` SQL with a
   * lambda-bound shift is used instead of the Scala DSL). Built as two
   * 32-bit halves OR'd together: a single 64-bit acc*2 chain would
   * overflow at the sign bit under ANSI mode.
   */
  def simhash64(tokenArrayCol: String): Column = {
    def half(hi: Int, lo: Int) = s"""
      aggregate(sequence($hi, $lo, -1), 0L, (acc, b) ->
        acc * 2 + CASE WHEN aggregate(
          transform($tokenArrayCol, t -> xxhash64(t)), 0L,
          (a2, h) -> a2 + CASE WHEN (shiftright(h, b) & 1) = 1
                          THEN 1 ELSE -1 END) > 0
        THEN 1L ELSE 0L END)"""
    expr(s"shiftleft(${half(63, 32)}, 32) | ${half(31, 0)}")
  }
}
