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
   *
   * NOTE: row-local and interpreted (transform/slice are higher-order
   * functions) — fine for small ad-hoc use; bulk dedup paths use
   * `Dedup.shingleHashes` (posexplode + lead(), fully codegen'd)
   * instead.
   */
  def wordShingles(text: Column, n: Int): Column = {
    val ws = words(text)
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => array_join(slice(ws, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

}
