package graft.operators

import org.apache.spark.util.sketch.CountMinSketch

/**
 * Driver-side helpers for mergeable frequency sketches. The sketches
 * themselves are BUILT distributed (`functions.count_min_sketch` is a
 * partial-aggregating Catalyst aggregate — every executor folds its
 * rows locally and only KB-sized arrays shuffle); what lives here is
 * the model-parameter step: merging per-epoch sketch blobs and reading
 * point estimates out of the merged sketch. Same pattern as the IVF
 * centroids — the sketch is the trained artifact, bounded by
 * (depth × width × 4 B), never by the data.
 *
 * Why merge on the driver: incremental pipelines persist one sketch
 * per ingest epoch; answering "frequency over all epochs" is a fold
 * over E sketch blobs (E = epochs, each ~100 KB), not a re-scan of
 * 100 TB. `CountMinSketch.mergeInPlace` is exact for the structure
 * (cell-wise sum), so merged estimates carry the same
 * `true ≤ est ≤ true + ε·N` guarantee as a single-pass sketch.
 */
object Sketches {

  /**
   * Merge serialized Count-Min sketch partials (same ε/confidence/seed)
   * and return point estimates for the given keys.
   */
  def cmsEstimates(partials: Seq[Array[Byte]],
      keys: Seq[Long]): Map[Long, Long] = {
    require(partials.nonEmpty, "no sketch partials to merge")
    val merged = partials.map(CountMinSketch.readFrom).reduce(_ mergeInPlace _)
    keys.map(k => k -> merged.estimateCount(java.lang.Long.valueOf(k))).toMap
  }
}
