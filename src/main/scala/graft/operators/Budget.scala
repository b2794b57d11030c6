package graft.operators

import org.apache.spark.sql.SparkSession

/**
 * ONE namespace for every guard/budget knob in the library:
 * `spark.graft.budget.<name>`. Each quadratic-risk operator owns a
 * budget it checks EAGERLY (refusing over-budget inputs BY NAME
 * before the expensive stage is planned — the ScaleGuard/Triangles
 * contract), and each skew defense owns a cap. Historically these
 * were per-operator conf keys; the old keys stay readable as ALIASES
 * (precedence: budget key, then legacy key, then default) so no
 * deployment breaks, but docs and new code use the namespace.
 *
 * | budget key (spark.graft.budget.*) | legacy key | default | used by |
 * |---|---|---|---|
 * | allPairsMaxRows  | spark.graft.allPairs.maxRows | 100000 | ScaleGuard (knn_join, dedup_embedding, dedup_semantic anchors) |
 * | ccLocalMaxEdges  | spark.graft.cc.localMaxEdges | 1000000 | Dedup.connectedComponents driver union-find path |
 * | maxWedges        | (param-only before r10)      | 2e9    | Triangles.triangleCount oriented-wedge guard |
 * | bandCandPairs    | (new r10)                    | 2e9    | Multimodal.nearDupMedia banded candidate guard |
 * | maxBucketRows    | (param-only before r10)      | 1024   | dense-bucket salting cap (banded self-joins) |
 * | indexDocsPerDir  | (new r11)                    | 16384  | persisted-index bucket-directory fan-out: one directory slice per this many docs at CREATE (Dedup.autoBucketDirs) |
 * | bpeLocalMaxVocab | (new r11)                    | 200000 | Tokenizer.fitOn driver-local merge loop for vocabularies at or under this row count (the CC localMaxEdges pattern); -1 disables |
 *
 * Semantics: -1 disables a guard (documented per call site); caps are
 * never disabled (they cost no recall, only layout).
 */
object Budget {

  val Prefix = "spark.graft.budget."

  val AllPairsMaxRows = "allPairsMaxRows"
  val CcLocalMaxEdges = "ccLocalMaxEdges"
  val MaxWedges = "maxWedges"
  val BandCandPairs = "bandCandPairs"
  val MaxBucketRows = "maxBucketRows"
  val IndexDocsPerDir = "indexDocsPerDir"
  val BpeLocalMaxVocab = "bpeLocalMaxVocab"

  /** Resolve a budget: `spark.graft.budget.<name>`, else the legacy
    * alias, else the default. */
  def long(spark: SparkSession, name: String, default: Long,
      legacyKey: Option[String] = None): Long =
    spark.conf.getOption(Prefix + name)
      .orElse(legacyKey.flatMap(spark.conf.getOption))
      .map(_.toLong).getOrElse(default)

  def int(spark: SparkSession, name: String, default: Int,
      legacyKey: Option[String] = None): Int =
    long(spark, name, default.toLong, legacyKey).toInt
}
