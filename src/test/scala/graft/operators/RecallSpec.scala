package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/**
 * Recall evidence for the approximate (rows-only) LSH/ANN family:
 * every blocked/sketched operator is measured against its EXACT
 * counterpart on the real testdata tables, with explicit floors.
 * "It runs" is not evidence; "it recovers ≥ X% of the exact answer
 * at the registry's parameters" is. All inputs and hash seeds are
 * deterministic, so these are stable numbers, not flaky statistics —
 * the floors leave margin only for parameter evolution.
 */
class RecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = Tables.documents(spark, dir)
  private lazy val emb = Tables.embeddings(spark, dir)

  private def pairSet(df: org.apache.spark.sql.DataFrame,
      c1: String, c2: String): Set[(Long, Long)] =
    df.select(col(c1), col(c2)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH candidates cover ≥95% of exact jaccard≥0.8 pairs") {
    val exact = pairSet(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8, 100), "id1", "id2")
    val cands = pairSet(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4), "id1", "id2")
    assert(exact.nonEmpty, "no exact pairs — spec is vacuous")
    val recall = (exact & cands).size.toDouble / exact.size
    assert(recall >= 0.95, s"minhash recall $recall over ${exact.size} pairs")
  }

  test("minhash est_jaccard measures exact jaccard within sketch error") {
    // estimator property: E[est] = J, σ = √(J(1−J)/k) ≈ 0.05 at k=64,
    // J≈0.8 — bound per-pair error at 5σ and the mean at 2σ. Compared
    // over the SAME shingle universe (no stop-shingle filter), which is
    // what the signature actually sketches.
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
      Int.MaxValue).select(col("id1"), col("id2"), col("jaccard"))
    val est = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4)
    val joined = exact.join(est, Seq("id1", "id2"))
      .select(col("jaccard"), col("est_jaccard")).collect()
    assert(joined.nonEmpty, "no overlapping pairs — spec is vacuous")
    val errs = joined.map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
    assert(errs.max <= 0.25,
      s"worst est_jaccard error ${errs.max} over ${errs.length} pairs")
    assert(errs.sum / errs.length <= 0.10,
      s"mean est_jaccard error ${errs.sum / errs.length}")
  }

  test("simhash banding finds EXACTLY the brute-force hamming≤3 pairs") {
    // pigeonhole (4×16-bit bands, distance ≤ 3 forces one intact band)
    // is a completeness proof, not a probabilistic recall — assert set
    // equality against the quadratic scan over the same signatures
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
    val brute = pairSet(sigs.as("a").crossJoin(sigs.as("b"))
      .filter(col("a.doc") < col("b.doc") &&
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) <= 3)
      .select(col("a.doc").as("id1"), col("b.doc").as("id2")), "id1", "id2")
    val banded = pairSet(
      Dedup.simhashPairs(docs, "doc_id", "text", 3), "id1", "id2")
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size} missing=${(brute -- banded).size}")
  }

  test("embedding LSH recovers ≥85% of exact cosine≥0.4 near-dup pairs") {
    val exact = pairSet(
      Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.4), "id1", "id2")
    val lsh = pairSet(
      Dedup.embeddingNearDupLsh(emb, "vec_id", "embedding", 0.4, 64,
        bands = 16, planesPerBand = 4), "id1", "id2")
    assert(exact.nonEmpty, "no exact pairs — spec is vacuous")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.85, s"embedding LSH recall $recall over ${exact.size} pairs")
    // precision is 1.0 by construction: candidates are verified with
    // the same exact cosine the oracle uses
    assert((lsh -- exact).isEmpty, "LSH emitted a pair the exact form rejects")
  }

  test("banded ann_lsh recall@10 ≥ 0.8 vs knn_brute") {
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = Similarity.annLsh(emb, "vec_id", "embedding", 0L, 10, 64,
        bands = 16, planesPerBand = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.8, s"ann_lsh recall@10 = $recall")
  }

  test("ivf_ann recall@10 ≥ 0.5 vs knn_brute at nProbe=8/16") {
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfAnn(emb, "vec_id", "embedding", 0L, 10,
        nCentroids = 16, nProbe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"ivf recall@10 = $recall")
  }

  test("blocked knn-join recovers ≥85% of exact top-3 neighbor edges") {
    val exact = pairSet(
      Similarity.knnJoin(emb, "vec_id", "embedding", 3), "src_id", "nbr_id")
    val blocked = pairSet(
      Similarity.knnJoinBlocked(emb, "vec_id", "embedding", 3, 64,
        bands = 16, planesPerBand = 4), "src_id", "nbr_id")
    assert(exact.nonEmpty)
    val recall = (exact & blocked).size.toDouble / exact.size
    assert(recall >= 0.85, s"blocked knn-join edge recall $recall over ${exact.size}")
  }
}
