package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-8 training-pipeline additions: window-level
  * dedup stats, corpus-unigram NLL scoring, mixture downsampling, and
  * robust MAD outliers. */
class TrainingOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("dupWindowStats counts cross-doc windows and their word coverage") {
    val docs = Seq(
      (1L, "a b c d e f"),          // shares window "a b c" with doc 2
      (2L, "x y a b c z"),
      (3L, "q r s t u v"),          // fully unique
      (4L, "m n o m n o m n o"),    // repeats WITHIN itself only
      (5L, "a b")                   // shorter than one window
    ).toDF("doc_id", "text")
    val got = Dedup.dupWindowStats(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))).toMap
    // doc 1: 6 words, 4 windows, 1 duplicated ("a b c" at pos 0) →
    // covers word positions 0..2
    assert(got(1L) == ((6L, 4L, 1L, 3L, 3L, 0.5)))
    assert(got(2L) == ((6L, 4L, 1L, 3L, 3L, 0.5)))
    assert(got(3L) == ((6L, 4L, 0L, 0L, 6L, 0.0)))
    // intra-doc repetition is NOT cross-doc duplication
    assert(got(4L) == ((9L, 7L, 0L, 0L, 9L, 0.0)))
    assert(got(5L) == ((2L, 0L, 0L, 0L, 2L, 0.0)))
  }

  test("unigramLogProb scores rare-token docs higher, flags rare-heavy") {
    val docs = Seq(
      (1L, "the the the"),
      (2L, "the the the zz")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // cf(the)=6, cf(zz)=1, total=7
    val (n1, r1, nll1, f1) = got(1L)
    assert((n1, r1, f1) == ((3L, 0L, false)))
    assert(math.abs(nll1 - math.log(7.0 / 6.0) / math.log(2)) < 1e-3)
    val (n2, r2, nll2, f2) = got(2L)
    assert((n2, r2, f2) == ((4L, 1L, true)))   // 5·1 > 4
    val expect2 = math.log(7) / math.log(2) -
      (3 * math.log(6) / math.log(2)) / 4
    assert(math.abs(nll2 - expect2) < 1e-3)
    assert(nll2 > nll1) // the rare token raises the score
  }

  test("mixtureSample hits the integer target shares without upsampling") {
    val df = ((0L until 10L).map(i => (i, "a")) ++
      (10L until 20L).map(i => (i, "b")) ++
      (20L until 25L).map(i => (i, "c"))).toDF("id", "s")
    val got = Curation.mixtureSample(df, "id", "s",
      Seq("a" -> 75, "b" -> 25))
    val rows = got.collect()
    // capacity M = min(10·100/75, 10·100/25) = 13 → keep 9 a's, 3 b's
    val per = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(per == Map("a" -> 9, "b" -> 3)) // stratum c dropped
    assert(rows.forall(r => r.getLong(3) <= r.getLong(4))) // rank <= keep_n
    // deterministic
    assert(got.collect().toSeq == Curation.mixtureSample(df, "id", "s",
      Seq("a" -> 75, "b" -> 25)).collect().toSeq)
  }

  test("madOutliers flags only robust outliers; MAD=0 and NULLs are safe") {
    val rows =
      (1L to 9L).map(i => ("g", i, Some(i.toDouble))) ++
        Seq(("g", 10L, Some(100.0)),          // the outlier
          ("g", 11L, None)) ++                // NULL ignored
        (20L to 29L).map(i => ("z", i, Some(5.0))) :+
        ("z", 30L, Some(100.0))               // MAD=0 group: no output
    val df = rows.toDF("grp", "id", "v")
    val got = Robust.madOutliers(df, "grp", "v", "id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(10L))
    val r = got.head
    // group g: med=5.5, mad=2.5 → z = 94.5/(1.4826·2.5) ≈ 25.4959
    assert(r.getDouble(3) == 5.5 && r.getDouble(4) == 2.5)
    assert(math.abs(r.getDouble(5) - 94.5 / (1.4826 * 2.5)) < 1e-3)
  }

  test("embeddingOutlierScores flags a planted far-off vector, scores all rows") {
    // 20 vectors near e1 (tiny jitter on dim 2 keeps MAD > 0), one
    // anti-aligned vector planted far off the manifold
    val near = (0L until 20L).map { i =>
      (i, Array(1.0f, 0.001f * (i % 5), 0.0f, 0.0f))
    }
    val planted = Seq((99L, Array(-1.0f, 0.5f, 0.0f, 0.0f)))
    val df = (near ++ planted).toDF("vec_id", "embedding")
    val got = Robust.embeddingOutlierScores(df, "vec_id", "embedding")
      .collect()
    assert(got.length == 21) // every row scored
    val flagged = got.filter(_.getBoolean(5)).map(_.getLong(0)).toSeq
    assert(flagged == Seq(99L))
    // determinism across reruns (centroid collect + quantile path)
    val again = Robust.embeddingOutlierScores(df, "vec_id", "embedding")
      .collect()
    assert(got.toSeq == again.toSeq)
  }

  test("centroidSilhouette: tight separated clusters ~1, mixed labels ~0") {
    // label 0 hugs e1, label 1 hugs e2 — near-orthogonal, tight
    val tight = (0L until 10L).map { i =>
      (i, (i % 2).toInt,
        if (i % 2 == 0) Array(1.0f, 0.01f * (i % 3).toFloat, 0f, 0f)
        else Array(0.01f * (i % 3).toFloat, 1.0f, 0f, 0f))
    }.toDF("vec_id", "label", "embedding")
    val ts = Similarity.centroidSilhouette(tight, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(ts.keySet == Set(0, 1))
    assert(ts.values.forall(_ > 0.9), s"expected tight clusters, got $ts")
    // identical point clouds under two labels → centroids coincide,
    // a == b per point → silhouette 0
    val mixed = (0L until 10L).map { i =>
      (i, (i % 2).toInt, Array(1.0f, (i / 2 % 3).toFloat, 0f, 0f))
    }.toDF("vec_id", "label", "embedding")
    val ms = Similarity.centroidSilhouette(mixed, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(ms.values.forall(v => math.abs(v) < 0.05), s"expected ~0, got $ms")
    // reruns identical (centroid collect re-derives the same literals)
    val again = Similarity.centroidSilhouette(tight, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(ts == again)
  }

  test("langId's codegen'd regex hits == interpreted filter/isin hits") {
    import org.apache.spark.sql.functions._
    // adversarial shapes: stopword hugging punctuation (NOT a token
    // match under split-on-whitespace), stopword as a substring,
    // repeated stopwords, multi-space runs, leading/trailing blanks,
    // empty and whitespace-only docs, mixed case
    val docs = Seq(
      (1L, "The cat sat on the mat and the dog"),
      (2L, "the, the. the; the"),
      (3L, "them theory breathe a an a  a"),
      (4L, "  to in is it   "),
      (5L, ""),
      (6L, "   "),
      (7L, "der die das und la le el y es de"),
      (8L, "a")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langId(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // independent interpreted replay of the original formulation
    val ws = split(lower(trim(col("text"))), "\\s+")
    def ih(stop: Seq[String]) =
      size(filter(ws, w => w.isin(stop: _*))).cast("long")
    val exp = docs.select(col("doc_id"), ih(TextAnalysis.EnStop),
        ih(TextAnalysis.DeStop), ih(TextAnalysis.FrStop), ih(TextAnalysis.EsStop))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == exp)
    // and the doc-2/3 traps held: punctuation-adjacent and substring
    // occurrences never count as token hits (doc 2's only bare token
    // is the final "the"; the three punctuation-glued ones don't count)
    assert(got(2L) == ((1L, 0L, 0L, 0L)))
    assert(got(3L)._1 == 3L) // exactly the three bare "a" tokens
  }
}
