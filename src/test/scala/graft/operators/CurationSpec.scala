package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("decontaminate flags exactly the docs sharing an n-gram with the eval set") {
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      // contains "alpha beta gamma delta epsilon" → contaminated
      (1L, "intro words alpha beta gamma delta epsilon zeta closing"),
      // shares only a 4-gram, not a 5-gram → clean
      (2L, "alpha beta gamma delta UNRELATED tail words here"),
      // disjoint vocabulary → clean
      (3L, "one two three four five six seven"),
      // shorter than 5 words → no shingles, clean
      (4L, "tiny doc")).toDF("doc_id", "text")
    val got = Curation.decontaminate(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // doc 1 shares two distinct 5-grams ("alpha..epsilon", "beta..zeta")
    assert(got.toSeq == Seq((1L, 2L, true), (2L, 0L, false),
      (3L, 0L, false), (4L, 0L, false)))
  }

  test("stratified sample takes exactly the quota per stratum, deterministically") {
    val df = (0L until 100L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val s1 = Curation.stratifiedSample(df, "id", "src", quota = 7).collect()
    val s2 = Curation.stratifiedSample(df, "id", "src", quota = 7).collect()
    assert(s1.toSeq == s2.toSeq) // reproducible
    val perStratum = s1.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(perStratum == Map("src0" -> 7, "src1" -> 7, "src2" -> 7, "src3" -> 7))
    // ranks within each stratum are 1..quota with no gaps
    s1.groupBy(_.getString(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to 7L))
    }
  }

  test("repetition score separates looped text from distinct text") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),       // 4 trigrams, 1 distinct
      (2L, "all words here are fully distinct ok"), // no repeats
      (3L, "ab cd")).toDF("doc_id", "text")         // < n words
    val got = Curation.repetitionScore(df, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((4L, 1L, 0.75, true)))
    assert(got(2L) == ((5L, 5L, 0.0, false)))
    assert(got(3L) == ((0L, 0L, 0.0, false)))
  }

  test("sequence packing assigns exact global stream offsets and bins") {
    val df = Seq((0L, 100L), (1L, 500L), (2L, 20L), (3L, 512L), (4L, 1L))
      .toDF("id", "toks")
    val got = Curation.sequencePack(df, "id", "toks", capacity = 512L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    // exclusive prefix sums: 0, 100, 600, 620, 1132
    assert(got.toSeq == Seq(
      (0L, 0L, 0L, 0L, false),
      (1L, 100L, 0L, 1L, true),    // 100..599 crosses the 512 cut
      (2L, 600L, 1L, 1L, false),
      (3L, 620L, 1L, 2L, true),    // 620..1131 crosses 1024
      (4L, 1132L, 2L, 2L, false)))
  }

  test("chunking covers every word with the declared overlap") {
    val ninety = (1 to 90).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, ninety), (2L, "short doc")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(df, "doc_id", "text",
        chunkSize = 50, stride = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // starts 0/40/80; last chunk truncated; short doc → one short chunk
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 50L), (1L, 1L, 40L, 50L), (1L, 2L, 80L, 10L),
      (2L, 0L, 0L, 2L)))
    val texts = TextAnalysis.chunkDocuments(df, "doc_id", "text", 50, 40)
      .filter(col("doc_id") === 1L && col("chunk_idx") === 2L)
      .select(col("chunk_text")).collect()(0).getString(0)
    assert(texts == (81 to 90).map(i => s"w$i").mkString(" "))
  }

  test("quality stratified keeps the integer-exact top half of each stratum") {
    // stratum a: 5 rows (keep 2 since 3*2 > 5), stratum b: 4 rows (keep 2)
    val df = Seq(
      (1L, "a", 0.9), (2L, "a", 0.8), (3L, "a", 0.7), (4L, "a", 0.6), (5L, "a", 0.5),
      (6L, "b", 0.4), (7L, "b", 0.9), (8L, "b", 0.9), (9L, "b", 0.1))
      .toDF("id", "src", "q")
    val got = Curation.qualityStratified(df, "id", "src", "q")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // ties on q=0.9 in b broken by id: 7 then 8
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L), (7L, 1L), (8L, 2L)))
  }

  test("dsir weights rank target-vocabulary docs above disjoint-vocabulary docs") {
    // target slice speaks {alpha..}, the raw remainder speaks {uno..};
    // a held-out doc in target vocabulary must outscore one in raw-only
    // vocabulary, and target-slice docs must self-select (score > 0)
    val df = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "beta gamma delta beta gamma", true),
      (3L, "uno dos tres cuatro cinco", false),
      (4L, "alpha beta gamma delta alpha", false), // target-like raw doc
      (5L, "dos tres cuatro uno dos", false)) // raw-like raw doc
      .toDF("doc_id", "text", "is_en")
    val got = Curation.dsirWeights(df, "doc_id", "text", col("is_en"))
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toMap
    // n_feats = words + bigrams = 5 + 4 for every doc here
    assert(got.values.forall(_._2 == 9L))
    // the target-like raw doc outscores the raw-like raw doc; target
    // docs outscore the pure-raw-vocabulary docs. (Absolute sign is
    // meaningless at toy scale: add-one smoothing over `buckets`
    // dominates a 45-token corpus — the ORDER is the contract.)
    assert(got(4L)._3 > got(5L)._3)
    assert(got(1L)._3 > got(3L)._3 && got(2L)._3 > got(3L)._3)
    assert(got(1L)._3 > got(5L)._3)
    // the selected flag is exactly the sign of the score
    assert(got.values.forall(v => v._4 == (v._3 > 0)))
  }

  test("psiDrift alarms on a planted shift and stays quiet on resampling") {
    val ref = (0L until 400L).map(i => Tuple1(i % 10)).toDF("b")
    // same distribution, different sample size → tiny PSI, no alarm
    val same = (0L until 200L).map(i => Tuple1(i % 10)).toDF("b")
    val quiet = Curation.psiDrift(ref, same, col("b"), buckets = 10).collect()
    assert(quiet.length == 10)
    assert(quiet.forall(!_.getBoolean(5)))
    // mass collapses onto two buckets → large PSI, alarm on every row
    val shifted = (0L until 200L).map(i => Tuple1(i % 2)).toDF("b")
    val loud = Curation.psiDrift(ref, shifted, col("b"), buckets = 10).collect()
    assert(loud.forall(_.getBoolean(5)))
    // the total is the sum of the per-bucket contributions, exactly
    val total = loud.head.getLong(4)
    assert(total == loud.map(_.getLong(3)).sum)
    assert(total > 100000L)
  }

  test("contaminationReport counts hit train docs and covered grams per eval doc") {
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (200L, "nothing here overlaps with training text")).toDF("doc_id", "text")
    val train = Seq(
      // shares both of eval 100's 5-grams
      (1L, "xx alpha beta gamma delta epsilon zeta yy"),
      // shares only the first 5-gram
      (2L, "alpha beta gamma delta epsilon STOP"),
      (3L, "fully disjoint vocabulary entirely")).toDF("doc_id", "text")
    val got = Curation.contaminationReport(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    // eval 100 has 2 shingles; both seen in training; docs 1 and 2 hit
    assert(got.toSeq == Seq((100L, 2L, 2L, true), (200L, 0L, 0L, false)))
  }

  test("sourceCap keeps exactly the top-cap docs per source by quality") {
    val df = (0L until 40L).map(i =>
      (i, s"src${i % 4}", (i * 13 % 7).toInt)).toDF("id", "src", "q")
    val got = Curation.sourceCap(df, "id", "src", "q", cap = 3).collect()
    assert(got.length == 12) // 4 sources x cap 3
    got.groupBy(_.getString(0)).foreach { case (src, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L, 3L))
      // the kept rows ARE the per-source top-3 by (q desc, id asc)
      val want = (0L until 40L).filter(i => s"src${i % 4}" == src)
        .sortBy(i => (-(i * 13 % 7), i)).take(3).toSet
      assert(rows.map(_.getLong(1)).toSet == want)
    }
  }

  test("sourceCap plans a WindowGroupLimit (partial top-N before the shuffle)") {
    val df = (0L until 40L).map(i =>
      (i, s"src${i % 4}", (i * 13 % 7).toInt)).toDF("id", "src", "q")
    val plan = Curation.sourceCap(df, "id", "src", "q", cap = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("shuffleShards: shard boundaries follow the seeded-order prefix sum") {
    val df = (0L until 50L).map(i => (i, 10L + i % 5)).toDF("id", "toks")
    val got = Curation.shuffleShards(df, "id", "toks", shardTokens = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 50)
    // reference: the same md5-seeded order and running sum, locally
    val order = (0L until 50L).sortBy { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"s42|$i".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }
    var cum = 0L
    val want = order.map { i =>
      val t = 10L + i % 5
      val row = (i, t, cum, cum / 64L)
      cum += t
      row
    }.sortBy(_._1)
    assert(got.sortBy(_._1).toSeq == want)
    // totals conserve: last shard start + its tokens == corpus total
    assert(cum == got.map(_._2).sum)
  }

  test("dsir weights are deterministic and integer-exact across reruns") {
    val df = (0L until 60L).map(i =>
      (i, (0 to 6).map(j => s"w${(i * 7 + j * 3) % 19}").mkString(" "),
        i % 3 == 0)).toDF("doc_id", "text", "t")
    val a = Curation.dsirWeights(df, "doc_id", "text", col("t"), buckets = 64)
      .collect().toSeq
    val b = Curation.dsirWeights(df, "doc_id", "text", col("t"), buckets = 64)
      .collect().toSeq
    assert(a == b)
    assert(a.size == 60)
  }
}
