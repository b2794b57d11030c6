package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE training loop on hand-computable corpora (the classic
  * low/lower/lowest family) plus the motif/LM additions. */
class TokenizerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("bpeFit learns the classic merges in frequency order") {
    // word frequencies: low×5, lower×2, newest×6, widest×3
    val corpus = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    val log = Tokenizer.bpeFit(corpus, "doc_id", "text", nMerges = 4)
    assert(log.length == 4)
    // round 1: "es" (newest 6 + widest 3 = 9) beats "lo" (7), "st" (9
    // ties with "es" and "e s" < "s t" lexicographically)
    val first = log.head
    assert((first.left, first.right, first.freq) == (("e", "s", 9L)))
    // round 2: "es"+"t" appears 9 times
    assert((log(1).left, log(1).right, log(1).freq) == (("es", "t", 9L)))
    // frequencies never increase; every merge applies fully here
    assert(log.sliding(2).forall {
      case Seq(a, b) => b.freq <= a.freq
      case _ => true
    })
    assert(log.forall(m => m.applied == m.freq &&
      m.tokensAfter == m.tokensBefore - m.applied))
  }

  test("bpeFit counts overlapping pairs but applies left-greedy") {
    val corpus = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val log = Tokenizer.bpeFit(corpus, "doc_id", "text", nMerges = 1)
    // "a a" counted twice per word occurrence (overlap), total 4 —
    // but " a a a " merges once per word: applied 2, 6 tokens → 4
    val m = log.head
    assert((m.left, m.right, m.freq, m.applied) == (("a", "a", 4L, 2L)))
    assert(m.tokensBefore == 6L && m.tokensAfter == 4L)
  }

  test("incremental fit == rescan reference on fixtures and at R=64 on testdata") {
    // classic fixture: every (rank, pair, freq, applied, totals) equal
    val corpus = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    def base(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.functions._
      graft.operators.Dedup.materialize(
        df.select(explode(graft.functions.TextFunctions.words(col("text"))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("n"))
          .withColumn("toks",
            concat(lit(" "), array_join(split(col("word"), "(?!^)"), " "), lit(" "))))
    }
    val b1 = base(corpus)
    assert(Tokenizer.fitOn(b1, 6)._1 == Tokenizer.fitOnRescan(b1, 6))

    // deep run on real testdata: the delta-maintained counts must
    // track the full recount for 64 rounds, and the maintained state's
    // plan must stay CONSTANT-depth (the round-boundary checkpoints —
    // the rescan reference's plan grows with R instead)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 200)
    val b2 = base(docs)
    // default budget: the vocab is under bpeLocalMaxVocab, so this is
    // the DRIVER-LOCAL loop vs the full-recount reference
    val (incLog, finalState) = Tokenizer.fitOn(b2, 64)
    val refLog = Tokenizer.fitOnRescan(b2, 64)
    assert(incLog.nonEmpty)
    assert(incLog == refLog,
      s"first divergence: ${incLog.zip(refLog).find { case (a, b) => a != b }}")

    // and the DISTRIBUTED incremental loop (budget disabled) must
    // produce the identical log AND identical final state rows
    spark.conf.set("spark.graft.budget.bpeLocalMaxVocab", "-1")
    try {
      val (distLog, distState) = Tokenizer.fitOn(b2, 64)
      assert(distLog == incLog,
        s"local/distributed divergence: ${distLog.zip(incLog).find { case (a, b) => a != b }}")
      val localRows = finalState.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2))).toSet
      val distRows = distState.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(localRows == distRows, "final vocab state differs local vs distributed")
      val planNodes = distState.queryExecution.logical.collect { case p => p }.size
      assert(planNodes <= 10,
        s"final state plan has $planNodes nodes — lineage not truncated")
    } finally spark.conf.unset("spark.graft.budget.bpeLocalMaxVocab")
  }

  test("bpeFitChecked emits all-true invariants and the exact round-1 facts") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val row = Tokenizer.bpeFitChecked(docs, "doc_id", "text", nMerges = 8).head()
    assert(row.getLong(0) == 8L)
    assert(row.getBoolean(5) && row.getBoolean(6) && row.getBoolean(7) &&
      row.getBoolean(8))
  }

  test("bigramLm: probabilities are exact ppm and rows sum to the context") {
    val df = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLm(df, "doc_id", "text", k = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // bigrams: ab, ba, ab, ba, ac → c1(a)=3 (two ab + one ac), c1(b)=2
    assert(got.toSeq == Seq(
      ("a", "b", 2L, 3L, 666666L, 1L),
      ("a", "c", 1L, 3L, 333333L, 2L),
      ("b", "a", 2L, 2L, 1000000L, 1L)))
  }

  test("bpeEncode tokenizes per doc with exact hand-computable counts") {
    // after 1 merge ("a","a" — freq 4 beats "a b" 2): "aaa"→[aa,a]=2,
    // "ab"→[a,b]=2, "b"→[b]=1
    val corpus = Seq(
      (1L, "aaa ab"), (2L, "aaa aaa b")).toDF("doc_id", "text")
    val got = Tokenizer.bpeEncode(corpus, "doc_id", "text", nMerges = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 2L, 5L, 4L, 1L),   // aaa(3ch→2tok) + ab(2ch→2tok)
      (2L, 3L, 7L, 5L, 2L)))  // aaa×2(→2tok each) + b(1)
  }

  test("bpeEncodeChecked totals match the fit log and bounds hold") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Tokenizer.bpeEncodeChecked(docs, "doc_id", "text", nMerges = 8)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(3) && r.getBoolean(4) &&
      r.getBoolean(5)))
  }

  test("graph_butterflies refuses an over-limit wedge join by name") {
    val e = intercept[IllegalArgumentException] {
      graft.queries.EtlQueries.graphButterflies(spark,
        "/root/testdata/sf0.001", maxWedges = 1L).head()
    }
    assert(e.getMessage.contains("wedge"))
  }
}
