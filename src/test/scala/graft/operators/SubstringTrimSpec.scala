package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SubstringTrimSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference ExactSubstr trim: mark every non-first occurrence (in
    * (doc, pos) order) of any duplicated n-gram, cover [s, s+n), keep
    * the rest. Mirrors the words() normalization (lower, trim, \s+). */
  private def bruteTrim(docs: Seq[(Long, String)], n: Int)
      : Map[Long, (Int, String)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    }.toMap
    val occ = scala.collection.mutable.Map.empty[String, List[(Long, Int)]]
    for ((id, ws) <- toks.toSeq.sortBy(_._1); p <- 0 to ws.length - n)
      occ(ws.slice(p, p + n).mkString(" ")) =
        (id, p) :: occ.getOrElse(ws.slice(p, p + n).mkString(" "), Nil)
    val dupStarts = occ.values.filter(_.size >= 2)
      .flatMap(os => os.sortBy(identity).tail).toSet
    toks.map { case (id, ws) =>
      val covered = ws.indices.filter(p =>
        (math.max(0, p - n + 1) to p).exists(s => dupStarts((id, s)))).toSet
      val kept = ws.indices.filterNot(covered).map(ws)
      id -> (kept.size, kept.mkString(" "))
    }
  }

  private def trim(docs: Seq[(Long, String)], n: Int)
      : Map[Long, (Int, String)] = {
    import spark.implicits._
    Dedup.substringTrim(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2).toInt, r.getString(4))).toMap
  }

  test("within-doc repeat: trimmed here, invisible to dupWindowTrim") {
    import spark.implicits._
    // one document repeating a 6-word span — no second document shares
    // text, so dupWindowTrim's >= 2 DISTINCT docs definition sees
    // nothing, while ExactSubstr removes the second occurrence
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta middle alpha beta gamma delta epsilon zeta"),
      (2L, "totally unrelated content here"))
    val got = trim(docs, n = 6)
    assert(got(1L) == (7, "alpha beta gamma delta epsilon zeta middle"))
    assert(got(2L) == (4, "totally unrelated content here"))
    val wt = Dedup.dupWindowTrim(docs.toDF("doc_id", "text"),
      "doc_id", "text", k = 6).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    // the fixed-k operator misses the repeat entirely
    assert(wt(1L) ==
      "alpha beta gamma delta epsilon zeta middle alpha beta gamma delta epsilon zeta")
  }

  test("cross-doc repeat: first occurrence SURVIVES (dupWindowTrim drops both)") {
    import spark.implicits._
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (10L, s"prefix $shared suffix"),
      (20L, s"other lead-in $shared trailing words here"))
    val got = trim(docs, n = 8)
    // doc 10 holds the globally-first occurrence — untouched
    assert(got(10L) == (10, s"prefix $shared suffix"))
    assert(got(20L) == (5, "other lead-in trailing words here"))
    val wt = Dedup.dupWindowTrim(docs.toDF("doc_id", "text"),
      "doc_id", "text", k = 8).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    // the fixed-k operator erases the span from EVERY doc — the text
    // is gone from the corpus
    assert(wt(10L) == "prefix suffix")
    assert(wt(20L) == "other lead-in trailing words here")
  }

  test("unaligned long repeat is covered end-to-end") {
    // a 10-word span at different offsets in each doc; n=6 must cover
    // all 10 words of the second occurrence, not just one 6-window
    val span = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val docs = Seq(
      (1L, s"$span tail1 tail2"),
      (2L, s"a b c $span z"))
    val got = trim(docs, n = 6)
    assert(got(1L) == (12, s"$span tail1 tail2"))
    assert(got(2L) == (4, "a b c z"))
  }

  test("matches brute force on a random corpus with planted repeats") {
    val rnd = new scala.util.Random(3)
    val vocab = (0 until 30).map(i => s"w$i")
    val planted = (0 until 9).map(i => s"p$i").mkString(" ")
    val docs = (1L to 40L).map { id =>
      val base = (0 until 30 + rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size)))
      val withPlant =
        if (id % 3 == 0) {
          val at = rnd.nextInt(base.size)
          (base.take(at) ++ planted.split(" ") ++ base.drop(at))
        } else base
      id -> withPlant.mkString(" ")
    }
    for (n <- Seq(5, 8)) {
      val got = trim(docs, n)
      val want = bruteTrim(docs, n)
      assert(got == want, s"n=$n mismatch")
    }
  }

  test("short docs and empty residuals") {
    val docs = Seq(
      (1L, "a b c"),                      // shorter than n — untouched
      (2L, "x1 x2 x3 x4 x5 x6"),          // exactly n, unique
      (3L, "x1 x2 x3 x4 x5 x6"))          // exact duplicate — fully trimmed
    val got = trim(docs, n = 6)
    assert(got(1L) == (3, "a b c"))
    assert(got(2L) == (6, "x1 x2 x3 x4 x5 x6"))
    assert(got(3L) == (0, ""))
  }
}
