package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins `Multimodal.nearDupMedia`'s r10 scale defenses on a
 * deliberately dup-dense corpus, DenseBucketSpec-style:
 *
 *  - completeness + exactness: the banded pair set equals an
 *    independent brute-force all-pairs Hamming check over
 *    reimplemented signatures (so first-band dedup, salting, and the
 *    packed-code SWAR math all cancel out to the naive semantics);
 *  - each surviving pair appears exactly once (no distinct stage to
 *    hide double emission);
 *  - dense-bucket salting (budget.maxBucketRows) never changes the
 *    pair set;
 *  - the eager candidate-pair budget refuses over-budget corpora BY
 *    NAME before the self-join runs.
 */
class MediaBandSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Independent simhash: md5 over char 3-grams (same gram positions
    * as the operator, including the short-payload degenerate gram),
    * ±1 majority vote per bit, ties to 1. */
  private def simhash(text: String, bands: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = (1 to math.max(text.length - 2, 1)).map(i =>
      text.substring(i - 1, math.min(i + 2, text.length)))
    val votes = Array.fill(bands * 16)(0)
    for (g <- grams) {
      val hex = md.digest(g.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, bands * 4)
      for (b <- 0 until bands; j <- 0 until 16) {
        val w = java.lang.Long.parseLong(hex.substring(b * 4, b * 4 + 4), 16)
        votes(b * 16 + j) += (if (((w >> j) & 1L) == 1L) 1 else -1)
      }
    }
    (0 until bands).map(b => (0 until 16).map(j =>
      if (votes(b * 16 + j) >= 0) 1L << j else 0L).sum).toArray
  }

  private def brutePairs(docs: Seq[(Long, String)], bands: Int, tau: Int)
      : Set[(Long, Long, Long)] = {
    val sigs = docs.map { case (id, t) => id -> simhash(t, bands) }
    (for {
      (i1, s1) <- sigs; (i2, s2) <- sigs if i1 < i2
      h = s1.zip(s2).map { case (a, b) =>
        java.lang.Long.bitCount(a ^ b).toLong }.sum
      if h <= tau
    } yield (i1, i2, h)).toSet
  }

  /** dup-dense fixture: 3 clusters of identical texts (every band of
    * every in-cluster pair collides) + distinct tails. */
  private def fixture: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(13)
    val clusters = for {
      c <- 0 until 3; i <- 0 until 12
    } yield (c * 100L + i, s"shared cluster payload body number $c with stable text")
    val singles = (500L until 540L).map(id =>
      id -> (0 until 12).map(_ => rnd.nextPrintableChar()).mkString)
    clusters ++ singles
  }

  private def run(docs: Seq[(Long, String)], geom: String): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val m = Multimodal.manifest(docs.toDF("doc_id", "text"), "doc_id", "text")
    val df = geom match {
      case "narrow" => Multimodal.nearDupMedia(m)
      case "wide"   => Multimodal.nearDupMediaWide(m)
      case "w32"    => Multimodal.nearDupMediaW32(m)
    }
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("narrow (64-bit) pair set == brute-force all-pairs Hamming <= 3") {
    assert(run(fixture, "narrow") == brutePairs(fixture, bands = 4, tau = 3))
  }

  test("wide (128-bit) pair set == brute-force all-pairs Hamming <= 7") {
    assert(run(fixture, "wide") == brutePairs(fixture, bands = 8, tau = 7))
  }

  test("sparse 32-bit-band geometry == brute-force 128-bit Hamming <= 3") {
    assert(run(fixture, "w32") == brutePairs(fixture, bands = 8, tau = 3))
  }

  test("each pair emitted exactly once — no distinct stage hides doubles") {
    import spark.implicits._
    val m = Multimodal.manifest(fixture.toDF("doc_id", "text"), "doc_id", "text")
    val rows = Multimodal.nearDupMedia(m).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.distinct.length)
    assert(rows.forall { case (a, b) => a < b })
  }

  test("dense-bucket salting changes the plan, never the pair set") {
    val base = run(fixture, "narrow")
    spark.conf.set("spark.graft.budget.maxBucketRows", "2")
    try assert(run(fixture, "narrow") == base)
    finally spark.conf.unset("spark.graft.budget.maxBucketRows")
  }

  test("eager candidate budget refuses over-budget corpora by name") {
    spark.conf.set("spark.graft.budget.bandCandPairs", "5")
    try {
      val e = intercept[IllegalArgumentException](run(fixture, "narrow"))
      assert(e.getMessage.contains("mm_dedup_near"))
      assert(e.getMessage.contains("bandCandPairs"))
    } finally spark.conf.unset("spark.graft.budget.bandCandPairs")
  }
}
