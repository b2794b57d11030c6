package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scd2 intervals, bucket-checksum reconciliation, the Bloom
  * decontaminate's exactness guarantee, and Count-Min merge bounds. */
class IncrementalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("scd2 collapses runs into half-open intervals with a current flag") {
    val log = Seq(
      // key 1: A A B A → three intervals, last open
      (1L, 1L, 10L, "A"), (1L, 2L, 20L, "A"),
      (1L, 3L, 30L, "B"), (1L, 4L, 50L, "A"),
      // key 2: single row → one open interval
      (2L, 5L, 10L, "X"),
      // key 3: null is a legal tracked value; null → null → C is ONE
      // null interval then C
      (3L, 6L, 10L, null), (3L, 7L, 20L, null), (3L, 8L, 30L, "C"))
      .toDF("k", "id", "t", "attr")
    val got = Scd.scd2(log, "k", "attr", "t", "id")
      .orderBy(col("k"), col("effective_from"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, Some("A"), 10L, Some(30L), false),
      (1L, Some("B"), 30L, Some(50L), false),
      (1L, Some("A"), 50L, None, true),
      (2L, Some("X"), 10L, None, true),
      (3L, None, 10L, Some(30L), false),
      (3L, Some("C"), 30L, None, true)))
  }

  test("scd2 breaks timestamp ties with the tie column deterministically") {
    val log = Seq(
      (1L, 2L, 10L, "B"), (1L, 1L, 10L, "A"), (1L, 3L, 20L, "A"))
      .toDF("k", "id", "t", "attr")
    val got = Scd.scd2(log, "k", "attr", "t", "id")
      .orderBy(col("effective_from"), col("attr"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getBoolean(4)))
    // order is (t, id): A@10#1, B@10#2, A@20#3 → A, B, A(current)
    assert(got.toSeq == Seq(("A", 10L, false), ("B", 10L, false),
      ("A", 20L, true)))
  }

  test("reconcile.diff finds exactly the drifted buckets, empty when equal") {
    val base = (0L until 100L).map(k => (k, k * 10L)).toDF("k", "v")
    val checksum = col("k") * lit(1000003L) + col("v")
    assert(Reconcile.diff(base, base, "k", checksum, 8).count() === 0)

    val current = base.filter(col("k") =!= 13L)
      .withColumn("v", when(col("k") === 7L, col("v") + 1L).otherwise(col("v")))
    val got = Reconcile.diff(base, current, "k", checksum, 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(5)))
    // 13 % 8 = 5 lost a row (12 keys per bucket in 0..99); 7 % 8 = 7
    // changed content only
    assert(got.toSeq == Seq((5L, 12L, 11L, "rows"), (7L, 12L, 12L, "content")))
  }

  test("reconcile checksums survive bucket sums beyond long range") {
    // 10k rows of ~4.6e18 checksums in ONE bucket: the raw long sum
    // (~4.6e22) is 5000× past Long.MaxValue — the sf10 failure shape.
    // The decimal accumulator + pmod 2^61-1 must neither throw under
    // ANSI nor wrap: equal snapshots diff empty, one drifted row is
    // still detected as content drift.
    val big = lit(Long.MaxValue / 2)
    val base = (0L until 10000L).map(k => (k, 0L)).toDF("k", "v")
    val checksum = big + col("v")
    assert(Reconcile.diff(base, base, "k", checksum, 1).count() === 0)
    val drifted = base.withColumn("v",
      when(col("k") === 42L, lit(1L)).otherwise(col("v")))
    val got = Reconcile.diff(base, drifted, "k", checksum, 1).collect()
    assert(got.length == 1 && got.head.getString(5) == "content")
    // and the published residues match an independent BigInt replay
    val m = BigInt(Reconcile.ChecksumMod)
    val expect = ((BigInt(Long.MaxValue / 2) * 10000) mod m).toLong
    assert(got.head.getLong(3) == expect)
    assert(got.head.getLong(4) == ((BigInt(Long.MaxValue / 2) * 10000 + 1) mod m).toLong)
  }

  test("decontaminateBloom is bit-identical to exact decontaminate") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val eval = docs.filter(col("doc_id") % 20 === 0)
    val exact = Curation.decontaminate(train, eval, "doc_id", "text", n = 5)
      .collect().toSeq
    val bloom = Curation.decontaminateBloom(train, eval, "doc_id", "text",
        n = 5, expectedEvalShingles = 50000L, fpp = 0.01)
      .collect().toSeq
    assert(bloom == exact)
    assert(exact.exists(_.getBoolean(2)),
      "fixture must contain contaminated docs or this test proves nothing")
  }

  test("merged count-min estimates respect exact <= est <= exact + eps*N") {
    val eps = 0.001
    val rows = (1L to 20L).flatMap(k => Seq.fill((k * 10).toInt)(k))
    val df = rows.zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("id", "key")
    val partials = df
      .groupBy((col("id") % 3).as("epoch"))
      .agg(count_min_sketch(col("key"), lit(eps), lit(0.99), lit(42)).as("sk"))
      .collect().map(_.getAs[Array[Byte]]("sk")).toSeq
    assert(partials.size == 3)
    val est = Sketches.cmsEstimates(partials, (1L to 20L))
    val n = rows.size
    (1L to 20L).foreach { k =>
      val exact = k * 10
      assert(est(k) >= exact, s"CMS must never undercount (key $k)")
      assert(est(k) <= exact + (eps * n).toLong + 1,
        s"key $k estimate ${est(k)} above eps bound")
    }
  }
}
