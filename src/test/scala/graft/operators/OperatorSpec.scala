package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStreams, Sessionize}

class OperatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("connected components agree with union-find on random graphs") {
    val rng = new scala.util.Random(1234)
    for (trial <- 1 to 8) {
      val nNodes = 5 + rng.nextInt(60)
      val nEdges = rng.nextInt(2 * nNodes)
      val edges = Seq.fill(nEdges)(
        (rng.nextInt(nNodes).toLong, rng.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // driver-side union-find reference (path compression)
        val parent = Array.tabulate(nNodes)(identity)
        def find(x: Int): Int = {
          var r = x
          while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
          r
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expected = touched.map(n => n -> {
          // component label = min node id in the component
          val root = find(n.toInt)
          touched.filter(m => find(m.toInt) == root).min
        }).toMap
        // both paths must agree with the reference: the driver-side
        // union-find (default for model-parameter-sized edge sets) AND
        // the distributed large-star/small-star iteration (forced by
        // disabling the local path)
        val gotLocal = Dedup.connectedComponents(
            edges.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotLocal == expected, s"trial $trial (local): $edges")
        spark.conf.set(Dedup.CcLocalMaxEdgesKey, "-1")
        try {
          val gotIter = Dedup.connectedComponents(
              edges.toDF("a", "b"), "a", "b")
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(gotIter == expected, s"trial $trial (iterative): $edges")
        } finally spark.conf.unset(Dedup.CcLocalMaxEdgesKey)
      }
    }
  }

  test("pii scrub redacts planted identifiers and counts them") {
    val df = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org today"),
      (2L, "ssn 123-45-6789 phone 555-867-5309 ip 10.0.0.1"),
      (3L, "nothing sensitive here at all")).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("scrubbed"), r.getAs[Long]("n_emails"),
          r.getAs[Long]("n_ssns"), r.getAs[Long]("n_phones"),
          r.getAs[Long]("n_ips"), r.getAs[Boolean]("is_clean"))).toMap
    assert(got(1L) == ("mail me at [EMAIL] today", 1L, 0L, 0L, 0L, false))
    // SSN redacts before the phone pattern can claim it; the dotted
    // quad after "ip" is an IP, not a phone
    assert(got(2L) == ("ssn [SSN] phone [PHONE] ip [IP]", 0L, 1L, 1L, 1L, false))
    assert(got(3L) == ("nothing sensitive here at all", 0L, 0L, 0L, 0L, true))
  }

  test("orc round-trips a task table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "s", "v")
    graft.etl.FileSink.writeOrc(df, s"$dir/t")
    val back = graft.etl.FileSink.readOrc(spark, s"$dir/t")
    assert(back.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      == Seq((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("exact dedup groups identical texts, keeps min id") {
    val df = Seq((1L, "aa bb"), (2L, "aa bb"), (3L, "cc")).toDF("id", "text")
    val got = Dedup.exact(df, "id", "text").collect()
      .map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies"))).toSet
    assert(got == Set((1L, 2L), (3L, 1L)))
  }

  test("ngram jaccard finds the planted near-duplicate pair only") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy dog again and often"
    val c = "completely different words in this document entirely unrelated text"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "text")
    val got = Dedup.ngramJaccardPairs(df, "id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
    assert(got.toSeq == Seq((1L, 2L)))
  }

  test("minhash lsh recovers near-identical pairs and skips distinct ones") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val b = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w13"
    val c = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "text")
    val got = Dedup.minhashLshPairs(df, "id", "text")
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(got.contains((1L, 2L)) && !got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash distance 0 for identical token multisets") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "delta gamma beta alpha"),
      (3L, "zz yy xx ww vv uu")).toDF("id", "text")
    val got = Dedup.simhashPairs(df, "id", "text").collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Int]("hamming")))
    assert(got.toSeq == Seq((1L, 2L, 0)))
  }

  test("knn brute ranks an identical vector first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f, 0.0f), 0),   // identical to query
      (2L, Array(0.0f, 1.0f, 0.0f), 1),
      (3L, Array(0.9f, 0.1f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val got = Similarity.knnBrute(vecs, "vec_id", "embedding", 0L, 2, Seq("label"))
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(got == Seq(1L, 3L))
  }

  test("language id picks the majority stopword profile") {
    val df = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "der hund und die katze ist ein tier")).toDF("id", "text")
    val got = TextAnalysis.langId(df, "id", "text").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("lang_guess")).toMap
    assert(got == Map(1L -> "en", 2L -> "de"))
  }

  test("fingerprint equates normalization-equal documents") {
    val df = Seq((1L, "Hello,   World!"), (2L, "hello world"), (3L, "bye")).toDF("id", "text")
    val got = TextAnalysis.fingerprint(df, "id", "text").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("group_size"), r.getAs[Boolean]("is_canonical")))
    assert(got.toSet == Set((1L, 2L, true), (2L, 2L, false), (3L, 1L, true)))
  }

  test("as-of join fills latest earlier value per key") {
    val left = Seq((1L, "2024-01-01 10:00:00", "e1"), (1L, "2024-01-01 12:00:00", "e2"))
      .toDF("k", "t", "ev").withColumn("t", col("t").cast("timestamp"))
    val right = Seq((1L, "2024-01-01 09:00:00", 5.0), (1L, "2024-01-01 11:00:00", 7.0),
      (1L, "2024-01-01 13:00:00", 9.0))
      .toDF("k", "rt", "price").withColumn("rt", col("rt").cast("timestamp"))
    val got = AsOf.asOfJoin(left, right, "k", "t", "rt", Seq("price"))
      .orderBy("t").collect().map(r => (r.getAs[String]("ev"), r.getAs[Double]("price")))
    assert(got.toSeq == Seq(("e1", 5.0), ("e2", 7.0)))
  }

  test("sessionize splits on gaps in both window and stateful forms") {
    val base = 1700000000000000L
    val evs = Seq(
      Sessionize.Ev(1L, base, 1.0),
      Sessionize.Ev(1L, base + 60L * 1000000, 2.0),            // +1 min: same session
      Sessionize.Ev(1L, base + 7200L * 1000000, 3.0),          // +2 h: new session
      Sessionize.Ev(2L, base, 4.0))
    // batch/window form
    val df = evs.toDF().select(col("user_id"),
      timestamp_micros(col("ts_us")).as("ts"), col("value"),
      col("ts_us").as("event_id"))
    val w = EventStreams.sessionize(df, 30).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
    assert(w.toSet == Set((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0)))
    // stateful fold (the flatMapGroupsWithState transition function)
    val (closed, open) = Sessionize.fold(evs.filter(_.user_id == 1L), Sessionize.gapUs(30), None)
    assert(closed.map(s => (s.n, s.total)) == Seq((2L, 3.0)))
    assert(open.map(s => (s.n, s.total)).contains((1L, 3.0)))
  }

  test("multimodal manifest + feature extraction round-trips deterministically") {
    val df = Seq((1L, "abcdef"), (2L, "ghijkl")).toDF("doc_id", "text")
    val m = Multimodal.manifest(df, "doc_id", "text")
    assert(m.schema("payload").dataType.typeName == "binary")
    val f1 = Multimodal.extractFeatures(spark, m).collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(spark, m).collect().sortBy(_.asset_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.forall(_.hist_e4.length == 8))
  }

  test("ivf ann returns neighbors from probed clusters ranked by cosine") {
    val rng = new scala.util.Random(7)
    val vecs = (0L until 60L).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f) else Array(0.0f, 1.0f)
      (i, base.map(_ + rng.nextFloat() * 0.01f), (i % 2).toInt)
    }.toDF("vec_id", "embedding", "label")
    val got = Similarity.ivfAnn(vecs, "vec_id", "embedding", 0L, 5,
      nCentroids = 2, nProbe = 1, extraCols = Seq("label"))
      .collect().map(_.getAs[Int]("label"))
    assert(got.length == 5 && got.forall(_ == 0))
  }

  test("resize plan letterboxes: one axis exact, nothing exceeds the box") {
    val df = (1L to 200L).map(i => (i, s"payload-$i-${"x" * (i % 37).toInt}"))
      .toDF("doc_id", "text")
    val rows = Multimodal.resizePlan(Multimodal.manifest(df, "doc_id", "text"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(w <= 224 && h <= 224 && (w == 224 || h == 224))
      assert(r.getAs[Int]("pad_x") >= 0 && r.getAs[Int]("pad_y") >= 0)
    }
  }

  test("z-order key interleaves bits (known values) and round-trips a write") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("x", "y")
    val got = df.select(Layout.zOrder2(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (3,5): x bits → 0,2; y bits → 1,5  ⇒  1+4+2+32 = 39
    assert(got == Seq(0L, 1L, 2L, 3L, 39L))
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toString
    Layout.zOrderWrite(df, s"$dir/z", "x", "y")
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == 5 && back.columns.toSet == Set("x", "y"))
  }

  test("connected components matches union-find on random graphs") {
    val rng = new scala.util.Random(42)
    (0 until 3).foreach { _ =>
      val n = 40
      val edges = (0 until 50).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: plain union-find on the driver
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> {
          // canonical label = min node in the component
          val root = find(v.toInt)
          (0 until n).filter(u => find(u) == root).min.toLong
        }).toMap
      val got = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("component")).toMap
      assert(got == expected)
    }
  }

  test("spark.graft.materialize=none yields identical results (no checkpoint)") {
    // the conf trades recompute-per-consumer for fault tolerance and a
    // leak-free block manager (pipeline use); results must not change
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run() = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleFreq = 100)
      .collect().map(_.toSeq).toSet
    val checkpointed = run()
    // drop the blocks THAT run checkpointed (and anything a previous
    // test pinned) so the emptiness check below sees only the none-run
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.conf.set("spark.graft.materialize", "none")
    try {
      val recomputed = run()
      assert(recomputed == checkpointed)
      // and no blocks were pinned into the block manager
      assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    } finally spark.conf.unset("spark.graft.materialize")
  }
}
