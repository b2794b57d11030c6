package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * File-level and semantic contract of the persisted-index APPEND
 * family — the write half of the incremental story (probes were
 * proven in MinhashIndexSpec/AnnIndexSpec/IvfIndexSpec/Sq8IndexSpec):
 *
 *  - appends are purely additive: every pre-existing data file is
 *    untouched (name→size snapshot before/after);
 *  - the append's commit footprint is BATCH-sized: files are added
 *    only under the (band/bucket/cluster) directories the batch
 *    touches, one file per touched directory (the repartition-by-
 *    target-directory clustering), never corpus-sized;
 *  - the incremental path equals the from-scratch path: for the
 *    deterministic seeded indexes (minhash, banded ANN) probe-after-
 *    append is compared against probe-after-full-rebuild; for the
 *    frozen-parameter indexes (IVF, SQ8, PQ — a rebuild refits the
 *    model, so rebuild-equality is not the contract) the appended
 *    rows are checked against an INDEPENDENT driver-side
 *    reimplementation of the assignment/encoding math from the
 *    persisted parameters.
 */
class IndexAppendSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, dir)
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def assertUntouched(before: Map[String, Long],
      after: Map[String, Long]): Unit = {
    val touched = before.filter { case (f, sz) => !after.get(f).contains(sz) }
    assert(touched.isEmpty, s"append rewrote pre-existing files: $touched")
    assert(after.size > before.size, "append added no files")
  }

  test("minhash append: additive, batch-sized commits, probe == rebuild") {
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val batch = docs.filter(col("doc_id") % 10 === 9)
    val base = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 9)
    val root = graft.Scratch.tempDir("graft_app_mh")
    val idx = root + "/idx"
    val rebuilt = root + "/rebuilt"
    Dedup.minhashIndexWrite(base, "doc_id", "text", idx)
    val before = graft.Scratch.parquetFiles(idx)
    Dedup.minhashIndexAppend(batch, idx, "doc_id", "text")
    val after = graft.Scratch.parquetFiles(idx)
    assertUntouched(before, after)

    // commit footprint of the PARTITIONED band table: one new file per
    // (band, bucket_p) directory the batch touches — the repartition
    // clusters each directory's rows into the single task that owns
    // it. (The flat sigs table appends at write parallelism — a
    // corpus-sized table must never funnel through one task — so its
    // file count is task-count-sized, not directory-bounded.)
    val newFiles = after.keySet.diff(before.keySet)
    val newBandFiles = newFiles.filter(_.contains("band="))
    val touchedDirs = newBandFiles
      .map(f => f.split("/").dropRight(1).mkString("/"))
    assert(newBandFiles.size == touchedDirs.size,
      s"${newBandFiles.size} band files added across ${touchedDirs.size} " +
        "directories — append wrote multiple files into one directory")
    // and bounded by the layout (16 bands × 64 bucket dirs), never the
    // corpus: the batch is ~10% of 500 docs, so well under the cap
    assert(newBandFiles.size <= 16 * 64)
    assert(newFiles.exists(_.contains("sigs")), "no sig file appended")

    // incremental == from-scratch, including the estimate column
    Dedup.minhashIndexWrite(docs.filter(col("doc_id") % 10 =!= 0),
      "doc_id", "text", rebuilt)
    def probeSet(p: String) =
      Dedup.minhashProbe(incoming, p, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pa = probeSet(idx)
    assert(pa.nonEmpty)
    assert(pa == probeSet(rebuilt))
  }

  test("banded ANN append: additive and probe == rebuild") {
    val batch = emb.filter(col("vec_id") % 10 === 9)
    val base = emb.filter(col("vec_id") % 10 =!= 9)
    val root = graft.Scratch.tempDir("graft_app_ann")
    val idx = root + "/idx"
    val rebuilt = root + "/rebuilt"
    Similarity.annIndexWrite(base, "vec_id", "embedding", idx, dim = 64)
    val before = graft.Scratch.parquetFiles(idx)
    Similarity.annIndexAppend(batch, "vec_id", "embedding", idx, dim = 64)
    val after = graft.Scratch.parquetFiles(idx)
    assertUntouched(before, after)

    Similarity.annIndexWrite(emb, "vec_id", "embedding", rebuilt, dim = 64)
    val q = emb.filter(col("vec_id") === 0L)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
      .head().getSeq[Double](0).toArray
    def top(p: String) =
      Similarity.annProbe(spark, p, "vec_id", q, k = 10, dim = 64,
          excludeId = Some(0L))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val ta = top(idx)
    assert(ta.nonEmpty)
    assert(ta == top(rebuilt))
  }

  test("IVF append: additive; appended clusters match independent driver math") {
    val batch = emb.filter(col("vec_id") % 10 === 9)
    val base = emb.filter(col("vec_id") % 10 =!= 9)
    val root = graft.Scratch.tempDir("graft_app_ivf")
    val idx = root + "/idx"
    Similarity.ivfIndexWrite(base, "vec_id", "embedding", idx)
    val before = graft.Scratch.parquetFiles(idx)
    Similarity.ivfIndexAppend(batch, "vec_id", "embedding", idx)
    val after = graft.Scratch.parquetFiles(idx)
    assertUntouched(before, after)

    // independent reimplementation: nearest persisted centroid by
    // squared euclidean, ties to the lowest cluster id — plain scala
    // on the driver, no shared code with the codegen'd expression
    val centers = spark.read.parquet(idx.stripSuffix("/") + "_centroids")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    def nearest(v: Seq[Double]): Int =
      centers.toSeq.sortBy(_._1).minBy { case (_, c) =>
        c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum }._1
    val expected = batch
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")))
      .collect().map(r => r.getLong(0) -> nearest(r.getSeq[Double](1))).toMap
    val written = spark.read.parquet(idx)
      .join(batch.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(written.keySet == expected.keySet)
    val diverged = written.filter { case (id, c) => expected(id) != c }
    assert(diverged.isEmpty, s"cluster assignment diverged: $diverged")
  }

  test("SQ8 append: additive; appended codes match independent driver math") {
    val batch = emb.filter(col("vec_id") % 10 === 9)
    val base = emb.filter(col("vec_id") % 10 =!= 9)
    val root = graft.Scratch.tempDir("graft_app_sq8")
    val idx = root + "/idx"
    Similarity.sq8IndexWrite(base, "vec_id", "embedding", idx, dim = 64)
    val before = graft.Scratch.parquetFiles(idx)
    Similarity.sq8IndexAppend(batch, "vec_id", "embedding", idx)
    val after = graft.Scratch.parquetFiles(idx)
    assertUntouched(before, after)

    val prm = spark.read.parquet(idx.stripSuffix("/") + "_params")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    def encode(v: Seq[Double]): Seq[Byte] = {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.indices.map { i =>
        val (_, mn, mx) = prm(i)
        val scale = if (mx - mn > 0) 255.0 / (mx - mn) else 0.0
        val q = Math.round((v(i) / nrm - mn) * scale)
        Math.max(0L, Math.min(255L, q)).toByte
      }
    }
    val expected = batch
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")))
      .collect().map(r => r.getLong(0) -> encode(r.getSeq[Double](1))).toMap
    val written = spark.read.parquet(idx)
      .join(batch.select(col("vec_id").as("id")), Seq("id"), "left_semi")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(written.keySet == expected.keySet)
    val diverged = written.filter { case (id, c) => expected(id) != c }
    assert(diverged.isEmpty, s"SQ8 codes diverged: ${diverged.keySet}")
  }

  test("PQ append: additive; appended codes match independent driver math") {
    val batch = emb.filter(col("vec_id") % 10 === 9)
    val base = emb.filter(col("vec_id") % 10 =!= 9)
    val root = graft.Scratch.tempDir("graft_app_pq")
    val idx = root + "/idx"
    val (m, ksub) = (16, 16)
    Similarity.pqIndexWrite(base, "vec_id", "embedding", idx, dim = 64)
    val before = graft.Scratch.parquetFiles(idx)
    Similarity.pqIndexAppend(batch, "vec_id", "embedding", idx)
    val after = graft.Scratch.parquetFiles(idx)
    assertUntouched(before, after)

    // independent PQ encode: per subspace, nearest persisted
    // sub-centroid of the normalized vector, packed 4 bits per code
    val cb = spark.read.parquet(idx.stripSuffix("/") + "_codebook")
      .collect().map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3)))
      .toMap
    val subDim = 64 / m
    def encode(v: Seq[Double]): Long = {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      val u = v.map(_ / nrm)
      (0 until m).foldLeft(0L) { (code, s) =>
        val best = (0 until ksub).minBy { c =>
          (0 until subDim).map { d =>
            val diff = u(s * subDim + d) - cb((s, c, d)); diff * diff
          }.sum
        }
        code | (best.toLong << (s * 4))
      }
    }
    val expected = batch
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")))
      .collect().map(r => r.getLong(0) -> encode(r.getSeq[Double](1))).toMap
    val written = spark.read.parquet(idx)
      .join(batch.select(col("vec_id").as("id")), Seq("id"), "left_semi")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(written.keySet == expected.keySet)
    val diverged = written.filter { case (id, c) => expected(id) != c }
    assert(diverged.isEmpty, s"PQ codes diverged: ${diverged.keySet}")
  }
}
