package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The residual IVF-PQ index exists to quantize FINER at the same byte
 * budget — so this spec measures exactly that: the mean ADC estimation
 * error |est_ip − true_ip| of the residual index must come in BELOW the
 * non-residual index's on identical data, identical (m, ksub), and an
 * identical query. Both estimates are recomputed driver-side from the
 * two indexes' persisted model parameters (centroids + codebooks), so
 * the comparison tests the quantization geometry itself, not plan
 * details. Plus the family contracts: recall floor, both scan cuts in
 * one probe, append-under-frozen-parameters parity.
 */
class IvfPqResidualSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val nCentroids = 16
  private val m = 16
  private val ksub = 16
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def queryVec: Array[Double] =
    emb.filter(col("vec_id") === 0L).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** Sampled unit vectors, id-ordered (deterministic). */
  private def sampleUnits(n: Int): Array[Array[Double]] =
    emb.orderBy("vec_id").limit(n).select("embedding").collect()
      .map(r => unit(r.getSeq[Float](0).map(_.toDouble).toArray))

  private def loadCenters(path: String): Array[Array[Double]] = {
    val rows = spark.read.parquet(path + "_centroids").collect()
    val n = rows.map(_.getInt(0)).max + 1
    val dim = rows.map(_.getInt(1)).max + 1
    val out = Array.fill(n)(new Array[Double](dim))
    rows.foreach(r => out(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    out
  }

  private def loadCodebook(path: String): (Array[Double], Int) = {
    val cb = spark.read.parquet(path + "_codebook").collect()
    val subDim = cb.map(_.getInt(2)).max + 1
    val flat = new Array[Double](m * ksub * subDim)
    cb.foreach { r =>
      flat((r.getInt(0) * ksub + r.getInt(1)) * subDim + r.getInt(2)) =
        r.getDouble(3)
    }
    (flat, subDim)
  }

  /** Driver-side PQ encode + LUT estimate: Σ_s ⟨qu_s, cb[s][argmin]⟩. */
  private def adcEstimate(qu: Array[Double], v: Array[Double],
      codebook: Array[Double], subDim: Int): Double = {
    var est = 0.0
    var s = 0
    while (s < m) {
      val off = s * subDim
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < ksub) {
        var d = 0.0; var i = 0
        while (i < subDim) {
          val x = v(off + i) - codebook((s * ksub + c) * subDim + i)
          d += x * x; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      var i = 0
      while (i < subDim) {
        est += qu(off + i) * codebook((s * ksub + best) * subDim + i)
        i += 1
      }
      s += 1
    }
    est
  }

  private def nearest(u: Array[Double], centers: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < centers.length) {
      var d = 0.0; var i = 0
      while (i < u.length) { val x = u(i) - centers(c)(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  test("residual codes estimate the inner product with LESS error than non-residual") {
    val root = graft.Scratch.tempDir("graft_ivfpqr_err")
    val nr = root + "/nr"
    val rs = root + "/rs"
    Similarity.ivfpqIndexWrite(emb, "vec_id", "embedding", nr, dim = 64,
      nCentroids = nCentroids)
    Similarity.ivfpqrIndexWrite(emb, "vec_id", "embedding", rs, dim = 64,
      nCentroids = nCentroids)

    val qu = unit(queryVec)
    val (nrCb, nrSub) = loadCodebook(nr)
    val (rsCb, rsSub) = loadCodebook(rs)
    val rsCenters = loadCenters(rs)
    val sample = sampleUnits(200)

    val (nrErrSum, rsErrSum) = sample.foldLeft((0.0, 0.0)) {
      case ((ne, re), u) =>
        val truth = qu.zip(u).map { case (a, b) => a * b }.sum
        val nrEst = adcEstimate(qu, u, nrCb, nrSub)
        val c = nearest(u, rsCenters)
        val r = u.indices.map(i => u(i) - rsCenters(c)(i)).toArray
        val clusterIp = qu.zip(rsCenters(c)).map { case (a, b) => a * b }.sum
        val rsEst = clusterIp + adcEstimate(qu, r, rsCb, rsSub)
        (ne + math.abs(nrEst - truth), re + math.abs(rsEst - truth))
    }
    val (nrErr, rsErr) = (nrErrSum / sample.length, rsErrSum / sample.length)
    info(f"mean |ADC − true IP|: non-residual $nrErr%.5f, residual $rsErr%.5f")
    assert(rsErr < nrErr,
      f"residual quantization is not finer: $rsErr%.5f >= $nrErr%.5f")
  }

  test("one probe gets the partition prune AND the codes-only scan, at the recall floor") {
    val path = graft.Scratch.tempDir("graft_ivfpqr_probe") + "/idx"
    Similarity.ivfpqrIndexWrite(emb, "vec_id", "embedding", path, dim = 64,
      nCentroids = nCentroids)
    val probe = Similarity.ivfpqrProbe(spark, path, emb, "vec_id", "embedding",
      queryVec, k = 10, nProbe = 2, excludeId = Some(0L))
    assert(probe.collect().nonEmpty)
    val planText = probe.queryExecution.executedPlan.toString
    assert(planText.contains("PartitionFilters:") && planText.contains("cluster#"),
      s"no partition filter on cluster:\n$planText")
    val codeScan = planText.linesIterator
      .filter(_.contains("ReadSchema")).find(_.contains("code"))
    assert(codeScan.isDefined, "no code-table scan found")
    assert(!codeScan.get.contains("embedding") && !codeScan.get.contains("v:"),
      s"code scan reads vector bytes: ${codeScan.get}")

    val exact = Similarity.knnBrute(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val got = Similarity.ivfpqrProbe(spark, path, emb, "vec_id", "embedding",
        queryVec, k = 10, nProbe = 8, excludeId = Some(0L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact intersect got).size / 10.0
    info(s"ivfpq_residual recall@10 = $recall")
    assert(recall >= 0.5, s"recall $recall below registry floor 0.5")
  }

  test("append under frozen quantizer+codebook: probe parity with a frozen rebuild") {
    val base = emb.filter(col("vec_id") % 4 =!= 3)
    val batch = emb.filter(col("vec_id") % 4 === 3)
    val root = graft.Scratch.tempDir("graft_ivfpqr_app")
    val idx = root + "/idx"
    Similarity.ivfpqrIndexWrite(base, "vec_id", "embedding", idx, dim = 64,
      nCentroids = nCentroids)
    Similarity.ivfpqrIndexAppend(batch, "vec_id", "embedding", idx)

    val idx2 = root + "/idx2"
    Similarity.ivfpqrIndexWrite(base, "vec_id", "embedding", idx2, dim = 64,
      nCentroids = nCentroids)
    Similarity.ivfpqrIndexAppend(batch.filter(col("vec_id") % 8 === 3),
      "vec_id", "embedding", idx2)
    Similarity.ivfpqrIndexAppend(batch.filter(col("vec_id") % 8 =!= 3),
      "vec_id", "embedding", idx2)

    val a = Similarity.ivfpqrProbe(spark, idx, emb, "vec_id", "embedding",
      queryVec, k = 20, nProbe = 8).collect().map(_.toString).toSeq
    val b = Similarity.ivfpqrProbe(spark, idx2, emb, "vec_id", "embedding",
      queryVec, k = 20, nProbe = 8).collect().map(_.toString).toSeq
    assert(a == b,
      "append slicing changed probe results under frozen parameters")

    val n = emb.count().toInt
    val ids = Similarity.ivfpqrProbe(spark, idx, emb, "vec_id", "embedding",
        queryVec, k = n + 10, nProbe = nCentroids, refine = 1)
      .select("vec_id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length, "a row appears twice")
    assert(ids.length == n, s"expected $n visible rows, got ${ids.length}")
  }
}
