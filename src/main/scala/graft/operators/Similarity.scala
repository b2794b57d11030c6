package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Scale design: brute-force cosine is the correctness baseline — one
 * scan, no shuffle, fully codegen'd column math (zip_with/aggregate),
 * top-k via orderBy+limit which Spark executes as a per-partition
 * TakeOrdered then a driver merge of k·numPartitions rows, never a full
 * sort. The LSH path prunes with a 16-bit random-hyperplane code so the
 * full dot product only runs on candidates; at cluster scale the codes
 * become the bucketing/partition key so a query touches only its
 * bucket's partitions.
 */
object Similarity {

  /** Cast to double and attach the L2 norm. */
  private def withNorm(df: DataFrame, idCols: Seq[String], vecCol: String): DataFrame =
    df.select(idCols.map(col) :+ transform(col(vecCol), _.cast("double")).as("v"): _*)
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /**
   * Exact top-k by cosine against the embedding of `queryId`.
   * The query vector rides along as a broadcast nested-loop join of a
   * 1-row relation — no shuffle of the corpus.
   */
  def knnBrute(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, extraCols: Seq[String] = Nil): DataFrame = {
    val corpus = withNorm(df, idCol +: extraCols, vecCol)
    val query = withNorm(df.filter(col(idCol) === queryId), Seq(idCol), vecCol)
      .select(col("v").as("qv"), col("nrm").as("qnrm"))
    corpus.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(query))
      .withColumn("cos", round(dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6))
      .select((idCol +: extraCols).map(col) :+ col("cos"): _*)
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * 16-bit random-hyperplane code: bit p = sign(v · plane_p).
   * Planes are pseudo-random but deterministic (seeded), generated
   * driver-side as literals — they are model parameters, not data.
   */
  def hyperplaneCode(vecCol: Column, dim: Int, nPlanes: Int = 16,
      seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val planes = Array.fill(nPlanes, dim)(rng.nextGaussian())
    val bits = (0 until nPlanes).map { p =>
      val plane = array(planes(p).map(w => lit(w)): _*)
      val d = aggregate(zip_with(vecCol, plane, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }
    bits.reduce(_ + _)
  }

  /**
   * ANN top-k: prune to vectors whose hyperplane code is within
   * `maxCodeHamming` bits of the query's code, then exact cosine on
   * the surviving candidates only.
   */
  def annLsh(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, dim: Int,
      maxCodeHamming: Int = 4, extraCols: Seq[String] = Nil): DataFrame = {
    val coded = withNorm(df, idCol +: extraCols, vecCol)
      .withColumn("code", hyperplaneCode(col("v"), dim))
    val query = coded.filter(col(idCol) === queryId)
      .select(col("v").as("qv"), col("nrm").as("qnrm"), col("code").as("qcode"))
    coded.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(query))
      .filter(bit_count(col("code").bitwiseXOR(col("qcode"))) <= maxCodeHamming)
      .withColumn("cos", round(dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6))
      .select((idCol +: extraCols).map(col) :+ col("cos"): _*)
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
