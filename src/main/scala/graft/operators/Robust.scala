package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Robust (median/MAD) outlier detection — the anomaly screen a data
 * pipeline runs over metric streams before training on or aggregating
 * them. Mean/stddev z-scores are themselves corrupted by the outliers
 * they hunt (one 10⁶× spike inflates σ until nothing is 3σ out);
 * median and MAD (median absolute deviation) have a 50% breakdown
 * point, and `|x − med| > z·1.4826·MAD` is the standard robust cut
 * (1.4826 scales MAD to σ under normality).
 *
 * Both medians come from [[Quantiles.exactPercentilesByGroup]] — the
 * distributed exact-percentile operator — NOT Spark's `percentile()`
 * aggregate, which buffers every value of a group in one aggregation
 * buffer (with bounded group cardinality and 100 TB of rows, that is
 * the whole column on one executor). Nothing here holds more than a
 * range-slice partition resident; the per-group medians re-enter the
 * row scan as broadcast joins.
 *
 * Caller contract: `groupCol` is a bounded-cardinality dimension
 * (event type, status, region — the broadcast of per-group medians is
 * group-count-sized), and the input has deterministic lineage
 * (inherited from RangeSlice; persist nondeterministic inputs first).
 */
object Robust {

  /**
   * Rows whose value is a robust outlier within its group. NULL values
   * are ignored (they get no rank, exactly as `percentile()` skips
   * them). A group with MAD = 0 (over half its values equal the
   * median) emits no outliers — the cut is undefined there; callers
   * wanting a discrete-data variant can pre-bucket.
   *
   * @return outlier rows: idCol, groupCol, valueCol, med, mad
   *         (rounded to 6), robust_z (rounded to 4)
   */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, zThreshold: Double = 3.5): DataFrame = {
    // materialized (Dedup.materialize contract, conf-gated): the two
    // percentile passes and the scoring join each re-derive this
    // narrow projection — and each percentile pass itself reads its
    // input from several branches (slice sample, offsets, ranking).
    // Unmaterialized, the executed plan scans the source 21 times;
    // frozen, once. Also pins the deterministic-input precondition
    // RangeSlice documents.
    val base = Dedup.materialize(df
      .select(col(groupCol), col(idCol), col(valueCol).cast("double").as("_rv"))
      .filter(col("_rv").isNotNull))
    val med = Quantiles.exactPercentilesByGroup(
      base, groupCol, "_rv", Seq(idCol), Seq(("med", 0.5)))
    val withMed = base.join(broadcast(med), Seq(groupCol))
      .withColumn("_adev", abs(col("_rv") - col("med")))
    val mad = Quantiles.exactPercentilesByGroup(
      withMed.select(col(groupCol), col(idCol), col("_adev")),
      groupCol, "_adev", Seq(idCol), Seq(("mad", 0.5)))
    withMed.join(broadcast(mad), Seq(groupCol))
      .filter(col("mad") > 0 &&
        col("_adev") > lit(zThreshold * 1.4826) * col("mad"))
      .select(col(idCol), col(groupCol), col("_rv").as(valueCol),
        round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
        round((col("_rv") - col("med")) / (lit(1.4826) * col("mad")), 4)
          .as("robust_z"))
      .orderBy(col(idCol))
  }

  /**
   * Embedding-space outlier screen — flag vectors far from the corpus
   * centroid by robust (median/MAD) distance statistics: the
   * off-manifold/noise detector a curation pipeline runs before
   * semantic dedup or clustering trusts the embeddings. Every row is
   * returned with its score (not just outliers), so the screen
   * doubles as a ranking signal.
   *
   * Scale shape: the centroid is ONE per-dim aggregate (dim-keyed,
   * `dim` rows out) collected as model parameters — the same class as
   * k-means centroids — and re-enters the scan as a literal array, so
   * the distance pass is a single codegen'd projection with no join.
   * The median/MAD pair reuses the distributed exact-percentile
   * operator (nothing group-sized ever buffers). Distances are
   * rounded to 6 BEFORE the quantiles so both engines rank an
   * identical multiset — the robust stats are then exactly
   * reproducible, not merely close.
   */
  def embeddingOutlierScores(df: DataFrame, idCol: String, vecCol: String,
      zThreshold: Double = 3.5): DataFrame = {
    import graft.functions.VectorFunctions.dotd
    val d = df.select(col(idCol),
      transform(col(vecCol), _.cast("double")).as("v"))
    val cArr = d.select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(avg(col("x")).as("cx"))
      .orderBy(col("dim")).collect().map(_.getDouble(1))
    val cv = array(cArr.map(lit): _*)
    val cn = math.sqrt(cArr.map(x => x * x).sum)
    // materialized for the same multi-consumer reason as madOutliers
    val scored = Dedup.materialize(d
      .withColumn("cos", round(
        dotd(col("v"), cv) / (sqrt(dotd(col("v"), col("v"))) * lit(cn)), 6))
      .withColumn("cdist", round(lit(1.0) - col("cos"), 6))
      .select(col(idCol), col("cos"), col("cdist")))
    val med = Quantiles.exactPercentilesByGroup(
      scored.withColumn("_g", lit(1)), "_g", "cdist", Seq(idCol),
      Seq(("med", 0.5)))
    val withMed = scored.withColumn("_g", lit(1))
      .join(broadcast(med), Seq("_g"))
      .withColumn("adev", abs(col("cdist") - col("med")))
    val mad = Quantiles.exactPercentilesByGroup(
      withMed.select(col("_g"), col(idCol), col("adev")),
      "_g", "adev", Seq(idCol), Seq(("mad", 0.5)))
    withMed.join(broadcast(mad), Seq("_g"))
      .select(col(idCol), col("cos"), col("cdist"),
        round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
        (col("mad") > 0 &&
          col("adev") > lit(zThreshold * 1.4826) * col("mad")).as("is_outlier"),
        when(col("mad") > 0,
          round((col("cdist") - col("med")) / (lit(1.4826) * col("mad")), 4))
          .as("robust_z"))
      .orderBy(col(idCol))
  }
}
