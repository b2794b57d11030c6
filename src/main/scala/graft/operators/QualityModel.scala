package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions.dotd

/**
 * Model-based quality classification — the fasttext-style filter every
 * large training corpus runs: fit a linear classifier on weak labels,
 * then score the whole corpus with the learned model. The registry
 * form DISTILLS the rule-based quality bar (TextAnalysis.qualityScore
 * ≥ 0.5 — a label the oracle recomputes exactly) into a calibrated
 * model, the standard "rules → model" bootstrap when no human labels
 * exist; swapping the weak label for "sampled from a reference
 * corpus" is a one-line change. The mechanism is the point:
 *
 *  - FEATURES are pure codegen'd column expressions (the
 *    TextAnalysis surface statistics — length saturation, word shape,
 *    punctuation/digit density, per-language stopword coverage);
 *  - the FIT is MLlib logistic regression — a distributed
 *    treeAggregate gradient pass per iteration, deterministic for
 *    fixed data (no sampling in LBFGS), yielding ~10 doubles of model
 *    parameters;
 *  - SCORING re-enters the plan as a native expression:
 *    `sigmoid(dotd(features, coef) + intercept)` with the
 *    coefficients as an array literal — codegen'd, no MLlib UDF on
 *    the hot path, so a 100 TB scoring scan is one whole-stage
 *    codegen pass.
 *
 * Coefficients are optimizer output and can differ in late decimals
 * across BLAS builds, so the registry form is SELF-CHECKING: exact
 * counts the oracle recomputes, plus a rank-based exact AUC floor
 * (Mann-Whitney with average ranks, computed distributed) asserted as
 * a flag. QualityModelSpec pins fit determinism in-JVM and the AUC
 * level on testdata.
 */
object QualityModel {

  /** Surface-statistic feature vector (array<double>) per doc. */
  def featurize(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val ws = words(t)
    def ratio(stop: Seq[String]): Column =
      size(filter(ws, w => w.isin(stop: _*))) / size(ws).cast("double")
    df.select(col(idCol),
      array(
        least(lit(1.0), size(ws) / lit(100.0)),
        length(regexp_replace(t, "\\s", "")) / size(ws) / lit(10.0),
        (length(t) - length(regexp_replace(t, "[.,!?;:]", ""))) / length(t).cast("double"),
        (length(t) - length(regexp_replace(t, "[0-9]", ""))) / length(t).cast("double"),
        ratio(TextAnalysis.EnStop), ratio(TextAnalysis.DeStop),
        ratio(TextAnalysis.FrStop), ratio(TextAnalysis.EsStop)
      ).as("features"))
  }

  /** Fit LR on (features, label); returns (coefficients, intercept) —
    * model parameters, driver-held like centroids. */
  def fit(train: DataFrame): (Array[Double], Double) = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val prepared = train.select(
      array_to_vector(col("features")).as("fv"),
      col("label").cast("double").as("label"))
    val model = new LogisticRegression()
      .setFeaturesCol("fv").setLabelCol("label")
      .setMaxIter(50).setRegParam(0.01).setStandardization(true)
      .fit(prepared)
    (model.coefficients.toArray, model.intercept)
  }

  /** Score via the native dot-product expression — codegen'd sigmoid
    * over an array literal of coefficients; no MLlib on the scan. */
  def score(featured: DataFrame, coef: Array[Double],
      intercept: Double): DataFrame = {
    val coefCol = array(coef.map(lit): _*)
    featured.withColumn("score",
      lit(1.0) / (lit(1.0) + exp(-(dotd(col("features"), coefCol) + intercept))))
  }

  /** Exact AUC by Mann-Whitney rank sum with average ranks for ties.
    * Global score ranks come from the RangeSlice prefix-sum pattern
    * (deterministic literal slice bounds on score → per-slice offsets
    * broadcast back → slice-local row_number) — NOT a global-order
    * window, which would sort the whole eval slice on one partition;
    * tie averaging is a score-keyed window. Fully distributed at any
    * eval size. */
  def auc(scored: DataFrame, labelCol: String): Double = {
    val parts = scored.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val sliced = RangeSlice.withSliceId(
      scored.select(col("score"), col(labelCol)),
      Seq(col("score")), parts, "sid")
    val wOff = Window.orderBy(col("sid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sliced.groupBy(col("sid")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("sid"), col("off"))
    val wLocal = Window.partitionBy(col("sid")).orderBy(col("score"))
    val byTie = Window.partitionBy(col("score"))
    val agg = sliced.join(broadcast(offsets), "sid")
      .withColumn("rk", (col("off") + row_number().over(wLocal)).cast("double"))
      .withColumn("avg_rk", avg(col("rk")).over(byTie))
      .agg(
        sum(when(col(labelCol) === 1, col("avg_rk"))).as("rank_sum"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("np"),
        sum(when(col(labelCol) === 1, 0L).otherwise(1L)).as("nn")).head()
    val (rs, np, nn) = (agg.getDouble(0), agg.getLong(1), agg.getLong(2))
    (rs - np.toDouble * (np + 1) / 2) / (np.toDouble * nn)
  }

  /**
   * Self-checking registry form over the documents table: weak label =
   * the heuristic quality bar (quality ≥ 0.5, exactly the
   * oracle-recomputable corpus_curate criterion), fit on every 2nd
   * doc, assert the held-out exact AUC clears `aucFloor` — the model
   * must reproduce the rules' ranking on docs it never saw. The AUC
   * rank machinery is evaluation-only, not part of the scoring scan.
   */
  def classifyChecked(spark: SparkSession, dir: String,
      aucFloor: Double = 0.8): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val q = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("quality"))
    // materialized (Dedup.materialize contract, conf-gated): the
    // regex-heavy featurize+quality pipeline feeds the MLlib fit, the
    // held-out scoring/AUC passes, and the final fold — each would
    // re-run it from the text otherwise
    val labeled = Dedup.materialize(featurize(docs, "doc_id", "text")
      .join(q, "doc_id")
      .withColumn("label", (col("quality") >= 0.5).cast("int")))
    val (coef, b) = fit(labeled.filter(col("doc_id") % 2 === 0))
    val heldOut = score(labeled.filter(col("doc_id") % 2 =!= 0), coef, b)
    val a = auc(heldOut, "label")
    labeled.agg(
        count(lit(1)).as("n_docs"),
        sum(col("label").cast("long")).as("n_ref"),
        sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("n_train"))
      .select(col("n_docs"), col("n_ref"), col("n_train"),
        lit(a >= aucFloor).as("auc_ok"),
        lit(coef.length.toLong).as("n_features"),
        (col("n_ref") > 0 && col("n_ref") < col("n_docs")).as("nonempty"))
  }
}
