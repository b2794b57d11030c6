package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Executed-plan audit of the composed curation pipeline
 * (`pipeline_curate`): the stages must SHARE work, not re-derive it —
 * the raw corpus is scanned a bounded number of times no matter how
 * many stages consume the survivors (the exact-dedup output is
 * materialized once; later stages read that). This is the check that
 * found quality_classify's 5-scan bug in r8 — composition is where
 * redundant scans hide, because each operator looks clean alone.
 */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def scans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] = p match {
    case f: FileSourceScanExec => Seq(f)
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
    case other => other.children.flatMap(scans)
  }

  test("pipeline output is plausible and corpus scans are bounded") {
    val df = graft.queries.TrainingDataQueries.pipelineCurate(spark, dir)
    val rows = df.collect()
    // survivors exist, and every stage actually dropped something:
    // the manifest is strictly smaller than the raw corpus
    val total = graft.Tables.documents(spark, dir).count()
    assert(rows.nonEmpty)
    assert(rows.length < total,
      s"pipeline kept ${rows.length} of $total docs — nothing was curated")
    // manifest invariants: ids strictly increasing, token offsets are
    // the exclusive running sum in id order
    val byId = rows.sortBy(_.getLong(0))
    assert(byId.map(_.getLong(0)).distinct.length == byId.length)
    var expectedStart = 0L
    byId.foreach { r =>
      assert(r.getLong(4) == expectedStart,
        s"doc ${r.getLong(0)}: token_start ${r.getLong(4)} != $expectedStart")
      expectedStart += r.getLong(3)
    }

    // scan audit: the documents parquet appears in the FINAL executed
    // plan only for the two holdout branches (train + eval side of the
    // decontamination join) plus bounded slack — NOT once per stage.
    // 6 stages; the bound is stages + 2.
    val docScans = scans(df.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("documents")))
    assert(docScans.size <= 6 + 2,
      s"pipeline re-scans the corpus ${docScans.size} times (> stages+2)")
  }
}
