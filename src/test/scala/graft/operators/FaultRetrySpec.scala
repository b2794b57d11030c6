package graft.operators

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JVM-wide one-shot fault switch the injected expression reads. An
  * object (not spec state) so executor-side code in local mode sees
  * the same flags. */
object FaultInject {
  val armed = new AtomicBoolean(false)
  val fired = new AtomicBoolean(false)
  def arm(): Unit = { fired.set(false); armed.set(true) }
}

/**
 * Recompute-safety under task failure — the claim the RangeSlice /
 * CC-loop docs argue ("executor loss just recomputes") but r10 never
 * tested: a task that fails ONCE and is retried by the scheduler must
 * leave the operator's output BYTE-IDENTICAL to a clean run. The
 * dangerous class is operators built on driver-sampled literals
 * (RangeSlice's slice bounds) or iterative materialization (the CC
 * loop): if a retry RE-SAMPLED or re-derived anything, the retried
 * partition would disagree with its neighbors — silently.
 *
 * Injection: a one-shot UDF gate (`FaultInject`) wrapped around the
 * input as a no-op filter — the first task attempt that evaluates it
 * throws, every later evaluation passes. Task retries need a
 * local-mode master with maxFailures > 1 (`local[4, 2]`); suites
 * share one JVM-wide SparkContext, so this spec stops whatever
 * context is active, runs against its own retry-capable one, and
 * stops it again at the end (suites run sequentially in the forked
 * test JVM and every suite builds its session lazily via getOrCreate,
 * so the next suite just creates a fresh standard context).
 */
class FaultRetrySpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private def withRetrySession[A](f: SparkSession => A): A = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[4, 2]") // 2 task attempts: one injected failure + retry
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(spark)
    finally spark.stop()
  }

  private val faultOnce = udf((x: Long) => {
    val tc = TaskContext.get()
    if (tc != null && tc.attemptNumber() == 0 &&
        FaultInject.armed.compareAndSet(true, false)) {
      FaultInject.fired.set(true)
      throw new RuntimeException("graft-fault-injection: one-shot task failure")
    }
    x
  })

  /** No-op filter that forces the fault gate into the scan stage. */
  private def inject(df: DataFrame, idCol: String): DataFrame =
    df.filter(faultOnce(col(idCol)) === col(idCol))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("one-shot task failures recompute to byte-identical output") {
    withRetrySession { spark =>
      val docs = graft.Tables.documents(spark, dir)
      val toks = graft.operators.TextAnalysis
        .tokenCounts(docs, "doc_id", "text")
        .select(col("doc_id"), col("bpe_tokens"))

      // seq_pack: RangeSlice prefix sums over driver-sampled bounds
      val packClean = rows(Curation.sequencePack(toks, "doc_id",
        "bpe_tokens", capacity = 512L))
      FaultInject.arm()
      val packFaulty = rows(Curation.sequencePack(inject(toks, "doc_id"),
        "doc_id", "bpe_tokens", capacity = 512L))
      assert(FaultInject.fired.get, "seq_pack: injected fault never fired")
      assert(packFaulty == packClean,
        "seq_pack output changed under a retried task")

      // train_shards: seeded global-shuffle order + token-budget shards
      val wtoks = graft.operators.TextAnalysis
        .tokenCounts(docs, "doc_id", "text")
        .select(col("doc_id"), col("ws_tokens"))
      val shardsClean = rows(Curation.shuffleShards(wtoks, "doc_id",
        "ws_tokens", shardTokens = 2048L))
      FaultInject.arm()
      val shardsFaulty = rows(Curation.shuffleShards(inject(wtoks, "doc_id"),
        "doc_id", "ws_tokens", shardTokens = 2048L))
      assert(FaultInject.fired.get, "train_shards: injected fault never fired")
      assert(shardsFaulty == shardsClean,
        "train_shards output changed under a retried task")

      // dedup_components: the iterative CC loop (localCheckpoint rounds)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleFreq = 100)
      val ccClean = rows(Dedup.connectedComponents(pairs, "id1", "id2"))
      FaultInject.arm()
      val ccFaulty = rows(Dedup.connectedComponents(
        inject(pairs, "id1"), "id1", "id2"))
      assert(FaultInject.fired.get, "cc: injected fault never fired")
      assert(ccFaulty == ccClean,
        "connectedComponents output changed under a retried task")

      // RangeSlice primitive itself: slice ids from sampled bounds
      val base = docs.select(col("doc_id"), col("n_chars"))
      val sliceClean = rows(RangeSlice.withSliceId(base,
        Seq(col("doc_id")), 4, "sid"))
      FaultInject.arm()
      val sliceFaulty = rows(RangeSlice.withSliceId(
        inject(base, "doc_id"), Seq(col("doc_id")), 4, "sid"))
      assert(FaultInject.fired.get, "range_slice: injected fault never fired")
      assert(sliceFaulty == sliceClean,
        "RangeSlice ids changed under a retried task")
    }
  }
}
