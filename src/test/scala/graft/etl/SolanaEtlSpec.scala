package graft.etl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Semantic parity spec for the solana-etl mirror, against hand-built
 * fixture blocks (src/test/resources/blocks): one gzipped block with a
 * successful mixed transaction (coin transfer + inner token transfer +
 * vote) and an errored vote, one plain block with an only-fee
 * transfer, one corrupt file.
 */
class SolanaEtlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val fixtures = getClass.getResource("/blocks").getPath
  private lazy val blocks = BlockIngest.read(spark, s"$fixtures/*")

  test("corrupt files land in the error table, valid blocks parse") {
    assert(BlockIngest.valid(blocks).count() == 2)
    val errs = BlockIngest.errors(blocks).collect()
    assert(errs.length == 1)
    assert(errs.head.getAs[String]("block") == "block_bad.json")
  }

  test("transactions table matches the reference's per-tx metrics") {
    val txs = SolanaTransforms.transactions(blocks)
      .collect().map(r => r.getAs[String]("signature") -> r).toMap
    assert(txs.size == 3)

    val tx1 = txs("sig1")
    assert(tx1.getAs[Boolean]("isSuccessful"))
    assert(tx1.getAs[Long]("fee") == 5000L)
    // outer system-transfer + its inner spl transfer + vote = 3 flattened
    assert(tx1.getAs[Int]("numInstructions") == 3)
    assert(tx1.getAs[String]("programs") ==
      """["11111111111111111111111111111111","TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA","Vote111111111111111111111111111111111111111"]""")
    assert(tx1.getAs[Int]("numAccounts") == 9)
    assert(tx1.getAs[Long]("lamportsOut") == -10005000L)
    assert(tx1.getAs[Long]("lamportsIn") == 9999000L)
    assert(tx1.getAs[Int]("numMints") == 1)
    assert(tx1.getAs[String]("mints") == """["mintM1"]""")
    assert(tx1.getAs[String]("tokensOut") == """{"mintM1":-3.0}""")
    assert(tx1.getAs[String]("tokensIn") == """{"mintM1":3.0}""")
    val byType = tx1.getAs[String]("accountsByType")
    assert(byType.contains(""""SYSVAR":["SysvarC1ock11111111111111111111111111111111"]"""))
    assert(byType.contains(""""TOKEN":["tokA","tokB"]"""))
    assert(byType.contains(""""COIN":["alice","authX","bob"]"""))

    val tx2 = txs("sig2")
    assert(!tx2.getAs[Boolean]("isSuccessful"))
    assert(tx2.getAs[String]("mints") == "[]")

    val tx3 = txs("sig3")
    assert(tx3.getAs[Long]("lamportsOut") == -2005000L)
    assert(tx3.getAs[Long]("lamportsIn") == 2000000L)
    // the spl-memo instruction (parsed = plain string) must not
    // corrupt the row, and its program joins the set
    assert(tx3.getAs[Int]("numInstructions") == 2)
    assert(tx3.getAs[String]("programs").contains("MemoSq4gqABAXKb96qnH8TysNcWxMyWCqXgDLGmfcHr"))
  }

  test("findTransaction locates a transaction by signature") {
    val hit = SolanaTransforms.findTransaction(blocks, "sig2").collect()
    assert(hit.length == 1 && hit.head.getAs[String]("blockhash") == "hashAAA")
    assert(SolanaTransforms.findTransaction(blocks, "nope").isEmpty)
  }

  test("memo text is captured from string-parsed instructions") {
    import org.apache.spark.sql.functions._
    val got = SolanaTransforms.txLevel(blocks)
      .select(explode(col("flat_instr")).as("ins"))
      .filter(col("ins.memo").isNotNull)
      .select(col("ins.memo")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("hello memo"))
  }

  test("transfers table extracts coin and token transfers of successful txs") {
    val rows = SolanaTransforms.transfers(blocks).collect()
      .map(r => (r.getAs[String]("transaction"), r.getAs[String]("mint"),
        r.getAs[String]("source"), r.getAs[String]("destination"),
        r.getAs[Long]("value"), r.getAs[Int]("scale"))).toSet
    assert(rows == Set(
      ("sig1", "sol", "alice", "bob", 10000000L, 9),
      ("sig1", "mintM1", "tokA", "tokB", 300L, 2),
      ("sig3", "sol", "dave", "eve", 2000000L, 9)))
  }

  test("blockInfo matches the reference's 22-column per-block metrics") {
    val byHash = SolanaTransforms.blockInfo(blocks)
      .collect().map(r => r.getAs[String]("hash") -> r).toMap
    val b1 = byHash("hashAAA")
    assert(b1.getAs[Long]("numTransactions") == 2)
    assert(b1.getAs[Long]("numSuccessful") == 1)
    assert(b1.getAs[Long]("successfulVotes") == 1)
    assert(b1.getAs[Long]("successfulTransactionsMoreThanFee") == 1)
    assert(b1.getAs[Long]("successfulTransactionsOnlyFee") == 0)
    assert(b1.getAs[Long]("successfulFees") == 5000)
    assert(b1.getAs[Long]("successfulBalanceChange") == -10005000L)
    assert(b1.getAs[Int]("successfulProgramAccounts") == 3)
    assert(b1.getAs[Int]("successfulCoinAccounts") == 3)
    assert(b1.getAs[Int]("successfulTokenAccounts") == 2)
    assert(b1.getAs[Long]("numErrors") == 1)
    assert(b1.getAs[Long]("errorVotes") == 1)
    assert(b1.getAs[Long]("errorTransactionsOnlyFee") == 1)
    assert(b1.getAs[Long]("errorFees") == 5000)
    assert(b1.getAs[Long]("errorBalanceChange") == -5000L)
    // tx2's program set is {Vote…}; its SYS account key is unused by
    // instructions so it classifies as COIN — faithful to the reference
    assert(b1.getAs[Int]("errorProgramAccounts") == 1)
    assert(b1.getAs[Int]("errorCoinAccounts") == 2)

    val b2 = byHash("hashBBB")
    assert(b2.getAs[Long]("numTransactions") == 1)
    assert(b2.getAs[Long]("successfulTransactionsOnlyFee") == 1)
  }

  test("instruction tree filter keeps outers with matching self or inner") {
    // system:transfer matches tx1's outer[0] itself (its spl inner doesn't match)
    val sys = SolanaTransforms.filterInstructionTree(blocks, "system", "transfer")
      .collect().map(r => r.getAs[String]("signature") ->
        (r.getAs[Int]("n_outer_kept"), r.getAs[Int]("n_inner_kept"))).toMap
    assert(sys("sig1") == (1, 0))
    assert(sys("sig2") == (0, 0))
    assert(sys("sig3") == (1, 0))
    // spl-token:transfer only matches tx1's INNER -> outer kept via inner
    val spl = SolanaTransforms.filterInstructionTree(blocks, "spl-token", "transfer")
      .collect().map(r => r.getAs[String]("signature") ->
        (r.getAs[Int]("n_outer_kept"), r.getAs[Int]("n_inner_kept"))).toMap
    assert(spl("sig1") == (1, 1))
    assert(spl("sig3") == (0, 0))
  }

  test("legacy string accountKeys normalize and flow through transforms") {
    val legacy = BlockIngest.readStringKeys(spark,
      getClass.getResource("/blocks_legacy").getPath + "/*")
    val txs = SolanaTransforms.transactions(legacy).collect()
    assert(txs.length == 1)
    assert(txs.head.getAs[String]("signature") == "sigL1")
    assert(txs.head.getAs[Long]("lamportsOut") == -3005000L)
    val tr = SolanaTransforms.transfers(legacy).collect()
    assert(tr.map(r => (r.getAs[String]("source"), r.getAs[String]("destination"),
      r.getAs[Long]("value"))).toSeq == Seq(("frank", "grace", 3000000L)))
  }

  test("readAuto merges jsonParsed and legacy files, keeps true errors") {
    val root = getClass.getResource("/blocks").getPath
      .stripSuffix("/blocks")
    val auto = BlockIngest.readAuto(spark, s"$root/block*/*.json*")
    assert(BlockIngest.valid(auto).count() == 3)
    assert(SolanaTransforms.transactions(auto).count() == 4)
    assert(BlockIngest.errors(auto).collect()
      .map(_.getAs[String]("block")).toSeq == Seq("block_bad.json"))
  }

  test("readAutoCached routes exactly like readAuto and parses once in the common case") {
    val root = getClass.getResource("/blocks").getPath
      .stripSuffix("/blocks")
    // mixed corpus (jsonParsed + legacy + corrupt): same rows as the
    // declarative form, through the bounded bad-file re-read
    val cached = BlockIngest.readAutoCached(spark, s"$root/block*/*.json*")
    val auto = BlockIngest.readAuto(spark, s"$root/block*/*.json*")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("source", "result.blockhash", "_corrupt_record IS NOT NULL")
        .collect().map(_.toString).sorted.toSeq
    assert(key(cached) == key(auto))
    assert(SolanaTransforms.transactions(cached).count() == 4)
    assert(BlockIngest.errors(cached).collect()
      .map(_.getAs[String]("block")).toSeq == Seq("block_bad.json"))
    spark.sharedState.cacheManager.clearCache()

    // all-good corpus: the fast path (no legacy re-read) — plan is the
    // cache, not a three-branch union over the gzip
    val good = BlockIngest.readAutoCached(spark, s"$fixtures/block_10*")
    assert(good.count() == 2)
    assert(good.queryExecution.optimizedPlan.collectLeaves().size == 1,
      "all-good corpus should read the single cached parse")
    spark.sharedState.cacheManager.clearCache()
  }

  test("concurrent task writes produce exactly the sequential tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_conc").toString
    FileSink.writeTasks(blocks, s"$dir/seq", FileSink.TaskNames)
    FileSink.writeTasks(blocks, s"$dir/conc", FileSink.TaskNames,
      concurrent = true)
    FileSink.TaskNames.foreach { t =>
      val a = spark.read.parquet(s"$dir/seq_$t").collect()
        .map(_.toString).sorted.toSeq
      val b = spark.read.parquet(s"$dir/conc_$t").collect()
        .map(_.toString).sorted.toSeq
      assert(a == b, s"task $t differs between sequential and concurrent writes")
    }
  }

  test("file sink writes all task tables plus errors") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    FileSink.writeAll(blocks, s"$dir/out")
    assert(spark.read.parquet(s"$dir/out_transactions").count() == 3)
    assert(spark.read.parquet(s"$dir/out_transfers").count() == 3)
    assert(spark.read.parquet(s"$dir/out_blocks").count() == 2)
    assert(spark.read.parquet(s"$dir/out_errors").count() == 1)
  }

  test("csv mode round-trips the transfers table losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val transfers = SolanaTransforms.transfers(blocks)
    FileSink.writeCsv(transfers, s"$dir/transfers")
    val back = FileSink.readCsv(spark, s"$dir/transfers", transfers.schema)
    assert(back.schema == transfers.schema)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[String]("transaction"), r.getAs[String]("path"))
    assert(back.collect().map(key).sorted.toSeq ==
      transfers.collect().map(key).sorted.toSeq)
  }
}
