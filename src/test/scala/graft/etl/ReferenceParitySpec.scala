package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Parity against the reference's OWN test expectations on its OWN
 * fixture: a real mainnet block (6,000+ transactions) shipped with
 * zuyezheng/solana-etl. Every number asserted here is asserted by the
 * reference's `test/transform/test_Transactions.py` — if our ingest +
 * transforms reproduce them, a reference user gets identical results
 * from this library on real chain data, not just on hand-built
 * fixtures.
 */
class ReferenceParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val fixture =
    "/root/reference/test/resources/blocks/110130000/110130000.json.gz"

  test("real mainnet block reproduces test_Transactions.py expectations") {
    assume(new java.io.File(fixture).exists(), "reference fixture not present")
    val blocks = BlockIngest.read(spark, fixture)
    assert(BlockIngest.errors(blocks).count() == 0, "fixture must parse clean")

    val r = SolanaTransforms.blockInfo(blocks).collect() match {
      case Array(row) => row
      case rows => fail(s"expected 1 block row, got ${rows.length}")
    }
    def l(c: String) = r.getAs[Long](c)

    // only-fee / more-than-fee split (all + successful)
    assert(l("successfulTransactionsOnlyFee") + l("errorTransactionsOnlyFee") == 3439)
    assert(l("successfulTransactionsOnlyFee") == 3185)
    assert(l("numTransactions") ==
      l("successfulTransactionsOnlyFee") + l("successfulTransactionsMoreThanFee") +
        l("errorTransactionsOnlyFee") + l("errorTransactionsMoreThanFee"))
    // votes
    assert(l("successfulVotes") + l("errorVotes") == 2677)
    assert(l("successfulVotes") == 2531)
    // fees
    assert(l("successfulFees") + l("errorFees") == 17420000L)
    assert(l("successfulFees") == 16000000L)
    // BalanceChangeAgg.OUT, raw lamports (scale 9 handled by NumberWithScale)
    assert(l("successfulBalanceChange") == -149885890118570L)
    assert(l("errorBalanceChange") == -1420000L)
  }

  test("per-transaction metrics match test_Transaction.py for its two subjects") {
    assume(new java.io.File(fixture).exists(), "reference fixture not present")
    val blocks = BlockIngest.read(spark, fixture)
    val typesDdl = org.apache.spark.sql.types.DataType.fromDDL(
      "STRUCT<SYSVAR: ARRAY<STRING>, PROGRAM: ARRAY<STRING>, " +
        "TOKEN: ARRAY<STRING>, COIN: ARRAY<STRING>>")
    val txs = SolanaTransforms.transactions(blocks)
      .withColumn("types", from_json(col("accountsByType"), typesDdl))
      .withColumn("mintSet", from_json(col("mints"),
        org.apache.spark.sql.types.DataType.fromDDL("ARRAY<STRING>")))
      .withColumn("outMap", from_json(col("tokensOut"),
        org.apache.spark.sql.types.DataType.fromDDL("MAP<STRING, DOUBLE>")))
      .withColumn("inMap", from_json(col("tokensIn"),
        org.apache.spark.sql.types.DataType.fromDDL("MAP<STRING, DOUBLE>")))

    // the "interesting" transaction: balance changes are the fee plus ±0.0119x SOL
    val i = txs.filter(col("signature") ===
      "2XMqtpXpp83pupsM5iiie2s69iRTHrV6oA6zxDTY9hRC4M2Rr9Yh5knSkBZbk22Wt7Qv88akacJifnaX6oL5ncqS")
      .collect() match { case Array(row) => row; case o => fail(s"${o.length} rows") }
    assert(i.getAs[Long]("lamportsOut") == -11981200L)  // OUT  = -0.0119812 SOL
    assert(i.getAs[Long]("lamportsIn") == 11971200L)    // IN   =  0.0119712 SOL
    assert(i.getAs[Long]("lamportsOut") + i.getAs[Long]("lamportsIn") == -10000L) // = -fee
    val it = i.getAs[org.apache.spark.sql.Row]("types")
    assert(it.getAs[scala.collection.Seq[String]]("SYSVAR").toSet == Set(
      "SysvarC1ock11111111111111111111111111111111",
      "SysvarRent111111111111111111111111111111111"))
    assert(it.getAs[scala.collection.Seq[String]]("PROGRAM").toSet == Set(
      "11111111111111111111111111111111",
      "ATokenGPvbdGVxr1b2hvZbsiqW5xWH25efTNsLJA8knL",
      "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA",
      "cndyAnrLdpjq1Ssp1z8xxDsB8dxe7u4HL5Nxi2K5WXZ",
      "metaqbxxUerdq28cj1RbAWkYQm3ybzjb6a8bt518x1s"))
    assert(it.getAs[scala.collection.Seq[String]]("TOKEN").toSet ==
      Set("5KFsC5mLg6d2MbJgCs4k2qJVampgPoZFeuSwsUjSN2gJ"))
    assert(it.getAs[scala.collection.Seq[String]]("COIN").size == 6)

    // the token transaction: two mints, conserved totals, signed in/out splits
    val t = txs.filter(col("signature") ===
      "44DLZ5ezRVvibgxwc4erA4ywQ7XUyf3DvPyt3uqsQR1ucZs2wSrBcHJRe7V2P2FoYJK9XPXNsp4mAnVX8sLXpvin")
      .collect() match { case Array(row) => row; case o => fail(s"${o.length} rows") }
    val usdc = "EPjFWdd5AufqSSqeM2qN1xzybapC8G4wEGGkZwyTDt1v"
    val ews = "EWS2ATMt5fQk89NWLJYNRmGaNoji8MhFZkUB4DiWCCcz"
    assert(t.getAs[scala.collection.Seq[String]]("mintSet").toSet == Set(usdc, ews))
    val out = t.getAs[Map[String, Double]]("outMap")
    val in = t.getAs[Map[String, Double]]("inMap")
    assert(math.abs(out(usdc) - -12.884202) < 1e-9)
    assert(math.abs(out(ews) - -4863.519055) < 1e-9)
    assert(math.abs(in(usdc) - 12.884202) < 1e-9)
    assert(math.abs(in(ews) - 4863.519055) < 1e-9)
    val tt = t.getAs[org.apache.spark.sql.Row]("types")
    assert(tt.getAs[scala.collection.Seq[String]]("SYSVAR").isEmpty)
    assert(tt.getAs[scala.collection.Seq[String]]("PROGRAM").toSet == Set(
      "675kPX9MHTjS2zt1qfr1NYHuzeLXfQM9H24wFSUt1Mp8",
      "CTMAxxk34HjKWxQ3QLZK1HpaLXmBveao3ESePXbiyfzh",
      "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA"))
    assert(tt.getAs[scala.collection.Seq[String]]("TOKEN").size == 9)
    assert(tt.getAs[scala.collection.Seq[String]]("COIN").size == 15)
  }

  test("instruction tree and transfer extraction match test_Instruction/test_Interactions") {
    assume(new java.io.File(fixture).exists(), "reference fixture not present")
    val blocks = BlockIngest.read(spark, fixture)
    val sig =
      "2XMqtpXpp83pupsM5iiie2s69iRTHrV6oA6zxDTY9hRC4M2Rr9Yh5knSkBZbk22Wt7Qv88akacJifnaX6oL5ncqS"

    // 21 = outer + inner flattened (test_Instruction.test_properties)
    val n = SolanaTransforms.transactions(blocks)
      .filter(col("signature") === sig)
      .head().getAs[Int]("numInstructions")
    assert(n == 21)

    // SYSTEM filter keeps outers {0,2,4} and 10 matching inners
    val sys = SolanaTransforms.filterInstructionTreeByProgram(blocks, "system")
      .filter(col("signature") === sig).head()
    assert((sys.getAs[Int]("n_outer_kept"), sys.getAs[Int]("n_inner_kept")) == (3, 10))

    // SYSTEM_TRANSFER keeps outers {2,4} and inners {2.0,4.0,4.2,4.6}
    val syt = SolanaTransforms.filterInstructionTree(blocks, "system", "transfer")
      .filter(col("signature") === sig).head()
    assert((syt.getAs[Int]("n_outer_kept"), syt.getAs[Int]("n_inner_kept")) == (2, 4))

    // Interactions census: 321 coin + 73 token transfers (test_Interactions)
    val transfers = SolanaTransforms.transfers(blocks)
    assert(transfers.filter(col("mint") === "sol").count() == 321)
    assert(transfers.filter(col("mint") =!= "sol").count() == 73)
  }

  test("task-table shapes match test_FileOutput.py on both fixture blocks") {
    val blocksGlob = "/root/reference/test/resources/blocks/*/*.json.gz"
    assume(new java.io.File(fixture).exists(), "reference fixture not present")
    val blocks = BlockIngest.read(spark, blocksGlob)
    assert(BlockIngest.errors(blocks).count() == 0)

    val txs = SolanaTransforms.transactions(blocks)
    val transfers = SolanaTransforms.transfers(blocks)
    val info = SolanaTransforms.blockInfo(blocks)
    assert(txs.columns.length == 16)
    assert(transfers.columns.length == 9)
    assert(info.columns.length == 22)

    def countsBySource(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.groupBy(col("path")).count().collect()
        .map(r => r.getAs[String]("path") -> r.getAs[Long]("count")).toMap
    // test_FileOutput.py: [110130000: 394 transfers / 3439 txs / 1 block],
    //                     [110360000: 194 / 4435 / 1]
    val txCounts = countsBySource(txs)
    val trCounts = countsBySource(transfers)
    assert(txCounts.view.mapValues(identity).toMap.values.toSeq.sorted == Seq(3439L, 4435L))
    assert(txCounts.find(_._2 == 3439L).get._1.contains("110130000"))
    assert(trCounts.values.toSeq.sorted == Seq(194L, 394L))
    assert(trCounts.find(_._2 == 394L).get._1.contains("110130000"))
    assert(info.count() == 2)
  }

  test("streaming ETL processes the real blocks to the same transfer census") {
    assume(new java.io.File(fixture).exists(), "reference fixture not present")
    val dest = java.nio.file.Files.createTempDirectory("graft_stream_parity").toString
    // stream over the two real blocks (each file = one micro-batch input)
    val queries = StreamingEtl.start(spark,
      "/root/reference/test/resources/blocks/*/*.json.gz", s"$dest/out")
    try queries.foreach(_.processAllAvailable()) finally queries.foreach(_.stop())
    assert(spark.read.parquet(s"$dest/out_transactions").count() == 3439 + 4435)
    assert(spark.read.parquet(s"$dest/out_transfers").count() == 394 + 194)
    // accounts stream: every transaction contributes ≥1 account row,
    // and the fee payer (index 0) is always a signer
    val acc = spark.read.parquet(s"$dest/out_accounts")
    assert(acc.select(col("signature")).distinct().count() == 3439 + 4435)
    assert(acc.filter(col("index") === 0 && !col("signer")).count() == 0)
  }

  test("accounts table exposes signer/writable flags and per-account deltas") {
    assume(new java.io.File(fixture).exists(), "reference fixture not present")
    val blocks = BlockIngest.read(spark, fixture)
    val acc = SolanaTransforms.accounts(blocks)
    // the fee payer (index 0) is signer+writable on every transaction
    assert(acc.filter(col("index") === 0 &&
      (!col("signer") || !col("writable"))).count() == 0)
    // flags are real data, not nulls
    assert(acc.filter(col("signer")).count() > 0)
    assert(acc.filter(!col("writable")).count() > 0)
    // the test_Transaction.py subject: 14 accounts, lamports deltas sum
    // to -fee, and the per-type counts match its accounts_by_type sets
    val sig =
      "2XMqtpXpp83pupsM5iiie2s69iRTHrV6oA6zxDTY9hRC4M2Rr9Yh5knSkBZbk22Wt7Qv88akacJifnaX6oL5ncqS"
    val rows = acc.filter(col("signature") === sig)
    assert(rows.count() == 14)
    assert(rows.agg(sum(col("lamportsChange"))).head().getLong(0) == -10000L)
    val types = rows.groupBy(col("accountType")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types == Map("SYSVAR" -> 2L, "PROGRAM" -> 5L, "TOKEN" -> 1L, "COIN" -> 6L))
    // distinct-key census per type across the block == the
    // accounts_by_type census test_Transactions.py asserts
    def census(t: String): Long =
      acc.filter(col("accountType") === t).select(col("key")).distinct().count()
    assert(census("SYSVAR") == 4)
    assert(census("PROGRAM") == 27)
    assert(census("TOKEN") == 211)
    assert(census("COIN") == 3480)
  }

  test("real mainnet block reproduces the accounts_by_type census") {
    assume(new java.io.File(fixture).exists(), "reference fixture not present")
    val blocks = BlockIngest.read(spark, fixture)
    val byType = SolanaTransforms.transactions(blocks)
      .select(from_json(col("accountsByType"),
        org.apache.spark.sql.types.DataType.fromDDL(
          "STRUCT<SYSVAR: ARRAY<STRING>, PROGRAM: ARRAY<STRING>, " +
            "TOKEN: ARRAY<STRING>, COIN: ARRAY<STRING>>")).as("t"))
    def census(field: String): Long =
      byType.select(explode(col(s"t.$field")).as("k")).distinct().count()
    // test_Transactions.py: {SYSVAR: 4, PROGRAM: 27, TOKEN: 211, COIN: 3480}
    assert(census("SYSVAR") == 4)
    assert(census("PROGRAM") == 27)
    assert(census("TOKEN") == 211)
    assert(census("COIN") == 3480)
  }
}
