package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The reference's three output tables (`TransformTask.py:106-206` in
 * zuyezheng/solana-etl: TRANSACTIONS / TRANSFERS / BLOCKS), re-expressed
 * as whole-relation Spark transforms over the ingested block JSON.
 *
 * Where the reference walks each transaction with a Python object
 * model (`Transaction.py`, `Instruction.py`, `Transfer.py`), this
 * implementation stays inside Catalyst: nested arrays are processed
 * with higher-order functions (transform/filter/aggregate/zip_with) in
 * a single projection per table — per-row work is codegen'd, blocks
 * never leave the executors, and the only shuffle in the whole module
 * is blockInfo's per-block aggregation.
 *
 * Determinism note: the reference serializes Python sets
 * (`json.dumps(list(set))`) whose order is process-dependent; here all
 * serialized sets are sorted.
 */
object SolanaTransforms {

  /** Shared per-transaction intermediate: one row per transaction. */
  /**
   * Plan block-ETL actions with whole-stage codegen OFF (scoped —
   * planning happens inside `f`, the conf is restored after).
   *
   * The block transforms are dominated by higher-order functions and
   * from_json — all CodegenFallback, so whole-stage fusion buys them
   * nothing — and on real mainnet blocks the fused mega-stage triggers
   * a memory pathology: heap dumps show gigabytes of duplicated jar
   * central-directory buffers accumulating during execution of the
   * giant generated stage (Spark 4.1, local mode) until the executor
   * OOMs. Expression-level codegen stays ON; only stage fusion is
   * disabled. Verified: identical results, ~6s for a 6.5 MB mainnet
   * block at 1 core where the fused plan OOMs an 8 GB heap.
   */
  def withBlockEtlPlanning[A](spark: org.apache.spark.sql.SparkSession)(f: => A): A = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  def txLevel(blocks: DataFrame): DataFrame =
    BlockIngest.valid(blocks)
      .select(
        col("result.blockTime").as("time"),
        col("result.blockhash").as("blockhash"),
        col("source").as("path"),
        explode(col("result.transactions")).as("tx"))
      .withColumn("keys",
        expr("transform(tx.transaction.message.accountKeys, a -> a.pubkey)"))
      // outer instructions each followed by their inner instructions
      // (matched by outer index), like Instructions.flatten + the
      // innerInstructions stitching in Transaction.instructions
      // (Transaction.py:66-81)
      // two NESTED transforms so from_json runs once per instruction
      // (the optimizer has no rule fusing transform-over-transform):
      // a single-level transform would inline the parse into every
      // field that needs it, tripling an already-huge expression —
      // tree size here directly bounds codegen size, see transfers()
      .withColumn("flat_instr", expr(
        s"""transform(
          |  transform(
          |    flatten(transform(tx.transaction.message.instructions, (ins, i) ->
          |      CASE WHEN get(filter(tx.meta.innerInstructions, x -> x.index = i), 0) IS NULL
          |           THEN array(ins)
          |           ELSE concat(array(ins),
          |             get(filter(tx.meta.innerInstructions, x -> x.index = i), 0).instructions)
          |      END)),
          |    ins -> named_struct(
          |      'programId', ins.programId, 'program', ins.program,
          |      'raw', ins.parsed,
          |      'p', from_json(ins.parsed, '${BlockSchema.parsedDdl}'),
          |      'accounts', ins.accounts, 'data', ins.data)),
          |  x -> named_struct(
          |    'programId', x.programId,
          |    'program', x.program,
          |    'parsed', x.p,
          |    'memo', CASE WHEN x.raw IS NOT NULL
          |        AND x.p.type IS NULL AND x.p.info IS NULL THEN x.raw END,
          |    'accounts', x.accounts,
          |    'data', x.data))""".stripMargin))
      .withColumn("programs",
        expr("array_sort(array_distinct(transform(flat_instr, x -> x.programId)))"))
      .withColumn("lamports_out", expr(
        """aggregate(zip_with(tx.meta.postBalances, tx.meta.preBalances, (a, b) -> a - b),
          |  0L, (acc, x) -> acc + CASE WHEN x < 0 THEN x ELSE 0L END)""".stripMargin))
      .withColumn("lamports_in", expr(
        """aggregate(zip_with(tx.meta.postBalances, tx.meta.preBalances, (a, b) -> a - b),
          |  0L, (acc, x) -> acc + CASE WHEN x > 0 THEN x ELSE 0L END)""".stripMargin))
      .withColumn("lamports_all", expr(
        """aggregate(zip_with(tx.meta.postBalances, tx.meta.preBalances, (a, b) -> a - b),
          |  0L, (acc, x) -> acc + x)""".stripMargin))
      // per-account-index token balance delta (TokenBalanceChange,
      // Transaction.py:104-141): pre/post merged by accountIndex,
      // missing side = 0; mint/decimals prefer post (the reference's
      // `balance` variable is the last one seen)
      // nested transforms again: the inner pass resolves each index's
      // pre/post balance with ONE filter scan per side; the outer pass
      // derives all five fields from the resolved structs. The flat
      // form repeated the filter scan for every field — 9 scans per
      // element at runtime and a 9×-inlined expression tree (same
      // codegen-size concern as flat_instr above)
      .withColumn("token_changes", expr(
        """transform(
          |  transform(
          |    array_union(transform(tx.meta.preTokenBalances, b -> b.accountIndex),
          |                transform(tx.meta.postTokenBalances, b -> b.accountIndex)),
          |    i -> struct(i AS idx,
          |      get(filter(tx.meta.postTokenBalances, b -> b.accountIndex = i), 0) AS post,
          |      get(filter(tx.meta.preTokenBalances, b -> b.accountIndex = i), 0) AS pre)),
          |  x -> named_struct(
          |    'idx', x.idx,
          |    'key', get(keys, x.idx),
          |    'mint', coalesce(x.post.mint, x.pre.mint),
          |    'change',
          |       coalesce(try_cast(x.post.uiTokenAmount.amount AS LONG), 0L)
          |     - coalesce(try_cast(x.pre.uiTokenAmount.amount AS LONG), 0L),
          |    'decimals', coalesce(x.post.uiTokenAmount.decimals,
          |                         x.pre.uiTokenAmount.decimals)))""".stripMargin))
      .withColumn("token_keys",
        expr("array_sort(filter(array_distinct(transform(token_changes, c -> c.key)), k -> k IS NOT NULL))"))
      .withColumn("mints",
        expr("array_sort(array_distinct(transform(token_changes, c -> c.mint)))"))
      .withColumn("has_vote",
        expr("exists(flat_instr, x -> coalesce(x.program = 'vote', false))"))
      .withColumn("signature", expr("get(tx.transaction.signatures, 0)"))
      .withColumn("fee", col("tx.meta.fee"))
      .withColumn("is_successful", col("tx.meta.err").isNull)

  /**
   * Tree-preserving instruction filter ≈ `Instructions.filter` with
   * flatten=False (`Instruction.py:78-96, 250-262`): an outer
   * instruction is kept when it matches (program, type) itself OR any
   * of its inner instructions match; kept outers carry their filtered
   * inner list. Returns per-transaction match counts.
   */
  def filterInstructionTree(blocks: DataFrame, programName: String,
      instructionType: String): DataFrame =
    filterTree(blocks, v =>
      s"""coalesce($v.program = '$programName' AND
         |  from_json($v.parsed, '${BlockSchema.parsedDdl}').type = '$instructionType',
         |  false)""".stripMargin)

  /** Program-only tree filter ≈ `ProgramInstruction.SYSTEM` (any
    * instruction type of the program). `Instruction.py:240-288` */
  def filterInstructionTreeByProgram(blocks: DataFrame,
      programName: String): DataFrame =
    filterTree(blocks, v => s"coalesce($v.program = '$programName', false)")

  private def filterTree(blocks: DataFrame,
      matches: String => String): DataFrame = {
    txLevel(blocks)
      .withColumn("kept", expr(
        s"""filter(transform(tx.transaction.message.instructions, (ins, i) ->
           |  named_struct(
           |    'self_match', ${matches("ins")},
           |    'inner_kept', filter(
           |      CASE WHEN get(filter(tx.meta.innerInstructions, x -> x.index = i), 0) IS NULL
           |           THEN filter(tx.transaction.message.instructions, z -> false)
           |           ELSE get(filter(tx.meta.innerInstructions, x -> x.index = i), 0).instructions
           |      END, nn -> ${matches("nn")}))),
           |  o -> o.self_match OR size(o.inner_kept) > 0)""".stripMargin))
      .select(col("signature"),
        size(col("kept")).as("n_outer_kept"),
        expr("aggregate(kept, 0, (a, o) -> a + size(o.inner_kept))").as("n_inner_kept"))
  }

  /**
   * Find a transaction by any of its signatures ≈
   * `Block.find_transaction` (`Block.py:70-77`) — except as a
   * predicate-pushed scan over all blocks rather than a per-block
   * linear walk.
   */
  def findTransaction(blocks: DataFrame, signature: String): DataFrame =
    txLevel(blocks).filter(
      array_contains(col("tx.transaction.signatures"), signature))

  /** TRANSACTIONS table (TransformTask.py:106-137 column contract). */
  def transactions(blocks: DataFrame): DataFrame =
    txLevel(blocks)
      .withColumn("sysvar_keys",
        expr("array_sort(filter(keys, k -> lower(k) LIKE 'sysvar%'))"))
      .withColumn("coin_keys", expr(
        """array_sort(filter(keys, k ->
          |  NOT lower(k) LIKE 'sysvar%' AND
          |  NOT array_contains(programs, k) AND
          |  NOT coalesce(array_contains(token_keys, k), false)))""".stripMargin))
      .select(
        col("time"),
        col("signature"),
        col("fee"),
        col("is_successful").as("isSuccessful"),
        size(col("flat_instr")).as("numInstructions"),
        to_json(col("programs")).as("programs"),
        size(col("keys")).as("numAccounts"),
        to_json(struct(
          col("sysvar_keys").as("SYSVAR"), col("programs").as("PROGRAM"),
          col("token_keys").as("TOKEN"), col("coin_keys").as("COIN"))).as("accountsByType"),
        col("lamports_out").as("lamportsOut"),
        col("lamports_in").as("lamportsIn"),
        size(col("mints")).as("numMints"),
        to_json(col("mints")).as("mints"),
        expr(
          """to_json(map_from_entries(transform(mints, m -> struct(m,
            |  CAST(aggregate(filter(token_changes, c -> c.mint = m AND c.change < 0),
            |       0L, (acc, c) -> acc + c.change) AS DOUBLE)
            |  / power(10, get(filter(token_changes, c -> c.mint = m), 0).decimals)))))""".stripMargin)
          .as("tokensOut"),
        expr(
          """to_json(map_from_entries(transform(mints, m -> struct(m,
            |  CAST(aggregate(filter(token_changes, c -> c.mint = m AND c.change > 0),
            |       0L, (acc, c) -> acc + c.change) AS DOUBLE)
            |  / power(10, get(filter(token_changes, c -> c.mint = m), 0).decimals)))))""".stripMargin)
          .as("tokensIn"),
        col("blockhash"),
        col("path"))

  /**
   * TRANSFERS table (TransformTask.py:138-152): system:transfer (coin,
   * lamports, scale 9) and spl-token:transfer (amount unscaled, scale =
   * decimals from the token balance change of source else destination,
   * `Transfer.py:40-72`) from flattened instructions of successful
   * transactions. Token transfers with no balance-change match are
   * dropped (the reference raises → error channel).
   */
  def transfers(blocks: DataFrame): DataFrame = {
    // ONE pass, not a coin ∪ token union of two branches. Two separate
    // consumers of the instruction table would each re-inline (via
    // CollapseProject, and filter pushdown past any barrier) the
    // entire flat_instr/token_changes construction — the generated
    // code for those monster expressions then exists twice per plan,
    // and on real mainnet blocks the duplicated codegen volume (plus
    // the per-compile classloader overhead it drags in) OOMs the
    // executor. The CASE-fused single branch compiles and evaluates
    // the expensive expressions exactly once, scans the instruction
    // table once, and needs no union.
    val instr = txLevel(blocks)
      .filter(col("is_successful"))
      .select(col("time"), col("blockhash"), col("path"), col("signature"),
        col("token_changes"), explode(col("flat_instr")).as("ins"))
    instr
      .filter(expr(
        "ins.parsed.type = 'transfer' AND ins.program IN ('system', 'spl-token')"))
      .withColumn("matched", expr(
        """CASE WHEN ins.program = 'spl-token' THEN coalesce(
          |  get(filter(token_changes, c -> c.key = try_element_at(ins.parsed.info, 'source')), 0),
          |  get(filter(token_changes, c -> c.key = try_element_at(ins.parsed.info, 'destination')), 0))
          |END""".stripMargin))
      .filter(expr("ins.program = 'system' OR matched IS NOT NULL"))
      .select(
        col("time"),
        expr("try_element_at(ins.parsed.info, 'source')").as("source"),
        expr("try_element_at(ins.parsed.info, 'destination')").as("destination"),
        expr("CASE WHEN ins.program = 'system' THEN 'sol' ELSE matched.mint END").as("mint"),
        expr("""try_cast(try_element_at(ins.parsed.info,
          | CASE WHEN ins.program = 'system' THEN 'lamports' ELSE 'amount' END) AS LONG)""".stripMargin).as("value"),
        expr("CASE WHEN ins.program = 'system' THEN 9 ELSE matched.decimals END").as("scale"),
        col("signature").as("transaction"),
        col("blockhash"), col("path"))
  }

  /**
   * ACCOUNTS table — the per-account surface the reference carries on
   * every transaction but only exposes via `accounts_by_type`:
   * one row per (transaction, account index) with the signer/writable
   * flags (`Account.py:14-27`), the rule-ordered type classification
   * (`Transaction.py:160-178`: SYSVAR → PROGRAM → TOKEN → COIN), and
   * the account's lamports delta from pre/postBalances (matched by
   * index, `BalanceChange.py`). Auditing fee payers (index 0, always a
   * signer) or writable-account contention starts here.
   */
  def accounts(blocks: DataFrame): DataFrame =
    txLevel(blocks)
      .select(col("time"), col("signature"), col("blockhash"), col("path"),
        col("is_successful").as("isSuccessful"),
        col("programs"), col("token_keys"), col("tx"),
        posexplode(col("tx.transaction.message.accountKeys"))
          .as(Seq("index", "acct")))
      .select(
        col("time"),
        col("signature"),
        col("index"),
        col("acct.pubkey").as("key"),
        col("acct.signer").as("signer"),
        col("acct.writable").as("writable"),
        expr(
          """CASE WHEN lower(acct.pubkey) LIKE 'sysvar%' THEN 'SYSVAR'
            |     WHEN array_contains(programs, acct.pubkey) THEN 'PROGRAM'
            |     WHEN coalesce(array_contains(token_keys, acct.pubkey), false) THEN 'TOKEN'
            |     ELSE 'COIN' END""".stripMargin).as("accountType"),
        (expr("get(tx.meta.postBalances, index)")
          - expr("get(tx.meta.preBalances, index)")).as("lamportsChange"),
        col("isSuccessful"),
        col("blockhash"),
        col("path"))

  /** BLOCKS table (TransformTask.py:153-178): per-block metrics split successful × errored. */
  def blockInfo(blocks: DataFrame): DataFrame = {
    val tx = txLevel(blocks)
    def side(prefix: String, cond: org.apache.spark.sql.Column) = Seq(
      count(when(cond, 1)).as(if (prefix == "successful") "numSuccessful" else "numErrors"),
      count(when(cond && col("has_vote"), 1)).as(s"${prefix}Votes"),
      count(when(cond && col("lamports_all") =!= -col("fee"), 1))
        .as(s"${prefix}TransactionsMoreThanFee"),
      count(when(cond && col("lamports_all") === -col("fee"), 1))
        .as(s"${prefix}TransactionsOnlyFee"),
      sum(when(cond, col("fee")).otherwise(0L)).as(s"${prefix}Fees"),
      sum(when(cond, col("lamports_out")).otherwise(0L)).as(s"${prefix}BalanceChange"),
      size(array_distinct(flatten(collect_list(when(cond, col("programs"))))))
        .as(s"${prefix}ProgramAccounts"),
      size(array_distinct(flatten(collect_list(when(cond,
        expr("""filter(keys, k ->
          |  NOT lower(k) LIKE 'sysvar%' AND
          |  NOT array_contains(programs, k) AND
          |  NOT coalesce(array_contains(token_keys, k), false))""".stripMargin))))))
        .as(s"${prefix}CoinAccounts"),
      size(array_distinct(flatten(collect_list(when(cond, col("token_keys"))))))
        .as(s"${prefix}TokenAccounts"))
    val aggs = Seq(count(lit(1)).as("numTransactions")) ++
      side("successful", col("is_successful")) ++
      side("error", !col("is_successful"))
    tx.groupBy(col("time"), col("blockhash").as("hash"), col("path"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
