package graft.etl

import org.apache.spark.sql.types._

/**
 * Spark schema for Solana `jsonParsed` block JSON, the shape the
 * reference extracts from RPC and walks with its Python object model
 * (`src/transform/Block.py:1-77`, `Transaction.py:27-31`,
 * `Instruction.py:150-210` in zuyezheng/solana-etl).
 *
 * Declaring the schema up front (instead of inference) matters at
 * scale: the JSON scan becomes a single pass with no sampling job, and
 * column pruning reaches into the nested structs — a transform that
 * only needs fees never parses instruction bodies.
 *
 * Notes vs the reference:
 * - `meta.err` and `parsed.info` values are heterogeneous JSON; both
 *   are captured as strings (Spark stringifies non-scalar tokens), and
 *   typed accessors cast where needed.
 * - accountKeys are the jsonParsed object form (pubkey/signer/
 *   writable); the reference also accepts bare strings
 *   (`Account.py:21-27`).
 */
object BlockSchema {

  /**
   * `parsed` is captured as the RAW JSON text, not a struct: programs
   * like spl-memo put a plain string there (`Instruction.py:168-171`),
   * and a struct-typed field would corrupt the whole block row on such
   * instructions. `SolanaTransforms` re-parses it with `from_json`
   * (object → typed struct, memo string → null struct + memo column).
   */
  val instruction: StructType = StructType(Seq(
    StructField("programId", StringType),
    StructField("program", StringType),
    StructField("parsed", StringType),
    StructField("accounts", ArrayType(StringType)),
    StructField("data", StringType)))

  /** DDL for the object form of `parsed`, for from_json. */
  val parsedDdl = "type STRING, info MAP<STRING, STRING>"

  val tokenBalance: StructType = StructType(Seq(
    StructField("accountIndex", IntegerType),
    StructField("mint", StringType),
    StructField("owner", StringType),
    StructField("uiTokenAmount", StructType(Seq(
      StructField("amount", StringType),
      StructField("decimals", IntegerType))))))

  val transaction: StructType = StructType(Seq(
    StructField("meta", StructType(Seq(
      StructField("err", StringType),
      StructField("fee", LongType),
      StructField("preBalances", ArrayType(LongType)),
      StructField("postBalances", ArrayType(LongType)),
      StructField("preTokenBalances", ArrayType(tokenBalance)),
      StructField("postTokenBalances", ArrayType(tokenBalance)),
      StructField("innerInstructions", ArrayType(StructType(Seq(
        StructField("index", IntegerType),
        StructField("instructions", ArrayType(instruction))))))))),
    StructField("transaction", StructType(Seq(
      StructField("signatures", ArrayType(StringType)),
      StructField("message", StructType(Seq(
        StructField("accountKeys", ArrayType(StructType(Seq(
          StructField("pubkey", StringType),
          StructField("signer", BooleanType),
          StructField("writable", BooleanType))))),
        StructField("instructions", ArrayType(instruction))))))))))

  val block: StructType = StructType(Seq(
    StructField("result", StructType(Seq(
      StructField("blockhash", StringType),
      StructField("blockTime", LongType),
      StructField("parentSlot", LongType),
      StructField("transactions", ArrayType(transaction))))),
    StructField("_corrupt_record", StringType)))

  /**
   * Pre-jsonParsed extracts carry accountKeys as bare strings
   * (`Account.py:21-27` accepts both forms). Same block schema with
   * the string-array variant; `BlockIngest.readStringKeys` normalizes
   * to the struct form so every transform runs unchanged.
   */
  val blockWithStringKeys: StructType = {
    def replaceKeys(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.map { f =>
        if (f.name == "accountKeys") f.copy(dataType = ArrayType(StringType))
        else f.copy(dataType = replaceKeys(f.dataType))
      })
      case ArrayType(e, n) => ArrayType(replaceKeys(e), n)
      case other => other
    }
    replaceKeys(block).asInstanceOf[StructType]
  }
}
