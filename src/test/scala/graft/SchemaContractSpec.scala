package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Schema contract between the driver-generated testdata and the query
 * registry. The driver regenerated `/root/testdata` mid-round-7 and
 * silently flipped `events.ts` from TIMESTAMP(NANOS) to timestamp[us],
 * which broke 18 registry queries at once with an opaque analysis
 * error. This spec turns the NEXT such drift into a one-line diagnosis:
 * it loads every table through `Tables` and asserts the column
 * names/types the registry assumes, failing with a message that names
 * the drifted column.
 *
 * Pinning policy: value columns pin their exact Spark type (a silent
 * int64→string or double→decimal flip would corrupt oracle hashes
 * long before it errors); time columns accept any timestamp-like type
 * (DATE / TIMESTAMP / TIMESTAMP_NTZ) because the registry already
 * normalizes those per-query, and `events.ts` is additionally pinned
 * to plain TIMESTAMP post-`normalizeEventTs` (TablesSpec covers the
 * per-generation conversions).
 */
class SchemaContractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  private sealed trait Expect {
    def ok(dt: DataType): Boolean
    def show: String
  }
  /** exact type match (ignoring nullability metadata) */
  private case class Exact(dt: DataType) extends Expect {
    def ok(got: DataType): Boolean = got == dt
    def show: String = dt.simpleString
  }
  /** any of DATE / TIMESTAMP / TIMESTAMP_NTZ */
  private case object TimeLike extends Expect {
    def ok(got: DataType): Boolean = got match {
      case DateType | TimestampType | TimestampNTZType => true
      case _                                           => false
    }
    def show: String = "date|timestamp|timestamp_ntz"
  }
  /** array<float-or-double> regardless of element nullability */
  private case object VecLike extends Expect {
    def ok(got: DataType): Boolean = got match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    def show: String = "array<float|double>"
  }

  private val contract: Seq[(String, (SparkSession, String) => DataFrame, Seq[(String, Expect)])] = Seq(
    ("region", Tables.region, Seq(
      "r_regionkey" -> Exact(IntegerType),
      "r_name" -> Exact(StringType))),
    ("nation", Tables.nation, Seq(
      "n_nationkey" -> Exact(IntegerType),
      "n_name" -> Exact(StringType),
      "n_regionkey" -> Exact(IntegerType))),
    ("customer", Tables.customer, Seq(
      "c_custkey" -> Exact(LongType),
      "c_name" -> Exact(StringType),
      "c_nationkey" -> Exact(IntegerType),
      "c_acctbal" -> Exact(DoubleType),
      "c_mktsegment" -> Exact(StringType))),
    ("supplier", Tables.supplier, Seq(
      "s_suppkey" -> Exact(LongType),
      "s_name" -> Exact(StringType),
      "s_nationkey" -> Exact(IntegerType),
      "s_acctbal" -> Exact(DoubleType))),
    ("part", Tables.part, Seq(
      "p_partkey" -> Exact(LongType),
      "p_name" -> Exact(StringType),
      "p_brand" -> Exact(StringType),
      "p_type" -> Exact(StringType),
      "p_size" -> Exact(IntegerType),
      "p_retailprice" -> Exact(DoubleType))),
    ("orders", Tables.orders, Seq(
      "o_orderkey" -> Exact(LongType),
      "o_custkey" -> Exact(LongType),
      "o_orderstatus" -> Exact(StringType),
      "o_totalprice" -> Exact(DoubleType),
      "o_orderdate" -> TimeLike,
      "o_orderpriority" -> Exact(StringType))),
    ("lineitem", Tables.lineitem, Seq(
      "l_orderkey" -> Exact(LongType),
      "l_partkey" -> Exact(LongType),
      "l_suppkey" -> Exact(LongType),
      "l_linenumber" -> Exact(IntegerType),
      "l_quantity" -> Exact(DoubleType),
      "l_extendedprice" -> Exact(DoubleType),
      "l_discount" -> Exact(DoubleType),
      "l_tax" -> Exact(DoubleType),
      "l_returnflag" -> Exact(StringType),
      "l_linestatus" -> Exact(StringType),
      "l_shipdate" -> TimeLike)),
    ("events", Tables.events, Seq(
      "event_id" -> Exact(LongType),
      // post-normalizeEventTs the loader guarantees plain TIMESTAMP
      // whatever the physical generation wrote
      "ts" -> Exact(TimestampType),
      "user_id" -> Exact(LongType),
      "event_type" -> Exact(StringType),
      "value" -> Exact(DoubleType),
      "props" -> Exact(StringType))),
    ("documents", Tables.documents, Seq(
      "doc_id" -> Exact(LongType),
      "text" -> Exact(StringType),
      "lang" -> Exact(StringType),
      "source" -> Exact(StringType),
      "n_chars" -> Exact(LongType))),
    ("embeddings", Tables.embeddings, Seq(
      "vec_id" -> Exact(LongType),
      "embedding" -> VecLike,
      "label" -> Exact(IntegerType))))

  for ((table, loader, cols) <- contract) {
    test(s"$table: testdata schema matches registry assumptions") {
      val schema = loader(spark, sfDir).schema
      val got = schema.fields.map(f => f.name -> f.dataType).toMap

      val missing = cols.map(_._1).filterNot(got.contains)
      assert(missing.isEmpty,
        s"TESTDATA DRIFT: $table lost column(s) ${missing.mkString(", ")} — " +
          s"read schema is ${schema.simpleString}")

      val drifted = cols.collect {
        case (name, expect) if !expect.ok(got(name)) =>
          s"$table.$name: expected ${expect.show}, testdata now reads as ${got(name).simpleString}"
      }
      assert(drifted.isEmpty,
        "TESTDATA DRIFT (fix Tables/registry assumptions, see TablesSpec " +
          "for the events precedent):\n  " + drifted.mkString("\n  "))
    }
  }

  test("embeddings: vector width is uniform (model-parameter samplers assume it)") {
    import org.apache.spark.sql.functions._
    val widths = Tables.embeddings(spark, sfDir)
      .select(size(col("embedding")).as("w")).distinct().collect().map(_.getInt(0))
    assert(widths.length == 1,
      s"TESTDATA DRIFT: embeddings.embedding has mixed widths ${widths.sorted.mkString(", ")}")
  }
}
