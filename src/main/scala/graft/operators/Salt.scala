package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-resistant two-phase aggregation.
 *
 * A plain `groupBy(key)` hashes each key to exactly one reducer: with
 * few or skewed keys (events.user_id has a handful of users holding
 * millions of rows at 100 TB) most of the cluster idles while one
 * task drains the hot key. Salting splits each key into `salts`
 * sub-keys for a first partial aggregation, then combines the partials
 * in a second, tiny aggregation — both shuffles are well-spread.
 *
 * Only algebraic aggregates compose this way (sum/count/min/max);
 * the caller supplies the per-phase expressions. AQE's skew handling
 * covers join skew; aggregation skew on low-cardinality keys still
 * needs this.
 */
object Salt {

  /**
   * saltedAgg(df, keys, salts)(phase1)(phase2): phase1 runs per
   * (key, salt), phase2 recombines per key.
   */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int)(
      phase1: Seq[Column])(phase2: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(phase1.head, phase1.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(phase2.head, phase2.tail: _*)

  /**
   * Skew-resistant equi-join: the (big, skewed) left side takes a
   * random salt, the right side is replicated once per salt value, and
   * the join key becomes (key, salt) — a hot key's rows now spread
   * over `salts` reducers instead of melting one. Exact same rows as
   * the plain join, paid for by shuffling `salts`× the right side —
   * worth it when the right side is far smaller than the hot key's
   * row count but too big (or too mid-sized) to broadcast outright.
   * AQE's skew-join split handles sort-merge cases adaptively; explicit
   * salting is the deterministic form that also covers bucketed and
   * pre-partitioned layouts AQE won't touch.
   */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
