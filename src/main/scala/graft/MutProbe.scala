package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Measured recall on GENUINE near-duplicates (VERDICT r10 item 3):
 * the key-shifted scale corpora replicate text verbatim, so recall
 * floors there are geometry-independent — identical texts produce
 * identical signatures and every banded scheme "recalls" them
 * trivially. `tools/gen_mutated.py` derives a corpus whose copies
 * carry token-level edits at controlled rates (and embeddings with
 * controlled angular noise); this probe runs the candidate generators
 * against exact truth there and reports recall SPLIT BY PAIR CLASS:
 *
 *  - text: exact 3-gram jaccard pairs at τ=0.8 (PPJoin-pruned), split
 *    verbatim (j = 1) vs mutated (j < 1); MinHash-LSH (16×4) recall
 *    per class — the mutated class is the one the verbatim corpora
 *    could never measure;
 *  - embeddings: the PLANTED pairs (vec_id, vec_id + k·OFF) whose
 *    true cosine the generator controls (~0.98/0.95/0.90 per copy
 *    class); hyperplane-LSH (16×4) candidate recall per target-cosine
 *    class, verified against the exactly-computed cosine.
 *
 * Knobs via env: SPARK_GRAFT_SF_DIR (default target/sfmut),
 * SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_OFF (the generator's id
 * offset, default 10000000). Output: one JSON line for §6.
 */
object MutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sfmut")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val off = sys.env.getOrElse("SPARK_GRAFT_OFF", "10000000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    // ---- text: exact truth split by verbatim vs genuinely-mutated
    val docs = Tables.documents(spark, sfDir)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleFreq = 100)
      .select(col("id1"), col("id2"), col("jaccard"))
      .localCheckpoint()
    val cand = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, bands = 16, rowsPerBand = 4)
      .select(col("id1"), col("id2")).withColumn("hit", lit(1))
    val textStats = exact
      .join(cand.hint("shuffle_hash"), Seq("id1", "id2"), "left")
      .agg(
        count(when(col("jaccard") >= 1.0, 1)).as("n_verbatim"),
        count(when(col("jaccard") < 1.0, 1)).as("n_mutated"),
        count(when(col("jaccard") >= 1.0, col("hit"))).as("hit_verbatim"),
        count(when(col("jaccard") < 1.0, col("hit"))).as("hit_mutated"),
        min(when(col("jaccard") < 1.0, col("jaccard"))).as("min_mut_j"),
        avg(when(col("jaccard") < 1.0, col("jaccard"))).as("avg_mut_j"))
      .head()

    // ---- embeddings: planted-pair truth per target-cosine class
    import graft.functions.VectorFunctions.dotd
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dotd(col("v"), col("v"))))
    val orig = emb.filter(col("vec_id") < off)
      .select(col("vec_id").as("o_id"), col("v").as("ov"), col("nrm").as("on"))
    val copies = emb.filter(col("vec_id") >= off)
      .select(col("vec_id"), (col("vec_id") % off).as("o_id"),
        expr(s"vec_id div ${off}L").cast("int").as("k"), col("v"), col("nrm"))
    val planted = copies.join(orig.hint("shuffle_hash"), "o_id")
      .withColumn("cos",
        round(dotd(col("v"), col("ov")) / (col("nrm") * col("on")), 6))
      // class by copy index: (k-1) % 3 -> 0:0.98, 1:0.95, 2:0.90
      .withColumn("cls", ((col("k") - 1) % 3).cast("long"))
      .select(
        least(col("vec_id"), col("o_id")).as("id1"),
        greatest(col("vec_id"), col("o_id")).as("id2"),
        col("cls"), col("cos"))
      .localCheckpoint()
    val lsh = Dedup.embeddingNearDupLsh(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding",
        threshold = 0.4, dim = 64)
      .select(col("id1"), col("id2")).withColumn("hit", lit(1))
    val embStats = planted
      .join(lsh.hint("shuffle_hash"), Seq("id1", "id2"), "left")
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n"), count(col("hit")).as("hits"),
        round(avg(col("cos")), 4).as("avg_cos"))
      .orderBy(col("cls"))
      .collect()

    def pct(h: Long, n: Long): Double =
      if (n == 0) -1 else math.rint(h * 10000.0 / n) / 10000.0
    val nVerb = textStats.getLong(0); val nMut = textStats.getLong(1)
    val hVerb = textStats.getLong(2); val hMut = textStats.getLong(3)
    val embJson = embStats.map { r =>
      val cls = r.getLong(0); val n = r.getLong(1); val h = r.getLong(2)
      s""""cos_${Seq("098", "095", "090")(cls.toInt)}":{"n":$n,"recall":${pct(h, n)},"avg_cos":${r.getDouble(3)}}"""
    }.mkString(",")
    println(
      s"""{"sf":"$sfDir","text":{"n_verbatim":$nVerb,"recall_verbatim":${pct(hVerb, nVerb)},"n_mutated":$nMut,"recall_mutated":${pct(hMut, nMut)},"avg_mut_jaccard":${textStats.getDouble(5)},"min_mut_jaccard":${textStats.getDouble(4)}},"embedding":{$embJson}}""")
    spark.stop()
  }
}
