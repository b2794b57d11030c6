package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/**
 * Text-analysis operators for training-data pipelines: quality
 * scoring, language identification, token counting, fingerprinting.
 * All pure column expressions — single scan, codegen'd, no UDFs,
 * embarrassingly parallel at any scale.
 */
object TextAnalysis {

  val EnStop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val DeStop = Seq("der", "die", "das", "und", "ist", "ein", "zu", "den")
  val FrStop = Seq("le", "la", "les", "et", "est", "un", "une", "des")
  val EsStop = Seq("el", "los", "las", "y", "es", "un", "una", "de")

  // long-typed (DuckDB len()/count() are BIGINT — keep schemas aligned)
  private def hits(ws: Column, stop: Seq[String]): Column =
    size(filter(ws, w => w.isin(stop: _*))).cast("long")

  /** Stopword occurrence count as ONE codegen'd regex pass over the
    * lowered/trimmed text: tokens under `split(text, "\\s+")` are the
    * maximal non-whitespace runs, so a whitespace/edge-bounded
    * alternation matches exactly the tokens `filter(ws, isin(stop))`
    * keeps — but `filter` is a higher-order function (interpreted,
    * per-row lambda + array materialization; the sf10 sweep measured
    * lang_id's four filters at 52.5s/500k docs, 2× the comparable
    * one-scan queries) while RegExpCount runs inside whole-stage
    * codegen with the compiled pattern cached. */
  private def hitsRe(loweredText: Column, stop: Seq[String]): Column =
    regexp_count(loweredText,
      lit(s"(?:^|(?<=\\s))(?:${stop.mkString("|")})(?:(?=\\s)|$$)"))
      .cast("long")

  /**
   * Heuristic quality score from surface statistics: length saturation,
   * punctuation/digit density, stopword coverage.
   */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val ws = words(t)
    df.select(
      col(idCol),
      length(t).cast("long").as("n_chars"),
      size(ws).cast("long").as("n_words"),
      round(length(regexp_replace(t, "\\s", "")) / size(ws).cast("double"), 4).as("avg_word_len"),
      round(length(t).minus(length(regexp_replace(t, "[.,!?;:]", ""))) /
        length(t).cast("double"), 6).as("punct_ratio"),
      round(length(t).minus(length(regexp_replace(t, "[0-9]", ""))) /
        length(t).cast("double"), 6).as("digit_ratio"),
      round(hitsRe(lower(trim(t)), EnStop) / size(ws).cast("double"), 6).as("stop_ratio"))
    .withColumn("quality",
      round(least(lit(1.0), col("n_words") / 100.0) * 0.5 +
        (lit(1.0) - least(lit(1.0), col("punct_ratio") * 10)) * 0.25 +
        least(lit(1.0), col("stop_ratio") * 5) * 0.25, 4))
    .orderBy(col(idCol))
  }

  /**
   * Stopword-profile language guess: count hits against per-language
   * stopword lists, pick the argmax with a fixed precedence
   * (en > de > fr > es), 'unknown' when nothing matches.
   */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lt = lower(trim(col(textCol)))
    df.select(col(idCol),
        hitsRe(lt, EnStop).as("en_hits"), hitsRe(lt, DeStop).as("de_hits"),
        hitsRe(lt, FrStop).as("fr_hits"), hitsRe(lt, EsStop).as("es_hits"))
      .withColumn("lang_guess",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits") &&
          col("en_hits") >= col("es_hits") && col("en_hits") > 0, "en")
        .when(col("de_hits") >= col("fr_hits") && col("de_hits") >= col("es_hits") &&
          col("de_hits") > 0, "de")
        .when(col("fr_hits") >= col("es_hits") && col("fr_hits") > 0, "fr")
        .when(col("es_hits") > 0, "es")
        .otherwise("unknown"))
      .orderBy(col(idCol))
  }

  /**
   * Token counts: whitespace tokens and a BPE-ish segmentation
   * (letter runs / single digits / single punctuation), the standard
   * pre-tokenizer shape for byte-pair encoders.
   */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        size(words(col(textCol))).cast("long").as("ws_tokens"),
        regexp_count(col(textCol), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))
          .cast("long").as("bpe_tokens"))
      .withColumn("tokens_ratio",
        round(col("bpe_tokens") / col("ws_tokens").cast("double"), 4))
      .orderBy(col(idCol))

  /**
   * Deterministic train/valid/test split by content-hash range: the
   * first md5 nibble of the id buckets 75 / 12.5 / 12.5. Hash-based
   * splits are how training pipelines carve eval sets at scale —
   * reproducible across runs/engines, stable under re-partitioning and
   * corpus growth (a document's split never changes), no RNG state to
   * coordinate across 1000 executors.
   */
  def corpusSplit(df: DataFrame, idCol: String): DataFrame = {
    val nib = substring(md5(col(idCol).cast("string").cast("binary")), 1, 1)
    df.select(col(idCol),
        when(nib.isin("c", "d"), "valid")
          .when(nib.isin("e", "f"), "test")
          .otherwise("train").as("split"))
      .orderBy(col(idCol))
  }

  /**
   * Top-k TF-IDF-weighted terms per document. The weight is the
   * integer-exact `tf * 1e6 div df` (reciprocal document frequency
   * scaled to ppm) rather than `tf·ln(N/df)`: rank order per document
   * is what matters, reciprocal-df preserves it for fixed tf, and the
   * integer arithmetic makes the ranking bit-identical across engines
   * (ln() differs in the last ulp between libm and the JVM, which
   * would make a float ORDER BY nondeterministic across the oracle
   * boundary). Two shuffles, both keyed on what they aggregate
   * (doc×term, then term); the top-k window re-uses the doc key.
   */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(words(col(textCol))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // pinned shuffle-hash building dfreq: vocabulary is unbounded at
    // corpus scale (never broadcast-honest), and at mid SFs its size
    // estimate straddles the broadcast threshold so AQE flips
    // broadcast↔sort-merge run-to-run (observed at the 10× sweep).
    // dfreq arrives term-partitioned from its own aggregation, so the
    // hash join reuses that shuffle and never sorts the doc×term side.
    val scored = tf.join(dfreq.hint("shuffle_hash"), "term")
      .withColumn("score_ppm", expr("(tf * 1000000) div df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_ppm").desc, col("term"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score_ppm"), col("rk"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /**
   * Nucleus (top-p) term truncation per document, integer-exact: keep
   * a document's terms in descending frequency order while the mass
   * BEFORE each term is less than half the document's total — i.e.
   * 2·cum_before < total, no float share computation to disagree at
   * the cut. The vocabulary-compaction shape (and the same cumsum
   * window as any per-group nucleus cut); all windows are keyed on the
   * document, so work distributes by doc at any corpus size.
   */
  def topPTerms(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol).as("doc_id"),
        explode(words(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val wDoc = Window.partitionBy(col("doc_id"))
    val wCum = wDoc.orderBy(col("tf").desc, col("term"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tf.withColumn("total_tf", sum(col("tf")).over(wDoc))
      .withColumn("cum_before", coalesce(sum(col("tf")).over(wCum), lit(0L)))
      .filter(col("cum_before") * 2 < col("total_tf"))
      .select(col("doc_id"), col("term"), col("tf"),
        col("cum_before"), col("total_tf"))
      .orderBy(col("doc_id"), col("cum_before"), col("term"))
  }

  /**
   * Corpus bigram language-model table — the next-word conditional
   * probability estimate p(w2|w1) = c(w1,w2)/c(w1), kept top-k per
   * context word. The classic n-gram LM fit (and the basis of
   * perplexity scoring, completion suggestion, collocation mining).
   * Probabilities are integer-exact ppm (`c12·10⁶ div c1`) for the
   * same reason as tfidf_terms: rank order is what matters and
   * integer arithmetic makes the ranking bit-identical across engines.
   *
   * Context counts c1 deliberately count BIGRAM LEFT OCCURRENCES
   * (= token occurrences with a successor), so Σ p(·|w1) = 1 exactly.
   *
   * Shape at 100 TB: bigrams come from the codegen'd posexplode +
   * lead() chain (one doc-keyed window shuffle), then two
   * vocabulary-keyed aggregations; the context-count join is pinned
   * shuffle-hash (vocabulary is unbounded, never broadcast-honest,
   * and arrives key-partitioned from its own aggregation). The top-k
   * window partitions by context word.
   */
  def bigramLm(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("pos"))
    val toks = df.select(col(idCol).as("doc"),
      posexplode(words(col(textCol))).as(Seq("pos", "w")))
    val bi = toks
      .withColumn("w2", lead(col("w"), 1).over(byDoc))
      .filter(col("w2").isNotNull)
      .select(col("w").as("w1"), col("w2"))
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w1"))
      .orderBy(col("c12").desc, col("w2"))
    c12.join(c1.hint("shuffle_hash"), "w1")
      .withColumn("p_ppm", expr("(c12 * 1000000) div c1"))
      .withColumn("rk", row_number().over(wTop).cast("long"))
      .filter(col("rk") <= k)
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("p_ppm"), col("rk"))
      .orderBy(col("w1"), col("rk"))
  }

  // PII patterns shared by the Spark and oracle sides — restricted to
  // syntax Java regex and RE2 (DuckDB) interpret identically
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /**
   * PII scrubbing — the redaction pass every training corpus runs
   * before the tokenizer: emails, SSNs, phone numbers, and IPv4
   * addresses replaced with typed tags, with per-document match counts
   * for audit. Pure codegen'd regexp expressions, one scan; patterns
   * are deliberately the RE2-compatible subset so the same strings
   * drive the DuckDB oracle. SSN before phone: both are digit-dash
   * shapes and replacement order is part of the contract.
   */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
        col(idCol),
        regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(t, lit(SsnRe)).cast("long").as("n_ssns"),
        regexp_count(t, lit(PhoneRe)).cast("long").as("n_phones"),
        regexp_count(t, lit(Ipv4Re)).cast("long").as("n_ips"),
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(t, EmailRe, "[EMAIL]"),
              SsnRe, "[SSN]"),
            PhoneRe, "[PHONE]"),
          Ipv4Re, "[IP]").as("scrubbed"))
      .withColumn("is_clean",
        col("n_emails") + col("n_ssns") + col("n_phones") + col("n_ips") === 0)
      .orderBy(col(idCol))
  }

  /**
   * Overlapping word-window chunking — the retrieval/training prep
   * step that splits long documents into fixed-size chunks with
   * `chunkSize - stride` words of overlap. Pure row-local expressions
   * (sequence → explode → slice → array_join, all codegen'd): no
   * shuffle, embarrassingly parallel, output rows carry the word
   * offset so chunks map back into the source. A document shorter
   * than one chunk yields exactly one (possibly short) chunk.
   */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 50, stride: Int = 40): DataFrame =
    df.select(col(idCol), words(col(textCol)).as("ws"))
      .select(col(idCol), col("ws"),
        explode(sequence(lit(0L),
          expr(s"(size(ws) - 1) div $stride"))).as("chunk_idx"))
      .withColumn("chunk_start", col("chunk_idx") * stride)
      .withColumn("chunk_words",
        slice(col("ws"), (col("chunk_start") + 1).cast("int"), lit(chunkSize)))
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        size(col("chunk_words")).cast("long").as("n_chunk_words"),
        array_join(col("chunk_words"), " ").as("chunk_text"))
      .orderBy(col(idCol), col("chunk_idx"))

  /**
   * Corpus-unigram negative log-likelihood — the perplexity-proxy
   * quality signal (the CCNet-style filter, with the corpus itself as
   * the language model): score each document by the average
   * −log₂ p(word) of its tokens under the corpus unigram distribution.
   * Gibberish and rare-token-heavy documents score high; fluent text
   * built from common words scores low. The integer-exact companions
   * (n_rare at corpus frequency ≤ 5, and the `rare_heavy` flag
   * 5·n_rare > n_tokens) give a float-free signal for pipelines that
   * cut on a boundary.
   *
   * Shape at 100 TB: two keyed aggregations (doc×term term counts,
   * then term → corpus frequency) and one join back, pinned
   * shuffle-hash exactly as tfidfTopTerms (the vocabulary is unbounded
   * and arrives term-partitioned from its own aggregation); the corpus
   * total re-enters as a broadcast 1-row join. No per-group buffering,
   * no collect beyond the 1-row total.
   */
  def unigramLogProb(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tf = df.select(col(idCol).as("doc_id"),
        explode(words(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val total = cf.agg(sum(col("cf")).as("n_total"))
    tf.join(cf.hint("shuffle_hash"), "term")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * log2(col("cf"))).as("sum_log_cf"),
        sum(when(col("cf") <= 5, col("tf")).otherwise(lit(0L))).as("n_rare"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_tokens"), col("n_rare"),
        round(log2(col("n_total")) - col("sum_log_cf") / col("n_tokens"), 4)
          .as("avg_nll_bits"),
        (col("n_rare") * 5 > col("n_tokens")).as("rare_heavy"))
      .orderBy(col("doc_id"))
  }

  /**
   * Content fingerprint: normalize (lowercase, strip non-alnum,
   * collapse whitespace) then hash; join back the fingerprint group
   * size — documents sharing a fingerprint are normalization-equal.
   */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""), " +", " "))
    // group stats via a window on fp, NOT aggregate + self-join: the
    // join shape scans the text (and re-runs the regex normalization +
    // md5, the expensive part) once per branch; the window computes
    // fingerprints in ONE pass with the same single shuffle on fp
    val w = Window.partitionBy(col("fp"))
    df.select(col(idCol), md5(norm).as("fp"))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .select(col(idCol), col("fp"), col("group_size"),
        (col(idCol) === col("canonical_id")).as("is_canonical"))
      .orderBy(col(idCol))
  }
}
