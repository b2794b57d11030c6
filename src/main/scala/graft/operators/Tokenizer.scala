package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions._

/**
 * Byte-pair-encoding merge induction — the tokenizer-fit step of a
 * training-data pipeline: learn the `nMerges` highest-frequency
 * adjacent-token merges over a corpus, exactly the BPE training loop
 * (Sennrich et al.), expressed the way it actually scales:
 *
 *  - ONE corpus scan builds the word-frequency table; every training
 *    round thereafter runs on that VOCABULARY-sized relation (the
 *    standard trick — pair statistics are a pure function of
 *    (distinct word, count), so 100 TB of text collapses to a
 *    vocab-sized table before any iteration);
 *  - each round is two tiny keyed jobs on the vocab table: weighted
 *    adjacent-pair counts → argmax (collected driver-side: ONE pair —
 *    model parameters), then the merge applied as a boundary-safe
 *    string replace (tokens carry " " sentinels, so " a b " → " ab "
 *    is exact and left-greedy on overlaps, the standard BPE
 *    application order);
 *  - ties break deterministically (freq desc, then pair
 *    lexicographic), so the learned merge list is reproducible across
 *    engines and partitionings.
 *
 * Pair frequencies count ADJACENT OCCURRENCES (overlap included, as
 * BPE counts do), so the applied merge count can be lower than the
 * counted frequency ("l l l" counts two "l l" pairs, merges once);
 * `applied = tokens_before − tokens_after` reports the exact number
 * of merges performed. The returned merge table is model parameters
 * (driver-held, like k-means centroids); `bpeFitChecked` folds its
 * invariants into an oracle-assertable row.
 */
object Tokenizer {

  /** One learned merge round. */
  final case class BpeMerge(rank: Int, left: String, right: String,
      freq: Long, applied: Long, tokensBefore: Long, tokensAfter: Long)

  /** The corpus collapsed to (word, n, toks) — built ONCE and
    * materialized (Dedup.materialize: localCheckpoint by default,
    * `spark.graft.materialize=none` recomputes); every training round
    * reads this vocabulary-sized table, never the corpus. */
  private def vocabBase(df: DataFrame, textCol: String): DataFrame =
    Dedup.materialize(
      df.select(explode(words(col(textCol))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        // " h e l l o " — sentinel spaces make every token boundary a
        // literal " x y " window, so replace() is exact
        .withColumn("toks",
          concat(lit(" "), array_join(split(col("word"), "(?!^)"), " "), lit(" "))))

  /** The vocab table after applying `merges` rounds in order. */
  private def vocabTokens(base: DataFrame,
      merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(base) { case (st, (a, b)) =>
      st.withColumn("toks", replace(col("toks"), lit(s" $a $b "), lit(s" $a$b ")))
    }

  private def tokenTotal(state: DataFrame): Long =
    state.agg(sum(size(split(trim(col("toks")), " ")) * col("n")))
      .head().getLong(0)

  /** Learn `nMerges` merges; returns the merge log in rank order
    * (may be shorter if the corpus runs out of repeated pairs). */
  def bpeFit(df: DataFrame, idCol: String, textCol: String,
      nMerges: Int = 8): Seq[BpeMerge] =
    fitOn(vocabBase(df, textCol), nMerges)._1

  /** Weighted adjacent-pair counts of a (word, n, toks) state. */
  private def pairCountsOf(state: DataFrame): DataFrame = {
    val arr = split(trim(col("toks")), " ")
    val byWord = Window.partitionBy(col("word")).orderBy(col("pos"))
    state
      .select(col("word"), col("n"), posexplode(arr).as(Seq("pos", "t")))
      .withColumn("t2", lead(col("t"), 1).over(byWord))
      .filter(col("t2").isNotNull)
      .groupBy(col("t"), col("t2")).agg(sum(col("n")).as("f"))
  }

  /**
   * Incremental-pair-count BPE training — the fit the loop's scaling
   * actually needs: pair statistics are maintained by DELTA, not
   * recomputed, and the state is maintained in place, not re-derived
   * from the base by re-applying the whole merge list (the previous
   * form — O(R²) replace applications and O(R) plan depth at R
   * merges; TokenizerSpec proves this fit EQUAL to that reference on
   * the classic fixtures and at R=64 on testdata).
   *
   * Per round, with (a, b) the argmax pair:
   *  - only vocab rows whose tokenization CONTAINS " a b " change;
   *    their old pair contributions are subtracted and their
   *    re-tokenized contributions added — two pair-count jobs over
   *    the AFFECTED slice, not the vocabulary;
   *  - the state updates as one conditional-replace projection and
   *    both state and counts re-materialize at the round boundary
   *    (vocab-sized localCheckpoints — plan depth is CONSTANT in R,
   *    so 30k merges plan like 8);
   *  - `applied` comes from the affected slice's token-count delta —
   *    no full-state token recount per round.
   * Ties still break (freq desc, pair lexicographic), so the learned
   * list is unchanged from the reference implementation.
   */
  private[operators] def fitOn(base: DataFrame,
      nMerges: Int): (Seq[BpeMerge], DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    // Vocabulary-sized state is MODEL-PARAMETER-sized by construction
    // (the corpus collapsed to distinct words) — the same class as
    // CC's localMaxEdges edge sets. At or under the budget the whole
    // merge loop runs driver-side: the distributed loop costs ~4
    // blocking jobs per round (argmax collect, delta agg, two
    // checkpoint boundaries) over a tiny relation, pure scheduling at
    // any SF, where the local loop is microseconds per round on the
    // identical algorithm (delta-maintained pair counts, identical
    // tie-breaks — TokenizerSpec pins local ≡ rescan-reference and
    // local ≡ distributed-incremental). -1 disables; over-budget
    // vocabularies run the distributed loop unchanged.
    val localMax = Budget.long(base.sparkSession, Budget.BpeLocalMaxVocab,
      200000L)
    if (localMax >= 0L && base.count() <= localMax)
      return fitOnLocal(base, nMerges)
    val log = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var state = base
    var counts = Dedup.materialize(pairCountsOf(state))
    var before = tokenTotal(state)
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val top = counts.orderBy(col("f").desc, col("t"), col("t2"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < 2) done = true
      else {
        val (a, b, f) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        val pat = s" $a $b "
        val merged = s" $a$b "
        val affected = state.filter(col("toks").contains(pat))
        val affectedNew = affected
          .withColumn("toks", replace(col("toks"), lit(pat), lit(merged)))
        // applied = exact token reduction over the AFFECTED slice —
        // one agg computes the old and re-tokenized totals together
        // (no full-state recount per round)
        val deltaRow = affected
          .agg(
            coalesce(sum(size(split(trim(col("toks")), " ")) * col("n")), lit(0L))
              .as("old_toks"),
            coalesce(sum(size(split(trim(
              replace(col("toks"), lit(pat), lit(merged))), " ")) * col("n")),
              lit(0L)).as("new_toks"))
          .head()
        val oldToks = deltaRow.getLong(0)
        val newToks = deltaRow.getLong(1)
        val deltaOld = pairCountsOf(affected)
          .withColumn("f", -col("f"))
        val deltaNew = pairCountsOf(affectedNew)
        counts = Dedup.materialize(
          counts.unionByName(deltaOld).unionByName(deltaNew)
            .groupBy(col("t"), col("t2")).agg(sum(col("f")).as("f"))
            .filter(col("f") > 0))
        state = Dedup.materialize(
          state.withColumn("toks",
            when(col("toks").contains(pat),
              replace(col("toks"), lit(pat), lit(merged)))
              .otherwise(col("toks"))))
        val after = before - (oldToks - newToks)
        log += BpeMerge(r, a, b, f, before - after, before, after)
        before = after
        r += 1
      }
    }
    (log.toSeq, state)
  }

  /** Spark's string ordering is binary over UTF-8 bytes
    * (UTF8String.compareTo — unsigned byte-wise), which differs from
    * java.lang.String.compareTo (UTF-16 code units) outside ASCII; the
    * local tie-break must rank EXACTLY as the distributed orderBy. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The driver-side twin of the distributed incremental loop below —
    * same delta maintenance, same argmax tie-breaks (freq desc, then
    * pair in UTF-8 binary order), same left-greedy literal replace
    * (String.replace and Spark's StringReplace both substitute
    * leftmost non-overlapping occurrences), same applied/token
    * accounting — on collected (word, n, toks) rows. */
  private def fitOnLocal(base: DataFrame,
      nMerges: Int): (Seq[BpeMerge], DataFrame) = {
    val spark = base.sparkSession
    val rows = base.select(col("word"), col("n"), col("toks")).collect()
    val wordsArr = rows.map(_.getString(0))
    val ns = rows.map(_.getLong(1))
    val toks = rows.map(_.getString(2))
    def tokCount(t: String): Long = {
      // tokens are single-space separated with sentinel spaces — count
      // gaps exactly as size(split(trim(t), " ")) does
      val s = t.trim
      if (s.isEmpty) 0L else (s.count(_ == ' ') + 1).toLong
    }
    val counts = new java.util.HashMap[(String, String), Long]()
    def addPairs(i: Int, sign: Long): Unit = {
      val a = toks(i).trim.split(" ")
      var j = 0
      while (j < a.length - 1) {
        val p = (a(j), a(j + 1))
        val nv = counts.getOrDefault(p, 0L) + sign * ns(i)
        if (nv == 0L) counts.remove(p) else counts.put(p, nv)
        j += 1
      }
    }
    var before = 0L
    var i = 0
    while (i < toks.length) {
      addPairs(i, 1L)
      before += ns(i) * tokCount(toks(i))
      i += 1
    }
    val log = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      // argmax with the distributed orderBy's exact tie-breaks; only
      // f > 0 entries exist (zero entries are removed on update)
      var best: ((String, String), Long) = null
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey; val f = e.getValue
        if (best == null || f > best._2 ||
            (f == best._2 && (utf8Lt(k._1, best._1._1) ||
              (k._1 == best._1._1 && utf8Lt(k._2, best._1._2)))))
          best = (k, f)
      }
      if (best == null || best._2 < 2) done = true
      else {
        val ((a, b), f) = best
        val pat = s" $a $b "
        val merged = s" $a$b "
        var deltaToks = 0L
        var w = 0
        while (w < toks.length) {
          if (toks(w).contains(pat)) {
            addPairs(w, -1L)
            val old = tokCount(toks(w))
            toks(w) = toks(w).replace(pat, merged)
            addPairs(w, 1L)
            deltaToks += ns(w) * (old - tokCount(toks(w)))
          }
          w += 1
        }
        val after = before - deltaToks
        log += BpeMerge(r, a, b, f, before - after, before, after)
        before = after
        r += 1
      }
    }
    val outRows: java.util.List[Row] = java.util.Arrays.asList(
      wordsArr.indices.map(j => Row(wordsArr(j), ns(j), toks(j))): _*)
    (log.toSeq, spark.createDataFrame(outRows, base.schema))
  }

  /**
   * The pre-incremental reference fit — recomputes pair counts from
   * the full state and re-applies the whole merge list each round.
   * Kept ONLY as the equivalence oracle for TokenizerSpec (the
   * incremental fit must produce an identical merge log); never used
   * by the library paths.
   */
  private[operators] def fitOnRescan(base: DataFrame,
      nMerges: Int): Seq[BpeMerge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val log = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var merges = Seq.empty[(String, String)]
    var state = base
    var before = tokenTotal(state)
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val top = pairCountsOf(state)
        .orderBy(col("f").desc, col("t"), col("t2"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < 2) done = true
      else {
        val (a, b, f) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        merges = merges :+ ((a, b))
        state = vocabTokens(base, merges)
        val after = tokenTotal(state)
        log += BpeMerge(r, a, b, f, before - after, before, after)
        before = after
        r += 1
      }
    }
    log.toSeq
  }

  /** The learned merge table as a DataFrame (model parameters). */
  def bpeMergeTable(spark: SparkSession, log: Seq[BpeMerge]): DataFrame = {
    val schema = StructType(Seq(
      StructField("merge_rank", LongType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("freq", LongType, nullable = false),
      StructField("applied", LongType, nullable = false),
      StructField("tokens_before", LongType, nullable = false),
      StructField("tokens_after", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(log.map(m => Row(m.rank.toLong, m.left,
        m.right, m.left + m.right, m.freq, m.applied, m.tokensBefore,
        m.tokensAfter)), 1),
      schema)
  }

  /**
   * BPE apply — tokenize the corpus under the learned merges and
   * report per-document token statistics (the number every LM data
   * pipeline needs for packing, pricing, and length filtering).
   *
   * Scale shape: segmentation is computed once per DISTINCT word on
   * the vocabulary-sized table (the same collapse that makes the fit
   * scale — a 100 TB corpus has a bounded vocabulary), then re-enters
   * the document scan as an equi-join keyed on the word. The join is
   * shuffle-hash-pinned (vocab and exploded-corpus sides both big at
   * scale, the tfidf pattern); per-doc stats are one keyed aggregate
   * with map-side partials. At production vocab sizes (30k+ merges)
   * the merge fold would checkpoint every few hundred rounds to bound
   * plan depth; the mechanics are identical.
   *
   * @return per doc: word count, character-token count (pre-merge),
   *         BPE token count (post-merge), and saved = chars − bpe
   */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      nMerges: Int = 8): DataFrame = {
    val (log, finalState) = fitOn(vocabBase(df, textCol), nMerges)
    encodeOn(df, idCol, textCol, finalState, log)
  }

  private def encodeOn(df: DataFrame, idCol: String, textCol: String,
      finalState: DataFrame, log: Seq[BpeMerge]): DataFrame = {
    val wordToks = finalState.select(col("word"),
      size(split(trim(col("toks")), " ")).cast("long").as("w_toks"),
      length(col("word")).cast("long").as("w_chars"))
    df.select(col(idCol).as("doc_id"),
        explode(words(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .join(wordToks.hint("shuffle_hash"), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("w_chars")).as("n_char_tokens"),
        sum(col("w_toks")).as("n_bpe_tokens"))
      .withColumn("saved", col("n_char_tokens") - col("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /**
   * Oracle-assertable encode: per-doc word and character-token counts
   * are SQL-recomputable values; the BPE token count itself is not
   * (it depends on the iterated merges), so it travels as invariant
   * flags — bounded per doc (words ≤ bpe ≤ chars: every word is ≥1
   * token and merges only shrink), and the corpus total must equal
   * the fit log's final token count EXACTLY (the encode join and the
   * fit's vocab-side accounting are independent computations of the
   * same number — a 1-row broadcast re-entering per doc).
   */
  def bpeEncodeChecked(df: DataFrame, idCol: String, textCol: String,
      nMerges: Int = 8): DataFrame = {
    val base = vocabBase(df, textCol)
    val (log, finalState) = fitOn(base, nMerges)
    val enc = encodeOn(df, idCol, textCol, finalState, log)
    val fitTotal = if (log.isEmpty) tokenTotal(base) else log.last.tokensAfter
    val total = enc.agg(sum(col("n_bpe_tokens")).as("enc_total"))
    enc.crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_words"), col("n_char_tokens"),
        (col("n_bpe_tokens") >= col("n_words") &&
          col("n_bpe_tokens") <= col("n_char_tokens")).as("bpe_bounded"),
        (col("enc_total") === fitTotal).as("totals_consistent"),
        (col("n_words") > 0).as("nonempty"))
      .orderBy(col("doc_id"))
  }

  /**
   * Per-language tokenizer fertility report — the number a tokenizer
   * team reads before shipping a vocab ("de fragments 1.9 tokens/word,
   * zh 3.2 — grow the zh merges"): per language, doc/word/char totals
   * and the learned-BPE token mass, with fertility's SQL-unreachable
   * part carried as invariant flags (the bpeEncodeChecked contract,
   * aggregated per language): per-lang token total bounded by
   * [words, chars] (merges only shrink, every word ≥1 token) and the
   * corpus total equal to the fit log's accounting EXACTLY.
   *
   * Scale shape: the corpus collapses through the same encode join as
   * [[bpeEncode]] (vocab-sized relation joined onto exploded words),
   * then one lang-keyed aggregate — language count rows out.
   */
  def bpeFertilityChecked(df: DataFrame, idCol: String, textCol: String,
      langCol: String, nMerges: Int = 8): DataFrame = {
    val base = vocabBase(df, textCol)
    val (log, finalState) = fitOn(base, nMerges)
    val enc = encodeOn(df, idCol, textCol, finalState, log)
    val lang = df.select(col(idCol).as("doc_id"), col(langCol).as("lang"))
    // lang-count-sized, consumed twice (the corpus total and the
    // output rows) — materialized so the corpus-wide encode join runs
    // once, not once per consumer
    val per = Dedup.materialize(enc.join(lang.hint("shuffle_hash"), "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_char_tokens")).as("n_chars"),
        sum(col("n_bpe_tokens")).as("bpe_total")))
    val fitTotal = if (log.isEmpty) tokenTotal(base) else log.last.tokensAfter
    val total = per.agg(sum(col("bpe_total")).as("enc_total"))
    per.crossJoin(broadcast(total))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_chars"),
        (col("bpe_total") >= col("n_words") &&
          col("bpe_total") <= col("n_chars")).as("fertility_bounded"),
        (col("enc_total") === fitTotal).as("totals_consistent"))
      .orderBy(col("lang"))
  }

  /**
   * Oracle-assertable summary: the SQL-recomputable facts (round-1
   * argmax pair and frequency, the initial token total) as values,
   * and the un-SQL-able rounds ≥2 as invariant flags — frequencies
   * non-increasing (a new pair's occurrences are bounded by the merge
   * that created its left/right parts), every round applied ≥1 and
   * ≤ freq merges, and the final tokenization re-concatenates to the
   * original words (losslessness, checked distributed).
   */
  def bpeFitChecked(df: DataFrame, idCol: String, textCol: String,
      nMerges: Int = 8): DataFrame = {
    val base = vocabBase(df, textCol)
    val (log, finalState) = fitOn(base, nMerges)
    val freqOk = log.zip(log.drop(1)).forall { case (x, y) => y.freq <= x.freq }
    val appliedOk = log.forall(m => m.applied >= 1 && m.applied <= m.freq)
    val first = log.head
    finalState
      .agg(sum(when(replace(trim(col("toks")), lit(" "), lit("")) === col("word"),
        0L).otherwise(1L)).as("bad"))
      .select(
        lit(log.length.toLong).as("n_merges"),
        lit(first.left).as("first_left"),
        lit(first.right).as("first_right"),
        lit(first.freq).as("first_freq"),
        lit(first.tokensBefore).as("initial_tokens"),
        lit(freqOk).as("freq_nonincreasing"),
        lit(appliedOk).as("applies_bounded"),
        (col("bad") === 0).as("lossless"),
        lit(log.nonEmpty).as("nonempty"))
  }
}
