package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.{CountIn, Text}
import graft.functions.Exact.dsum

/** Text-analysis operators for a training-data pipeline: quality scoring,
  * language-ID heuristic, token counting (whitespace + BPE-ish regex),
  * per-language top terms, and document fingerprinting. All per-document
  * work is array expressions inside whole-stage codegen — one scan, no
  * UDFs, no shuffle except where a groupBy is the semantics.
  *
  * Stopword hits run through the codegen'd `count_in` expression
  * ([[graft.functions.CountInSet]]) and token-length sums through
  * `length(array_join(w, ''))` — the r2 forms (`size(filter(...))` and
  * `aggregate(...)`) were interpreted HOF passes, 4–5 per row, and made
  * these two queries the slowest non-join scans in the bench.
  */
object TextAnalysis {

  private val StopEn = Seq("the", "a", "of", "and", "is")
  private val StopEs = Seq("el", "la", "de", "y", "que")
  private val StopDe = Seq("der", "die", "und", "das", "ist")
  private val StopFr = Seq("le", "la", "de", "et", "les")

  private def hits(toks: Column, words: Seq[String]): Column =
    call_function("count_in", toks, typedlit(words))

  /** DuckDB list literal for a stopword list — derived from the same
    * Seq the Spark side votes with, so the two engines can never
    * disagree on a list's contents. */
  private def listSql(ws: Seq[String]): String = ws.mkString("['", "','", "']")
  private val StopEnSql = listSql(StopEn)
  private val StopEsSql = listSql(StopEs)
  private val StopDeSql = listSql(StopDe)
  private val StopFrSql = listSql(StopFr)

  /** Quality-gate thresholds — ONE definition shared by
    * [[textQualityFilter]] and [[curationE2e]] (Scala and SQL sides of
    * both), so tightening the standalone gate can never silently
    * diverge from the composed pipeline. */
  private val MinTokens = 20
  private val MinAvgTokLen = 2.0
  private val MaxAvgTokLen = 12.0
  private val MinStopRatio = 0.01
  private val MinDistinctRatio = 0.2

  // ---- shared quality features ----------------------------------------------

  /** The per-document quality-feature expressions over a token array —
    * ONE Scala-side definition projected by [[textStats]],
    * [[textQualityFilter]] and [[curationE2e]] (the thresholds above are
    * shared the same way), so a formula edit in one consumer can never
    * silently diverge from the others. Ratios are guarded to NULL on a
    * zero-token document: unguarded `0.0 / 0.0` is NaN in Spark but NULL
    * in DuckDB (whose `list_sum([])` is NULL too), an engine-vs-oracle
    * divergence on any all-punctuation text. */
  private def featNTokens(w: Column): Column = size(w).cast("long")
  private def featRatio(num: Column, w: Column): Column =
    when(size(w) > 0, num / size(w).cast("double"))
  // Σ token lengths == length of the separator-free join (tokens are
  // non-null), and ArrayJoin is codegen'd where aggregate is not
  private def featAvgTokLen(w: Column): Column =
    featRatio(length(array_join(w, "")).cast("double"), w)
  private def featStopRatio(w: Column): Column =
    featRatio(hits(w, StopEn).cast("double"), w)
  private def featDistinctRatio(w: Column): Column =
    featRatio(size(array_distinct(w)).cast("double"), w)

  // ---- quality scoring -----------------------------------------------------

  /** Per-document quality features: token counts, type/token ratio, mean
    * token length, stopword ratio. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    CountIn.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("w"))
      .select(
        col("doc_id"),
        featNTokens(col("w")).as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        featDistinctRatio(col("w")).as("distinct_ratio"),
        featAvgTokLen(col("w")).as("avg_token_len"),
        featStopRatio(col("w")).as("stop_ratio"))
  }

  private val TokSql = Text.TokensOracleSql

  val textStatsSql: String =
    s"""WITH tok AS (SELECT doc_id, $TokSql AS w FROM documents)
      |SELECT doc_id,
      |  CAST(len(w) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
      |  CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS distinct_ratio,
      |  CAST(CAST(list_sum(list_transform(w, t -> length(t))) AS BIGINT) AS DOUBLE)
      |    / CAST(len(w) AS DOUBLE) AS avg_token_len,
      |  CAST(len(list_filter(w, t -> list_contains($StopEnSql, t))) AS DOUBLE)
      |    / CAST(len(w) AS DOUBLE) AS stop_ratio
      |FROM tok""".stripMargin

  // ---- language ID ---------------------------------------------------------

  /** Stopword-vote language heuristic with a fixed precedence tie-break
    * (en > es > de > fr); 'unknown' when no list matches. */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    CountIn.register(spark)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        hits(col("w"), StopEn).as("en_hits"), hits(col("w"), StopEs).as("es_hits"),
        hits(col("w"), StopDe).as("de_hits"), hits(col("w"), StopFr).as("fr_hits"))
    docs.select(
      col("doc_id"), col("en_hits"), col("es_hits"), col("de_hits"), col("fr_hits"),
      when(col("en_hits") + col("es_hits") + col("de_hits") + col("fr_hits") === 0, "unknown")
        .when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("de_hits") &&
          col("en_hits") >= col("fr_hits"), "en")
        .when(col("es_hits") >= col("de_hits") && col("es_hits") >= col("fr_hits"), "es")
        .when(col("de_hits") >= col("fr_hits"), "de")
        .otherwise("fr").as("lang_pred"))
  }

  val textLangidSql: String =
    s"""WITH tok AS (SELECT doc_id, $TokSql AS w FROM documents),
      |h AS (SELECT doc_id,
      |  CAST(len(list_filter(w, t -> list_contains($StopEnSql, t))) AS BIGINT) AS en_hits,
      |  CAST(len(list_filter(w, t -> list_contains($StopEsSql, t))) AS BIGINT) AS es_hits,
      |  CAST(len(list_filter(w, t -> list_contains($StopDeSql, t))) AS BIGINT) AS de_hits,
      |  CAST(len(list_filter(w, t -> list_contains($StopFrSql, t))) AS BIGINT) AS fr_hits
      |FROM tok)
      |SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
      |  CASE WHEN en_hits + es_hits + de_hits + fr_hits = 0 THEN 'unknown'
      |       WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
      |       WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
      |       WHEN de_hits >= fr_hits THEN 'de'
      |       ELSE 'fr' END AS lang_pred
      |FROM h""".stripMargin

  /** Gopher/C4-style quality gate: the per-document features of
    * textStats folded into a keep/drop decision (min length, sane mean
    * token length, enough stopwords to look like prose, lexical
    * diversity). The WHOLE pipeline stays one codegen'd scan — at 100 TB
    * this is the first pass over a crawl, so the keep decision must cost
    * one read, not a join against a feature table. The per-rule flags
    * are emitted so downstream can audit WHY a doc dropped.
    */
  def textQualityFilter(spark: SparkSession, dir: String): DataFrame = {
    CountIn.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("w"))
      .select(
        col("doc_id"),
        featNTokens(col("w")).as("n_tokens"),
        featAvgTokLen(col("w")).as("avg_token_len"),
        featStopRatio(col("w")).as("stop_ratio"),
        featDistinctRatio(col("w")).as("distinct_ratio"))
      .select(
        col("doc_id"),
        (col("n_tokens") >= MinTokens).as("len_ok"),
        (col("avg_token_len") >= MinAvgTokLen &&
          col("avg_token_len") <= MaxAvgTokLen).as("tok_len_ok"),
        (col("stop_ratio") >= MinStopRatio).as("prose_ok"),
        (col("distinct_ratio") >= MinDistinctRatio).as("diversity_ok"))
      .withColumn("keep",
        col("len_ok") && col("tok_len_ok") && col("prose_ok") && col("diversity_ok"))
  }

  val textQualityFilterSql: String =
    s"""WITH tok AS (SELECT doc_id, $TokSql AS w FROM documents),
      |f AS (SELECT doc_id,
      |  CAST(len(w) AS BIGINT) AS n_tokens,
      |  CAST(CAST(list_sum(list_transform(w, t -> length(t))) AS BIGINT) AS DOUBLE)
      |    / CAST(len(w) AS DOUBLE) AS avg_token_len,
      |  CAST(len(list_filter(w, t -> list_contains($StopEnSql, t))) AS DOUBLE)
      |    / CAST(len(w) AS DOUBLE) AS stop_ratio,
      |  CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS distinct_ratio
      |FROM tok)
      |SELECT doc_id,
      |  n_tokens >= $MinTokens AS len_ok,
      |  avg_token_len >= $MinAvgTokLen AND avg_token_len <= $MaxAvgTokLen AS tok_len_ok,
      |  stop_ratio >= $MinStopRatio AS prose_ok,
      |  distinct_ratio >= $MinDistinctRatio AS diversity_ok,
      |  (n_tokens >= $MinTokens AND avg_token_len >= $MinAvgTokLen AND avg_token_len <= $MaxAvgTokLen
      |   AND stop_ratio >= $MinStopRatio AND distinct_ratio >= $MinDistinctRatio) AS keep
      |FROM f""".stripMargin

  // ---- token counting ------------------------------------------------------

  /** Whitespace tokens, BPE-ish regex tokens ([a-z]+ | digits | other
    * non-space char), and raw char length per document. */
  def textTokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_ws"),
        // Java \s here; the oracle twin spells the class out (RE2 \s
        // lacks \x0B) so both engines count the same "other" chars
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
          .cast("long").as("n_bpe"),
        length(col("text")).cast("long").as("n_chars"))

  val textTokenCountSql: String =
    s"""SELECT doc_id,
      |  CAST(len($TokSql) AS BIGINT) AS n_ws,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9${Text.WsChars}]')) AS BIGINT) AS n_bpe,
      |  CAST(length(text) AS BIGINT) AS n_chars
      |FROM documents""".stripMargin

  // ---- top terms per language ----------------------------------------------

  /** Top-5 terms per lang by frequency (word-asc tiebreak): explode +
    * two-level aggregation + ranking window. */
  def textTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      // explode_outer: avoids the inferred size()>0 scan filter that
      // would tokenize each document twice (see WordCount.counts)
      .select(col("lang"), explode_outer(Text.tokens(col("text"))).as("word"))
      .filter(col("word").isNotNull)
      .groupBy("lang", "word")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("word").asc)
    counts.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
  }

  val textTopTermsSql: String =
    s"""WITH tok AS (SELECT lang, unnest($TokSql) AS word FROM documents),
      |c AS (SELECT lang, word, count(*) AS cnt FROM tok GROUP BY 1, 2),
      |r AS (SELECT lang, word, cnt,
      |  CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, word ASC) AS BIGINT) AS rk
      |FROM c)
      |SELECT lang, word, cnt, rk FROM r WHERE rk <= 5""".stripMargin

  /** Per-language top-5 BIGRAMS — the n>1 companion to textTopTerms,
    * the feature a langid/fluency model actually wants. Adjacent pairs
    * come from `zip_with(w[0..n-2], w[1..n-1])` inside the scan.
    * Plan-shape note: the token array is referenced three times in the
    * projection (size + two slices) and CollapseProject re-inlines the
    * tokenizer into each use — deliberate here: at scale, re-running a
    * scan-local expression beats the alternatives, which are an
    * exchange barrier (shuffling the full token stream dwarfs 3× scan
    * CPU) or a per-doc window sort. The empty/1-token guard
    * (`greatest(n-1, 0)`) keeps slice lengths legal; the oracle guards
    * the same case because DuckDB's `w[1:len-1]` turns NEGATIVE on
    * empty lists (counts from the end) rather than empty. */
  def textBigrams(spark: SparkSession, dir: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    val n = size(toks)
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    val counts = Tables.documents(spark, dir)
      .select(col("lang"), explode_outer(bigrams).as("bg"))
      .filter(col("bg").isNotNull)
      .groupBy("lang", "bg")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("bg").asc)
    counts.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
  }

  val textBigramsSql: String =
    s"""WITH d AS (SELECT lang, $TokSql AS w FROM documents),
      |b AS (SELECT lang,
      |  unnest(CASE WHEN len(w) >= 2
      |    THEN list_transform(list_zip(w[1:len(w)-1], w[2:len(w)]),
      |                        p -> p[1] || ' ' || p[2])
      |    ELSE [] END) AS bg
      |  FROM d),
      |c AS (SELECT lang, bg, count(*) AS cnt FROM b GROUP BY 1, 2),
      |r AS (SELECT lang, bg, cnt,
      |  CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bg ASC) AS BIGINT) AS rk
      |FROM c)
      |SELECT lang, bg, cnt, rk FROM r WHERE rk <= 5""".stripMargin

  /** STATISTICAL LM QUALITY SCORE — per-document average bigram
    * log-probability under an add-one-smoothed model fit on the corpus
    * itself: the KenLM-style perplexity proxy that separates fluent
    * text from gibberish without an external model. Two aggregations
    * build the model — bigram-type counts c₁₂ and their first-word
    * marginals c₁ (derived FROM c₁₂, so the conditional is consistent
    * by construction) — plus a 1-row vocabulary count, broadcast. Each
    * bigram TYPE's ln((c₁₂+1)/(c₁+V)) is computed once, pinned to the
    * decimal domain (the tfidf ln-ulp discipline), and joined back to
    * the per-doc bigram instances; the per-doc score is then an exact
    * decimal sum divided by the bigram count — order-independent. Pair
    * extraction is the zip-of-slices projection (no shuffle, no
    * window); scoring shuffles bigram instances once on the pair key. */
  def textLmScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    val n = size(toks)
    val pairs = arrays_zip(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))))
    val docPairs = Tables.documents(spark, dir)
      // explode_outer + isNotNull: plain explode gets an inferred
      // size()>0 filter that recomputes the whole zip-of-slices (and
      // the tokenizer under it) per row
      .select(col("doc_id"), explode_outer(pairs).as("p"))
      .filter(col("p").isNotNull)
      .select(col("doc_id"),
        col("p").getField("0").as("w1"), col("p").getField("1").as("w2"))
    // Vocabulary derived from the TYPE table (r21, guide §2.3): c12
    // holds every distinct (w1, w2) by construction, so countDistinct
    // (w2) over c12 ≡ countDistinct(w2) over the instances — same value,
    // but the old form re-ran the whole tokenize+zip+explode corpus pass
    // just to count the vocabulary (3 passes; now 2). A full
    // per-(doc, bigram) pre-aggregation was TRIED and REVERTED here
    // (r21): on this corpus bigram types per doc ≈ instances (bounded
    // vocab), so the (doc_id, w1, w2) exchange it needs costs more than
    // the tokenize pass it saves — measured 2.4 s vs the 1.16 s band,
    // while this form measures at/below band. The instance-side joins
    // below exchange almost nothing (lp broadcasts; the final per-doc
    // agg partially aggregates map-side).
    val c12 = docPairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val vocab = c12.agg(countDistinct(col("w2")).as("v"))
    val lp = c12.join(c1, "w1").crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        log((col("c12") + 1).cast("double") / (col("c1") + col("v")).cast("double"))
          .cast("decimal(18,6)").as("lp"))
    docPairs.join(lp, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("lp")).cast("double") / count(lit(1)).cast("double")).as("avg_lp"))
  }

  val textLmScoreSql: String =
    s"""WITH tok AS (SELECT doc_id, $TokSql AS w FROM documents),
      |dp AS (
      |  SELECT doc_id, p[1] AS w1, p[2] AS w2
      |  FROM (SELECT doc_id,
      |          unnest(CASE WHEN len(w) >= 2
      |                      THEN list_zip(w[1:len(w)-1], w[2:len(w)])
      |                      ELSE [] END) AS p
      |        FROM tok)),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM dp GROUP BY 1, 2),
      |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
      |v AS (SELECT count(DISTINCT w2) AS v FROM dp),
      |lp AS (
      |  SELECT c12.w1, c12.w2,
      |    CAST(ln(CAST(c12.c12 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE))
      |         AS DECIMAL(18,6)) AS lp
      |  FROM c12 JOIN c1 ON c12.w1 = c1.w1 CROSS JOIN v)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(lp) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_lp
      |FROM dp JOIN lp ON dp.w1 = lp.w1 AND dp.w2 = lp.w2
      |GROUP BY doc_id""".stripMargin

  // ---- approximate heavy hitters ---------------------------------------------

  /** Approximate HEAVY HITTERS over the token stream — single-pass
    * frequent items (Misra–Gries counters, ⌈1/support⌉ of them) via
    * `stat.freqItems`. The exact top-terms query ([[textTopTerms]])
    * shuffles one row per DISTINCT token; at 100 TB that exchange is the
    * whole job, while the sketch keeps a constant ~100-counter summary
    * per partition and merges summaries pairwise — no token ever
    * shuffles. The contract is one-sided: NO FALSE NEGATIVES (every
    * token with frequency > support·N survives) but rare false
    * positives are allowed, which is exactly what vocab/stopword mining
    * wants as a first pass (an exact count of ~100 candidates is then
    * cheap). Counter eviction depends on partition merge order, so the
    * candidate set is not run-deterministic → rows-only gate;
    * [[HeavyHittersSpec]] pins the guarantee against exact counts.
    */
  def textHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode_outer(Text.tokens(col("text"))).as("word"))
      .filter(col("word").isNotNull)
      .stat.freqItems(Seq("word"), 0.01)
      .select(explode(col("word_freqItems")).as("word"))
      .orderBy("word")

  // ---- array function battery ------------------------------------------------

  /** Array primitives over token arrays: sort, distinct, slice, flatten,
    * element-wise transform + array_max. Scalar outputs only (arrays are
    * stringified) so the hash-compare stays engine-neutral. Two NULL/empty
    * guards keep the oracle parity off the fixture's happy path:
    * `try_element_at` (plain `element_at` THROWS under Spark 4's default
    * ANSI mode on a zero-token document, where the oracle's `w[1]` is
    * NULL), and `first3` is NULL on a NULL *or empty* token array —
    * Spark's `concat_ws` skips null inputs and joins [] to '', but
    * DuckDB's `array_to_string` is NULL for BOTH (probed live;
    * tools/edge_oracle_probe.py re-checks), so the engine gates on
    * `size(w) > 0` to match. */
  def textArrayFns(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("w"))
      .select(
        col("doc_id"),
        when(size(col("w")) > 0,
          concat_ws(" ", slice(array_sort(array_distinct(col("w"))), 1, 3))).as("first3"),
        array_max(transform(col("w"), t => length(t))).cast("long").as("max_tok_len"),
        size(flatten(array(col("w"), col("w")))).cast("long").as("n_doubled"),
        try_element_at(col("w"), lit(1)).as("first_tok"))

  val textArrayFnsSql: String =
    s"""WITH tok AS (SELECT doc_id, $TokSql AS w FROM documents)
      |SELECT doc_id,
      |  array_to_string(list_sort(list_distinct(w))[1:3], ' ') AS first3,
      |  CAST(list_max(list_transform(w, t -> length(t))) AS BIGINT) AS max_tok_len,
      |  CASE WHEN w IS NULL THEN NULL  -- DuckDB flatten DROPS null sublists ([]→0); Spark propagates NULL
      |       ELSE CAST(len(flatten([w, w])) AS BIGINT) END AS n_doubled,
      |  w[1] AS first_tok
      |FROM tok""".stripMargin

  /** Top-3 TF-IDF terms per document — the classic distinctive-term
    * extractor. Term frequency and document frequency are two
    * aggregations over the exploded tokens (each with map-side partial
    * agg; they group by different keys, so two scans beat forcing one
    * through a foreign exchange), joined on the word, idf from a
    * broadcast one-row doc count. The score is rounded in the DECIMAL
    * domain (6 dp) on BOTH engines and the per-doc ranking orders by
    * that rounded value — `ln` is the one transcendental in the engine,
    * and JVM Math.log vs libm may differ in the last ulp. The rounding
    * cannot fully ELIMINATE that dependence (a product landing within
    * ~1 ulp of a 6-dp half boundary could still round apart — a
    * ~1e-10-per-value coincidence, none of which occur at any shipped
    * SF; exact-transcendental parity is unattainable without a rational
    * log), but it shrinks the exposure from every bit of every score to
    * that boundary sliver. Rank ≤ 3 plans through Spark's
    * WindowGroupLimit (bounded per-partition top-k, no full window
    * sort).
    */
  def textTfidf(spark: SparkSession, dir: String): DataFrame =
    // countDistinct form SHIPPED — the r21 df-from-tf derivation is
    // REVERTED on measurement (r22 A/B, 3 steady passes per arm
    // interleaved in one JVM): countDistinct 0.80/0.85/0.98 s vs
    // df-from-tf 0.94/1.02/1.12 at sf0.1, and 4.11/4.18/4.66 vs
    // 4.23/4.51/5.05 at sf1 — the old form's second tokenize pass runs
    // as an INDEPENDENT parallel branch (scan + one exchange), while
    // df-from-tf serializes the df branch behind tf's exchange (read
    // the whole tf shuffle output, re-shuffle by word) on the critical
    // path. Reproduced at 10× scale growth, so not a small-SF artifact.
    // OPTIMIZATION_r22.md §2.
    textTfidfForm(spark, dir, dfFromTf = false)

  /** Both df derivations, for the r22 receipt-or-revert A/B (ProbeR22a;
    * VERDICT r21 flagged the df-from-tf form as the one touched query
    * the driver measured slower, with no isolated receipt). `dfFromTf =
    * true` is the r21 one-tokenize-pass form; `false` is the pre-r21
    * countDistinct-over-tokens second corpus pass — the measured winner
    * at BOTH sf0.1 and sf1 (see [[textTfidf]]). */
  private[graft] def textTfidfForm(
      spark: SparkSession, dir: String, dfFromTf: Boolean): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs
      .select(col("doc_id"), explode_outer(Text.tokens(col("text"))).as("word"))
      .filter(col("word").isNotNull)
    val tf = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    // df DERIVED FROM tf (r21, guide §2.3 "aggregate before you shuffle"):
    // tf's keys are exactly the distinct (doc_id, word) pairs, so
    // count(*) per word over tf ≡ countDistinct(doc_id) over the exploded
    // tokens — same value by construction, but the old form re-ran the
    // whole tokenize+explode scan for the df aggregation (two corpus
    // passes); this form re-reads tf's exchange (runtime exchange reuse)
    // and shuffles one row per (doc, word) instead of one per token.
    val dfreq =
      if (dfFromTf) tf.groupBy("word").agg(count(lit(1)).as("df"))
      else toks.groupBy("word").agg(countDistinct(col("doc_id")).as("df"))
    val ndocs = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, "word")
      .crossJoin(broadcast(ndocs))
      .select(col("doc_id"), col("word"), col("tf"),
        (col("tf").cast("double") *
          log(col("n").cast("double") / col("df").cast("double")))
          .cast("decimal(18,6)").cast("double").as("tfidf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("word").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("doc_id"), col("word"), col("tf"), col("tfidf"))
  }

  val textTfidfSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest($TokSql) AS word FROM documents),
      |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |s AS (SELECT doc_id, tf.word AS word, tf.tf AS tf,
      |        CAST(CAST(CAST(tf.tf AS DOUBLE)
      |          * ln(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE) AS tfidf
      |      FROM tf JOIN df ON tf.word = df.word CROSS JOIN n),
      |r AS (SELECT doc_id, word, tf, tfidf,
      |        row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word ASC) AS rn
      |      FROM s)
      |SELECT doc_id, word, tf, tfidf FROM r WHERE rn <= 3""".stripMargin

  // ---- fingerprinting --------------------------------------------------------

  /** Order-insensitive document fingerprint: md5 over the sorted distinct
    * token set (a set-similarity-stable content signature). NULL text and
    * ZERO-TOKEN documents fingerprint as NULL, not as md5('') — Spark's
    * `concat_ws` skips null inputs and joins [] to '', but DuckDB's
    * `array_to_string` is NULL for both (probed live;
    * tools/edge_oracle_probe.py re-checks), and a contentless document
    * colliding on the md5('') constant would be wrong for dedup anyway. */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        when(size(col("w")) > 0,
          md5(concat_ws(" ", array_sort(array_distinct(col("w"))))))
          .as("fingerprint"))

  val textFingerprintSql: String =
    s"""SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct($TokSql)), ' ')) AS fingerprint
      |FROM documents""".stripMargin

  // ---- registry --------------------------------------------------------------

  /** Deterministic train/val/test split — the assignment step every
    * training corpus needs before anything touches it. The split key is
    * `md5(doc_id)` compared LEXICOGRAPHICALLY against hex-prefix
    * thresholds: md5 hex is uniform, so `< "cc"` ≈ 204/256 ≈ 79.7%
    * train, `< "e6"` ≈ 10.2% val, rest test. Properties that matter at
    * 100 TB: stateless and shuffle-free (a pure projection — each
    * executor assigns its rows with no coordination), stable across
    * reruns/engines (no RNG, no partition-order dependence — the same
    * doc lands in the same split forever, which is what keeps eval sets
    * uncontaminated as the corpus grows), and exact-oracle-checkable
    * since both engines agree on md5 hex and ASCII comparison.
    */
  def docSampleSplit(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(col("doc_id").cast("string"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        when(h < "cc", "train").when(h < "e6", "val").otherwise("test").as("split"))
  }

  val docSampleSplitSql: String =
    """SELECT doc_id, source,
      |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cc' THEN 'train'
      |       WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents""".stripMargin

  /** Stratified (per-language) downsampling — the corpus-rebalancing
    * step of a training pipeline: the dominant language is thinned hard
    * (en → 25%), mid-resource languages moderately (75%), and the
    * lowest-resource one kept whole (zh threshold "g" sorts above every
    * hex digit, so no md5 ever exceeds it). Same deterministic
    * hash-threshold machinery as [[docSampleSplit]] — stateless,
    * shuffle-free, stable across reruns — but the key is SALTED
    * (`doc_id || ":strat"`): reusing the split hash would correlate the
    * two decisions and systematically bias which split the sampled
    * corpus draws from. Exact-oracle-checkable because md5 hex and ASCII
    * string comparison agree across engines.
    */
  def docSampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(col("doc_id").cast("string"), lit(":strat")))
    val threshold = when(col("lang") === "en", "40")
      .when(col("lang") === "zh", "g")
      .otherwise("c0")
    Tables.documents(spark, dir)
      .filter(h < threshold)
      .select(col("doc_id"), col("lang"), col("source"))
  }

  val docSampleStratifiedSql: String =
    """SELECT doc_id, lang, source FROM documents
      |WHERE md5(CAST(doc_id AS VARCHAR) || ':strat') <
      |  CASE WHEN lang = 'en' THEN '40'
      |       WHEN lang = 'zh' THEN 'g'
      |       ELSE 'c0' END""".stripMargin

  /** Blocklist scrubbing: redact every whole-word hit of an entity
    * blocklist to an `<ENT>` sentinel and count the redactions — one
    * codegen'd projection, the decontamination-pass shape (strip PII /
    * eval-benchmark markers before training; this corpus has no digit
    * runs, so the demonstration pattern is a term blocklist rather than
    * the equally-shaped `[0-9]+`). The regex stays in the Java∩RE2
    * common subset — alternation + ASCII `\b` word boundaries, no
    * backrefs or lookaround — so engine and oracle replace identical
    * spans ("customers" is not a hit); the oracle needs DuckDB's
    * explicit `'g'` flag since its regexp_replace is first-match-only
    * by default, while Spark's is always global. Redaction count via
    * regexp_count, cast to BIGINT (the longs-only schema contract).
    */
  val RedactPattern = "\\b(customer|supplier|spark)\\b"

  def textRedact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_replace(col("text"), RedactPattern, "<ENT>").as("redacted"),
        regexp_count(col("text"), lit(RedactPattern)).cast("long").as("n_redacted"))

  val textRedactSql: String =
    """SELECT doc_id,
      |  regexp_replace(text, '\b(customer|supplier|spark)\b', '<ENT>', 'g') AS redacted,
      |  len(regexp_extract_all(text, '\b(customer|supplier|spark)\b')) AS n_redacted
      |FROM documents""".stripMargin

  /** Repetition threshold: flag when the most frequent bigram accounts
    * for ≥ 1/5 of all bigram occurrences in the document. */
  val RepetitionDen = 5L

  /** Intra-document REPETITION profiling — the boilerplate/degenerate-
    * text detector of a quality pipeline (nav-bar spam, keyword stuffing,
    * generation loops all show up as a few n-grams dominating the
    * document). Per doc: total bigram occurrences, distinct bigrams, the
    * top bigram's count, and a flag when that top count is ≥ 1/5 of the
    * total. Plan shape: explode keeps each doc's bigrams in the doc's
    * input partition, so the (doc_id, bigram) partial aggregate collapses
    * every duplicate MAP-SIDE — the exchange carries one row per distinct
    * bigram (the theoretical minimum for a distributed distinct-count),
    * and the second agg is partial too. All-integer output (counts and a
    * cross-multiplied flag), so the row is hash-exact cross-engine.
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // explode_outer: avoids the inferred size()>0 scan filter that
      // would re-evaluate tokenize+shingle per row (see textBigrams)
      .select(col("doc_id"),
        explode_outer(Text.shingles(Text.tokens(col("text")), 2)).as("bg"))
      .filter(col("bg").isNotNull)
      .groupBy("doc_id", "bg")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max(col("c")).as("top_count"))
      .withColumn("repetitive",
        col("top_count") * lit(RepetitionDen) >= col("n_bigrams"))

  val textRepetitionSql: String =
    s"""WITH tok AS (
      |  SELECT doc_id, ${Text.TokensOracleSql} AS w FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS b
      |  FROM tok WHERE len(w) >= 2),
      |c AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2)
      |SELECT doc_id,
      |  CAST(sum(c) AS BIGINT) AS n_bigrams,
      |  count(*) AS n_distinct_bigrams,
      |  max(c) AS top_count,
      |  max(c) * $RepetitionDen >= sum(c) AS repetitive
      |FROM c GROUP BY doc_id""".stripMargin

  /** Contiguous stable document IDs 0..n−1 in doc_id order — the
    * renumbering step a training pipeline runs after filtering/dedup so
    * shard offsets and sample indices stay dense. The naive formulation,
    * `row_number()` over a GLOBAL `Window.orderBy`, collapses the whole
    * relation into ONE partition — the canonical single-partition window
    * scale-killer. The distributed design: a range-partitioned
    * partition-local sort (Spark's ordinary 2-phase distributed sort —
    * sampled boundaries, no global funnel), then `zipWithIndex`, which
    * runs one lightweight count-per-partition job and assigns each
    * partition a starting offset, so every executor numbers its rows
    * independently. That is the partition-offset pattern; the RDD hop is
    * the documented last-resort rung, earned here because no Catalyst
    * operator exposes partition offsets (`monotonically_increasing_id`
    * is non-contiguous by design). Cost at 100 TB: one range shuffle of
    * the (narrow) id column + one count job — vs the naive plan's
    * everything-through-one-task.
    */
  def docStableIds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // explicit partition count (vs letting AQE pick): a user-specified
    // repartition is not AQE-coalesced, so the numbering provably runs
    // over multiple partitions even on tiny inputs — which is what makes
    // the partition-offset composition testable; the count itself is the
    // session's shuffle-partition knob, the same dial every other
    // exchange obeys
    val parts = spark.sessionState.conf.numShufflePartitions
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .rdd.map(_.getLong(0))
      .zipWithIndex()
      .toDF("doc_id", "stable_id")
  }

  val docStableIdsSql: String =
    """SELECT doc_id,
      |  CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS stable_id
      |FROM documents""".stripMargin

  /** Token budget per packed shard. */
  val PackBudget = 4096L

  /** Sequence packing: assign documents (in stable doc_id order) to
    * fixed-token-budget shards — the pre-tokenization packing step of a
    * training pipeline (fill each 4096-token shard with consecutive
    * docs; a doc belongs to the shard its START offset falls in, so a
    * straddling doc stays with the shard it began — shards may run over
    * the budget by up to that doc's tail, and the next shard opens at
    * the first doc starting past the boundary; trainer buffers must
    * size to budget + max-doc-tokens, not budget). The
    * shard id is `floor(exclusive-prefix-sum(n_tokens) / budget)` — a
    * GLOBAL running total, which as a `sum over (ORDER BY …)` window is
    * the same single-partition scale-killer [[docStableIds]] documents.
    * The distributed design is a two-phase prefix sum over ONE shuffle:
    * range-partition + locally sort by doc_id, take `.rdd` ONCE (both
    * jobs below then share the same shuffle output — the sampled range
    * boundaries are fixed in that plan instance, so the jobs see
    * identical partitioning), phase 1 collects one partial sum PER
    * PARTITION (bounded: ≤ numShufflePartitions rows), phase 2
    * broadcasts the exclusive partition offsets and each task computes
    * its local running total on top of its offset. Cost at 100 TB: one
    * narrow shuffle + one tiny count-style job — every task works
    * independently in both phases.
    */
  def docPackShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = spark.sessionState.conf.numShufflePartitions
    val base = Tables.documents(spark, dir)
      // coalesce: size(tokens(NULL)) is NULL (not -1 — legacy sizeOfNull
      // is off), and the typed prefix-sum below reads n_tokens with
      // getLong — a NULL-body doc packs as zero tokens on both engines
      .select(col("doc_id"),
        coalesce(size(Text.tokens(col("text"))), lit(0)).cast("long").as("n_tokens"))
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val perPart = base
      .mapPartitionsWithIndex { (i, it) =>
        Iterator.single(i -> it.map(_._2).sum)
      }
      .collect().sortBy(_._1).map(_._2) // bounded: one row per partition
    val offsets = perPart.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    base.mapPartitionsWithIndex { (i, it) =>
        var cum = bc.value(i)
        it.map { case (id, n) =>
          val before = cum; cum += n
          (id, n, before / PackBudget)
        }
      }
      .toDF("doc_id", "n_tokens", "shard")
  }

  val docPackShardsSql: String =
    s"""WITH tok AS (
      |  SELECT doc_id, CAST(coalesce(len($TokSql), 0) AS BIGINT) AS n_tokens
      |  FROM documents)
      |SELECT doc_id, n_tokens,
      |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // $PackBudget AS BIGINT) AS shard
      |FROM tok""".stripMargin

  /** Shard count for the training-epoch shuffle (one hex digit of the
    * md5 order key — 16 shards keeps the oracle's hex→int mapping a
    * one-char strpos in both engines). */
  val ShuffleShards = 16

  /** Deterministic training-epoch SHUFFLE, materialized: every epoch a
    * training run wants the corpus in a fresh pseudo-random order,
    * reproducible across re-runs and resumable mid-epoch. Order key =
    * md5(doc_id ‖ ":e0") (the epoch salt makes epoch 1 a different
    * permutation: ":e1"); shard = first hex digit of the key (uniform
    * 16-way), global read order = (shard, sort_key). The operator WRITES
    * the corpus as one sorted file per shard (a trainer streams shard
    * files sequentially — no runtime shuffle buffer needed) and returns
    * the per-shard manifest; ShuffleShardsSpec pins the physical
    * contract (file-per-shard, rows sorted).
    *
    * Scale shape: assignment is a stateless per-row projection (no
    * window, no global sort — a per-shard dense position would be a
    * per-shard single-task scan; the sort KEY itself carries the order,
    * so no task ever numbers rows sequentially). One hash exchange on
    * shard co-locates each shard into one task; sortWithinPartitions is
    * a local spillable sort. At 100 TB you'd raise the digit count
    * (256/4096 shards) — the same one-knob resize as shuffle partitions.
    */
  /** The write-side frame of [[docShuffleShards]] (shard assignment →
    * one exchange → local sort), exposed so PlanDump can audit the plan
    * that actually moves the data — the query entry returns only the
    * post-write manifest. */
  private[graft] def docShuffleAssigned(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // the PAYLOAD rides the shuffle: a trainer reads documents, not
      // ids — this is the honest cost of the epoch shuffle at 100 TB
      .select(col("doc_id"), col("text"),
        md5(concat(col("doc_id").cast("string"), lit(":e0"))).as("sort_key"))
      .withColumn("shard",
        expr("CAST(instr('0123456789abcdef', substr(sort_key, 1, 1)) AS INT) - 1"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "sort_key")

  def docShuffleShards(spark: SparkSession, dir: String): DataFrame = {
    val dest = graft.sources.Formats.tmp("doc_shuffle", dir)
    val assigned = docShuffleAssigned(spark, dir)
    assigned.write.mode("overwrite").partitionBy("shard").parquet(dest)
    // writer-side schema: an empty corpus writes no shard dirs and no
    // footers — inference would abort; the explicit schema also pins
    // shard to INT at the source instead of the narrowest inferred type
    spark.read.schema(assigned.schema).parquet(dest)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        min("sort_key").as("first_key"),
        max("sort_key").as("last_key"))
      // partition-directory values read back as the narrowest inferred
      // type; pin INT so the schema can't drift from the oracle's
      .select(col("shard").cast("int").as("shard"),
        col("n_docs"), col("first_key"), col("last_key"))
  }

  val docShuffleShardsSql: String =
    """WITH k AS (
      |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':e0') AS sort_key
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, sort_key,
      |    CAST(strpos('0123456789abcdef', substr(sort_key, 1, 1)) - 1 AS INT) AS shard
      |  FROM k)
      |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |  min(sort_key) AS first_key, max(sort_key) AS last_key
      |FROM s GROUP BY shard""".stripMargin

  /** End-to-end curation pipeline — the composition deliverable: the
    * [[textQualityFilter]] gate, an English-only language filter (the
    * [[textLangid]] decision rule restricted to its 'en' branch), and
    * exact content dedup among the survivors (first occurrence by
    * doc_id, as [[dedupExact]]), collapsed to the final per-source
    * corpus statistics (docs kept, total tokens). Each stage reuses the
    * exact expressions of its standalone query, so this is the proof
    * that the stages COMPOSE — what a user actually runs over a crawl.
    *
    * Scale shape: the whole gate (quality features + language votes +
    * content hash) is ONE codegen'd scan — per-row expressions, no
    * joins, no exchange before the filter. The features are wrapped in
    * `explode_outer(array(struct(…)))`: the Generate is a pushdown
    * BARRIER — without it, PushPredicateThroughProject substitutes the
    * feature definitions into the gate predicate and sinks it to the
    * scan, re-inlining `graft_tokens(text)` 14× per row (FilterExec
    * does not do common-subexpression elimination across short-circuit
    * conjuncts; the Project feeding a Generate does). Documents that
    * fail drop right above the scan; survivors enter the dedup shuffle
    * as (hash, source, n_tokens) — bodies never leave the scan stage.
    * Winner-per-hash is min(struct(doc_id, …)): partially aggregable,
    * so map-side combine collapses most duplicates before the wire
    * (struct buffers aren't UnsafeRow-mutable, so it plans as partial
    * SortAggregate over a local spillable sort — here the grouping key
    * is the content hash, so unlike maint_profile's empty-key fold the
    * sort is real, local, and spill-bounded); the per-source rollup is
    * a second tiny exchange at source cardinality.
    */
  def curationE2e(spark: SparkSession, dir: String): DataFrame = {
    CountIn.register(spark)
    val gated = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        md5(Text.normalize(col("text"))).as("content_hash"),
        Text.tokens(col("text")).as("w"))
      .select(col("doc_id"), col("source"), col("content_hash"),
        explode_outer(array(struct(
          featNTokens(col("w")).as("n_tokens"),
          featAvgTokLen(col("w")).as("avg_token_len"),
          featDistinctRatio(col("w")).as("distinct_ratio"),
          hits(col("w"), StopEn).as("en_hits"), hits(col("w"), StopEs).as("es_hits"),
          hits(col("w"), StopDe).as("de_hits"), hits(col("w"), StopFr).as("fr_hits"))))
          .as("f"))
      .filter(
        col("f.n_tokens") >= MinTokens &&
        col("f.avg_token_len") >= MinAvgTokLen && col("f.avg_token_len") <= MaxAvgTokLen &&
        (col("f.en_hits").cast("double") / col("f.n_tokens").cast("double")) >= MinStopRatio &&
        col("f.distinct_ratio") >= MinDistinctRatio &&
        // textLangid's 'en' branch: any votes at all, en wins precedence
        (col("f.en_hits") + col("f.es_hits") + col("f.de_hits") + col("f.fr_hits")) > 0 &&
        col("f.en_hits") >= col("f.es_hits") && col("f.en_hits") >= col("f.de_hits") &&
        col("f.en_hits") >= col("f.fr_hits"))
      .select(col("doc_id"), col("source"), col("content_hash"),
        col("f.n_tokens").as("n_tokens"))
    gated
      .groupBy("content_hash")
      // min over struct orders by field position; doc_id first makes it
      // the unique winner — and the agg partially combines map-side
      .agg(min(struct(col("doc_id"), col("source"), col("n_tokens"))).as("win"))
      .groupBy(col("win.source").as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("win.n_tokens")).as("total_tokens"))
  }

  val curationE2eSql: String =
    s"""WITH tok AS (
      |  SELECT doc_id, source,
      |    ${Dedup.ContentHashSql} AS content_hash,
      |    $TokSql AS w
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, source, content_hash,
      |    CAST(len(w) AS BIGINT) AS n_tokens,
      |    CAST(CAST(list_sum(list_transform(w, t -> length(t))) AS BIGINT) AS DOUBLE)
      |      / CAST(len(w) AS DOUBLE) AS avg_token_len,
      |    CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS distinct_ratio,
      |    CAST(len(list_filter(w, t -> list_contains($StopEnSql, t))) AS BIGINT) AS en_hits,
      |    CAST(len(list_filter(w, t -> list_contains($StopEsSql, t))) AS BIGINT) AS es_hits,
      |    CAST(len(list_filter(w, t -> list_contains($StopDeSql, t))) AS BIGINT) AS de_hits,
      |    CAST(len(list_filter(w, t -> list_contains($StopFrSql, t))) AS BIGINT) AS fr_hits
      |  FROM tok),
      |gated AS (
      |  SELECT * FROM f
      |  WHERE n_tokens >= $MinTokens
      |    AND avg_token_len >= $MinAvgTokLen AND avg_token_len <= $MaxAvgTokLen
      |    AND CAST(en_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= $MinStopRatio
      |    AND distinct_ratio >= $MinDistinctRatio
      |    AND en_hits + es_hits + de_hits + fr_hits > 0
      |    AND en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits),
      |ded AS (
      |  SELECT content_hash,
      |    min_by(source, doc_id) AS source, min_by(n_tokens, doc_id) AS n_tokens
      |  FROM gated GROUP BY 1)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      |FROM ded GROUP BY source""".stripMargin

  /** BM25 parameters — Robertson/Sparck Jones defaults; idf is the
    * Lucene `ln(1 + (N−df+0.5)/(df+0.5))` form, positive for any df. */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25Terms: Seq[String] = Seq("hash", "join", "vector")

  /** BM25 relevance of every matching document against a fixed query
    * term set — the retrieval-scoring shape (data curation by relevance,
    * RAG corpus ranking). Plan (r21): ONE tokenize pass — per-doc facts
    * (length via size(), per-term tf via the codegen'd count_in) are a
    * pure projection over the token array, materialized behind a tiny
    * (doc_id, dl, tf×3) exchange; corpus stats (n, per-term df, avgdl)
    * are global aggregates over that exchange, broadcast back. Nothing
    * token-shaped ever shuffles — the 100 TB form of "shuffle keys and
    * metadata instead of payloads". Like [[textTfidf]], the
    * one transcendental (`ln` in idf) is fenced by rounding the final
    * score in the DECIMAL domain (6 dp) on both engines; the ratio
    * arithmetic before it is identical-operand double math, bit-equal
    * across engines. Returns every doc containing ≥1 query term —
    * no rank cutoff, so no boundary-tie exposure at all.
    */
  def textBm25(spark: SparkSession, dir: String): DataFrame = {
    CountIn.register(spark)
    val docs = Tables.documents(spark, dir)
    // ONE tokenize pass (r21, guide §2.3/§8 "decide with small rows"): the
    // old shape fed the exploded token stream into THREE aggregations
    // (per-doc length, per-(doc,term) tf, per-term df), each a separate
    // tokenize+explode corpus scan. The per-doc facts are computable as a
    // pure projection over the token array — size() for dl, one codegen'd
    // count_in per query term for tf — so the corpus is tokenized ONCE and
    // everything downstream reads a (doc_id, dl, tf×3) row of five
    // numbers behind one lightweight exchange (the repartition barrier is
    // the same re-inlining defence as Dedup.shingleSets: without it every
    // consumer re-inlines the tokenizer into its own scan).
    //
    // Equivalence to the exploded form, operand by operand (the score
    // expression below is untouched): per-doc groupBy collapses duplicate
    // doc_id rows exactly like the old toks.groupBy did; dl = sum of
    // per-row token counts = count of exploded tokens; tf_t = sum of
    // per-row occurrence counts = count of exploded word=t rows; a doc
    // with NULL text has NULL counts (sum skips them — the old form had
    // no rows for it); df_t = #agg-rows with tf_t > 0 = countDistinct
    // (doc_id) over matched rows; avgdl's numerator/denominator restrict
    // to dl > 0, the exact membership of the old per-doc-length table.
    val perDoc = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).as("dl0"),
        call_function("count_in", col("w"), typedlit(Seq(Bm25Terms(0)))).as("tf0"),
        call_function("count_in", col("w"), typedlit(Seq(Bm25Terms(1)))).as("tf1"),
        call_function("count_in", col("w"), typedlit(Seq(Bm25Terms(2)))).as("tf2"))
      .repartition(col("doc_id"))
    val agg = perDoc.groupBy("doc_id").agg(
      sum(col("dl0")).as("dl"), sum(col("tf0")).as("tfa"),
      sum(col("tf1")).as("tfb"), sum(col("tf2")).as("tfc"),
      count(lit(1)).as("nr"))
    // ONE global stats row over the SAME agg branch: n = Σ per-doc row
    // counts = count(*) over documents; df_t = #docs with tf_t > 0 =
    // countDistinct(doc_id) over matched tokens; avgdl restricted to
    // dl > 0 — the old per-doc-length table's exact membership. Folding
    // everything into one aggregate matters for plan reuse: BOTH
    // consumers of `agg` then need the identical (doc_id, dl0, tf0..2)
    // columns below the exchange (nr/count needs none), so the two
    // exchange subtrees canonicalize equal and runtime exchange reuse
    // leaves ONE tokenize pass (pinned by R21PlanOptimizationsSpec).
    val stats = agg.agg(
      sum(col("nr")).as("n"),
      (dsum(when(col("dl") > 0, col("dl"))).cast("double")
        / count(when(col("dl") > 0, lit(1)))).as("avgdl"),
      count(when(col("tfa") > 0, lit(1))).as("dfa"),
      count(when(col("tfb") > 0, lit(1))).as("dfb"),
      count(when(col("tfc") > 0, lit(1))).as("dfc"))
    // per-term score, identical operand expressions to the pre-r21
    // exploded form; NULL (absent term) when tf is 0 or NULL
    def score(tf: Column, df: Column): Column =
      when(tf > 0,
        (log(lit(1.0) + (col("n").cast("double") - df.cast("double") + lit(0.5))
            / (df.cast("double") + lit(0.5)))
          * (tf.cast("double") * lit(Bm25K1 + 1.0))
          / (tf.cast("double")
            + lit(Bm25K1) * (lit(1.0 - Bm25B)
              + lit(Bm25B) * col("dl").cast("double") / col("avgdl"))))
          .cast("decimal(18,6)"))
    // each per-term score is rounded to DECIMAL(18,6) BEFORE the sum, so
    // the final addition is exact decimal arithmetic — order-independent,
    // immune to FP summation-order divergence between engines (the same
    // value the old per-row sum() aggregate produced, with no explode
    // and no second exchange)
    val zero = lit(0).cast("decimal(18,6)")
    agg.crossJoin(broadcast(stats))
      .select(col("doc_id"),
        score(col("tfa"), col("dfa")).as("sa"),
        score(col("tfb"), col("dfb")).as("sb"),
        score(col("tfc"), col("dfc")).as("sc"))
      .select(col("doc_id"),
        (coalesce(col("sa"), zero) + coalesce(col("sb"), zero)
          + coalesce(col("sc"), zero)).cast("double").as("bm25"),
        (when(col("sa").isNotNull, 1L).otherwise(0L)
          + when(col("sb").isNotNull, 1L).otherwise(0L)
          + when(col("sc").isNotNull, 1L).otherwise(0L)).as("n_terms"))
      .filter(col("n_terms") > 0)
  }

  val textBm25Sql: String =
    s"""WITH tok AS (SELECT doc_id, unnest(${Text.TokensOracleSql}) AS word FROM documents),
      |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      |m AS (SELECT * FROM tok WHERE word IN ('hash', 'join', 'vector')),
      |tf AS (SELECT doc_id, word, count(*) AS tf FROM m GROUP BY 1, 2),
      |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM m GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |ad AS (SELECT CAST(sum(CAST(dl AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |s AS (SELECT tf.doc_id, tf.word,
      |        CAST(ln(1.0 + (CAST(n.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
      |                 / (CAST(df.df AS DOUBLE) + 0.5))
      |        * (CAST(tf.tf AS DOUBLE) * 2.2)
      |        / (CAST(tf.tf AS DOUBLE)
      |           + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / ad.avgdl)) AS DECIMAL(18,6)) AS s
      |      FROM tf JOIN df ON tf.word = df.word
      |      JOIN dl ON tf.doc_id = dl.doc_id
      |      CROSS JOIN n CROSS JOIN ad)
      |SELECT doc_id,
      |  CAST(sum(s) AS DOUBLE) AS bm25,
      |  count(*) AS n_terms
      |FROM s GROUP BY doc_id""".stripMargin

  // ---- Unicode normalization ----------------------------------------------

  /** Unicode normalization over the corpus via the native codegen'd
    * [[graft.functions.NfcNormalize]] / [[graft.functions.StripAccents]]
    * expressions, oracle-checked against DuckDB's functions of the same
    * name. The source corpus is pure ASCII (so normalization alone would
    * be an identity — no evidence), so the query first MANUFACTURES
    * non-trivial Unicode deterministically in both engines: `translate`
    * plants precomposed accents (`a→á, e→é, o→ö, u→û`) and `replace`
    * plants decomposed combining sequences (`a` → `a`+U+0300). The
    * outputs then pin real behavior: `n_dec` > `n_nfc` proves NFC
    * composed the combining pairs; `nfc_md5`/`strip_md5` hash the exact
    * normalized bytes cross-engine; `strip_roundtrip` proves
    * strip∘accent = identity. One codegen'd scan, no shuffle; at 100 TB
    * this is the pre-tokenization cleanup pass and the ASCII fast path
    * in [[graft.functions.TextNorm]] makes it one length comparison per
    * (mostly-ASCII) row.
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    CountIn.register(spark)
    Tables.documents(spark, dir)
      .select(
        col("doc_id"), col("text"),
        replace(col("text"), lit("a"), lit("à")).as("dec"),
        translate(col("text"), "aeou", "áéöû").as("acc"))
      .select(
        col("doc_id"),
        length(col("dec")).cast("long").as("n_dec"),
        length(call_function("nfc_normalize", col("dec"))).cast("long").as("n_nfc"),
        md5(call_function("nfc_normalize", col("dec"))).as("nfc_md5"),
        md5(call_function("strip_accents", col("acc"))).as("strip_md5"),
        (call_function("strip_accents", col("acc")) === col("text"))
          .as("strip_roundtrip"))
  }

  val textNormalizeSql: String =
    """WITH t AS (SELECT doc_id, text,
      |  replace(text, 'a', 'a' || chr(768)) AS dec,
      |  translate(text, 'aeou', 'áéöû') AS acc FROM documents)
      |SELECT doc_id,
      |  CAST(length(dec) AS BIGINT) AS n_dec,
      |  CAST(length(nfc_normalize(dec)) AS BIGINT) AS n_nfc,
      |  md5(nfc_normalize(dec)) AS nfc_md5,
      |  md5(strip_accents(acc)) AS strip_md5,
      |  strip_accents(acc) = text AS strip_roundtrip
      |FROM t""".stripMargin

  // ---- vocabulary coverage -------------------------------------------------

  /** Fixed vocabulary budget — the tokenizer-building shape: keep the
    * top-K token types by global frequency. K is a constant, which IS
    * the scale argument below: the vocab is broadcastable by
    * construction at any corpus size. */
  val VocabK = 25

  /** Per-document out-of-vocabulary rate against a corpus-derived
    * top-[[VocabK]] vocabulary (ties broken by word, so the set is
    * deterministic cross-engine). The tokenizer-coverage question every
    * training pipeline asks: how much of each document does a fixed
    * vocab fail to cover? Plan: one partial-agg shuffle builds the
    * 31-type count table, `TakeOrderedAndProject` keeps K rows, and the
    * exploded token stream LEFT-joins that K-row table as a BROADCAST —
    * the big relation never shuffles on the join key; the only other
    * exchange is the per-doc partial-agg rollup. Two scans of the token
    * stream (count-building and coverage) — same two-scan trade
    * [[textTfidf]] documents: reusing one exchange would force the wider
    * relation through a foreign partitioning.
    */
  def textVocabOov(spark: SparkSession, dir: String): DataFrame = {
    // explode_outer: avoids the inferred size()>0 scan filter that
    // re-evaluates the tokenizer per row (the sibling operators' rule)
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode_outer(Text.tokens(col("text"))).as("w"))
      .filter(col("w").isNotNull)
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(VocabK)
      .select(col("w"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_ratio"))
  }

  val textVocabOovSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest($TokSql) AS w FROM documents),
      |cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
      |vocab AS (SELECT w FROM cnt ORDER BY c DESC, w ASC LIMIT $VocabK),
      |j AS (SELECT t.doc_id,
      |        CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
      |      FROM tok t LEFT JOIN vocab v ON t.w = v.w)
      |SELECT doc_id, count(*) AS n_tokens,
      |  CAST(sum(oov) AS BIGINT) AS n_oov,
      |  CAST(sum(oov) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS oov_ratio
      |FROM j GROUP BY doc_id""".stripMargin

  /** SOURCE MIXTURE WEIGHTS — temperature-flattened sampling shares per
    * source, the knob that decides how much of each corpus a training
    * run sees: natural share = tokens_s / Σtokens, α-share ∝
    * tokens_s^α (α = 0.5 here, i.e. sqrt — upweights small sources),
    * oversample factor = α-share / natural share. One pass over
    * documents partially aggregates exact token counts to source
    * cardinality (dimension-sized — everything after is driver-trivial
    * but stays declarative). Cross-engine exactness: token counts are
    * exact BIGINTs; sqrt is IEEE-754 correctly rounded (identical on
    * both engines, unlike ln/exp); each sqrt is pinned to the decimal
    * domain BEFORE the order-sensitive Σ, so the denominator is an
    * exact decimal sum; the final shares are IEEE double divisions of
    * identical operands. The only residual risk is a sqrt landing
    * within 1 ulp of a 6-dp half boundary (the documented ~1e-10
    * coincidence class, see [[textTfidf]]). */
  def docMixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Text.tokens(col("text"))).cast("long")).as("tokens"))
      .withColumn("alpha_w", sqrt(col("tokens").cast("double")).cast("decimal(18,6)"))
    val totals = perSource.agg(
      sum(col("tokens")).as("tot_tokens"),
      sum(col("alpha_w")).as("tot_alpha"))
    perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("tokens"),
        (col("tokens").cast("double") / col("tot_tokens").cast("double"))
          .as("natural_share"),
        (col("alpha_w").cast("double") / col("tot_alpha").cast("double"))
          .as("alpha_share"),
        ((col("alpha_w").cast("double") / col("tot_alpha").cast("double")) /
          (col("tokens").cast("double") / col("tot_tokens").cast("double")))
          .as("oversample"))
  }

  val docMixtureWeightsSql: String =
    s"""WITH s AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(len($TokSql)) AS BIGINT) AS tokens
      |  FROM documents GROUP BY 1),
      |w AS (SELECT source, n_docs, tokens,
      |        CAST(sqrt(CAST(tokens AS DOUBLE)) AS DECIMAL(18,6)) AS alpha_w
      |      FROM s),
      |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS tot_tokens,
      |             sum(alpha_w) AS tot_alpha FROM w)
      |SELECT source, n_docs, tokens,
      |  CAST(tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE) AS natural_share,
      |  CAST(alpha_w AS DOUBLE) / CAST(tot_alpha AS DOUBLE) AS alpha_share,
      |  (CAST(alpha_w AS DOUBLE) / CAST(tot_alpha AS DOUBLE))
      |    / (CAST(tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE)) AS oversample
      |FROM w CROSS JOIN t""".stripMargin

  /** EXACT-K PER-GROUP SAMPLE — exactly `PerSourceK` docs from every
    * source, selected deterministically as the k smallest salted md5
    * hashes (uniform ⇒ a uniform random sample, but stable across
    * reruns, engines, and corpus growth of OTHER sources — the
    * balanced-eval-subset builder). Hash-rank, not `TABLESAMPLE`:
    * sampling operators are nondeterministic by design and can't be
    * oracle-checked. The rank plans as Spark's WindowGroupLimit — each
    * map task keeps only its local top-k per source BEFORE the
    * exchange, so the shuffle carries O(sources × k), not the corpus
    * (the same bounded-state argument as every top-k here). The salt
    * (`:persrc`) decorrelates from the split/strat/resample coins. */
  val PerSourceK = 5

  def docSamplePerSource(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(col("doc_id").cast("string"), lit(":persrc")))
    val w = Window.partitionBy(col("source")).orderBy(h.asc, col("doc_id").asc)
    Tables.documents(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= PerSourceK)
      .select(col("source"), col("doc_id"), col("rk").cast("long").as("rk"))
  }

  val docSamplePerSourceSql: String =
    s"""SELECT source, doc_id, CAST(rk AS BIGINT) AS rk FROM (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY md5(CAST(doc_id AS VARCHAR) || ':persrc'),
      |                                doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= $PerSourceK""".stripMargin

  /** EPOCH RESAMPLE — materialize the temperature-weighted corpus that
    * [[docMixtureWeights]] prescribes: each doc appears
    * `floor(oversample)` times, plus one more with probability
    * `frac(oversample)`. The fractional coin is the same deterministic
    * md5-threshold machinery as [[docSampleSplit]] (stateless,
    * shuffle-free, rerun-stable), with the probability QUANTIZED to
    * 1/256 granularity so the threshold is a 2-hex-digit prefix —
    * lexicographic compare, no cross-engine hex-to-int conversion. The
    * salt (`:resample`) decorrelates the coin from the split/strat
    * hashes. Copies come from `explode(sequence(...))` — generated, not
    * read, so the scan stays one pass and NOTHING shuffles: weights are
    * source-cardinality and broadcast. Σ copies ≈ N·α-share/natural
    * share per source, i.e. the resampled corpus realizes the mixture. */
  def docResample(spark: SparkSession, dir: String): DataFrame = {
    val weights = docMixtureWeights(spark, dir).select("source", "oversample")
    val base = floor(col("oversample")).cast("long")
    val q = floor((col("oversample") - floor(col("oversample"))) * lit(256.0))
      .cast("int")
    val thr = lpad(lower(hex(q)), 2, "0")
    val coin = (md5(concat(col("doc_id").cast("string"), lit(":resample"))) < thr)
      .cast("long")
    Tables.documents(spark, dir)
      .join(broadcast(weights), Seq("source"))
      .select(col("doc_id"), col("source"), (base + coin).as("n_copies"))
      .filter(col("n_copies") >= 1L)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
  }

  val docResampleSql: String =
    s"""WITH w AS ($docMixtureWeightsSql),
      |c AS (
      |  SELECT d.doc_id, d.source,
      |    CAST(floor(w.oversample) AS BIGINT) +
      |    CASE WHEN md5(CAST(d.doc_id AS VARCHAR) || ':resample') <
      |              lpad(lower(hex(CAST(floor((w.oversample - floor(w.oversample))
      |                                        * 256.0) AS INT))), 2, '0')
      |         THEN 1 ELSE 0 END AS n_copies
      |  FROM documents d JOIN w ON d.source = w.source)
      |SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy
      |FROM c WHERE n_copies >= 1""".stripMargin

  /** INVERTED INDEX build — term → document-frequency + sorted posting
    * list, the retrieval structure behind BM25 serving and
    * decontamination probes. Explode once, collapse to distinct
    * (word, doc_id) postings (map-side partial distinct before the one
    * shuffle on word), then per term aggregate df and the numerically
    * sorted posting list. ONE exchange: `collect_set` is the partial
    * aggregate (its map-side set union IS the per-partition distinct),
    * so df = set size and a separate distinct-then-count pass — a
    * second shuffle — never happens. The list is emitted as a
    * comma-joined STRING: cross-engine array hashing is
    * representation-dependent, a joined string is byte-comparable.
    * Postings are sorted numerically BEFORE the string cast
    * (lexicographic '10'<'2' would diverge between engines' native
    * list orderings). At 100 TB a single term's posting list can
    * exceed a task — the production layout shards the list by
    * `pmod(hash(doc_id), B)` into (word, shard) rows, same plan shape,
    * bounded state; the un-sharded form here is what the oracle can
    * express. */
  def textInvertedIndex(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // explode_outer + isNotNull: the plain-explode form gets an
      // inferred size()>0 filter that re-runs the tokenizer per row
      .select(explode_outer(Text.tokens(col("text"))).as("word"), col("doc_id"))
      .filter(col("word").isNotNull)
      .groupBy("word")
      .agg(array_sort(collect_set(col("doc_id"))).as("ids"))
      .select(col("word"), size(col("ids")).cast("long").as("df"),
        array_join(transform(col("ids"), _.cast("string")), ",").as("postings"))

  val textInvertedIndexSql: String =
    s"""WITH tok AS (
      |  SELECT DISTINCT unnest($TokSql) AS word, doc_id FROM documents)
      |SELECT word, count(*) AS df,
      |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
      |FROM tok GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_mixture_weights" -> (docMixtureWeights _),
    "doc_resample" -> (docResample _),
    "doc_sample_per_source" -> (docSamplePerSource _),
    "text_lm_score" -> (textLmScore _),
    "text_inverted_index" -> (textInvertedIndex _),
    "text_normalize" -> (textNormalize _),
    "text_vocab_oov" -> (textVocabOov _),
    "doc_stable_ids" -> (docStableIds _),
    "doc_pack_shards" -> (docPackShards _),
    "doc_shuffle_shards" -> (docShuffleShards _),
    "curation_e2e" -> (curationE2e _),
    "text_bm25" -> (textBm25 _),
    "doc_sample_split" -> (docSampleSplit _),
    "text_repetition" -> (textRepetition _),
    "doc_sample_stratified" -> (docSampleStratified _),
    "text_redact" -> (textRedact _),
    "text_stats" -> (textStats _),
    "text_quality_filter" -> (textQualityFilter _),
    "text_langid" -> (textLangid _),
    "text_token_count" -> (textTokenCount _),
    "text_top_terms" -> (textTopTerms _),
    "text_bigrams" -> (textBigrams _),
    // rows-only: Misra–Gries candidate set is merge-order-dependent;
    // HeavyHittersSpec pins the no-false-negative guarantee
    "text_heavy_hitters" -> (textHeavyHitters _),
    "text_tfidf" -> (textTfidf _),
    "text_fingerprint" -> (textFingerprint _),
    "text_array_fns" -> (textArrayFns _))

  val oracles: Map[String, String] = Map(
    "doc_mixture_weights" -> docMixtureWeightsSql,
    "doc_resample" -> docResampleSql,
    "doc_sample_per_source" -> docSamplePerSourceSql,
    "text_lm_score" -> textLmScoreSql,
    "text_inverted_index" -> textInvertedIndexSql,
    "text_normalize" -> textNormalizeSql,
    "text_vocab_oov" -> textVocabOovSql,
    "doc_stable_ids" -> docStableIdsSql,
    "doc_pack_shards" -> docPackShardsSql,
    "doc_shuffle_shards" -> docShuffleShardsSql,
    "curation_e2e" -> curationE2eSql,
    "text_bm25" -> textBm25Sql,
    "doc_sample_split" -> docSampleSplitSql,
    "text_repetition" -> textRepetitionSql,
    "doc_sample_stratified" -> docSampleStratifiedSql,
    "text_redact" -> textRedactSql,
    "text_stats" -> textStatsSql,
    "text_quality_filter" -> textQualityFilterSql,
    "text_langid" -> textLangidSql,
    "text_token_count" -> textTokenCountSql,
    "text_top_terms" -> textTopTermsSql,
    "text_bigrams" -> textBigramsSql,
    "text_tfidf" -> textTfidfSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_array_fns" -> textArrayFnsSql)
}
