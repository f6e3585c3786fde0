package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators over `documents` (SURVEY §2C / north star):
  * tokenization + word frequency, per-document statistics, quality scoring,
  * heuristic language ID, regex ("BPE-ish") token counting, and MinHash-style
  * document fingerprinting.
  *
  * All are single-pass, map-only or one-shuffle aggregations — the shapes
  * that scale linearly over a 100 TB document corpus (word-frequency is the
  * only global shuffle, and it partial-aggregates map-side).
  *
  * Cross-engine determinism: counting by `replace`-difference and md5-based
  * fingerprints behave identically in Spark and DuckDB; double arithmetic is
  * written in the same operation order on both sides.
  */
object TextOps {

  /** words = split on single space (the documents corpus is space-separated
    * word soup, FIXTURES.md). */
  private def words(c: Column): Column = split(c, " ")

  private def dlen(c: Column): Column = length(c).cast("double")

  /** occurrences of `pat` in `c` via replace-difference (identical semantics
    * in Spark and DuckDB, no regex dialect risk). */
  private def countOcc(c: Column, pat: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(pat), ""))) / pat.length).cast("int")

  def qTextStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(
      col("doc_id"),
      size(words(col("text"))).as("n_tokens"),
      size(array_distinct(words(col("text")))).as("n_distinct"),
      round(dlen(regexp_replace(col("text"), " ", "")) / size(words(col("text"))), 6).as("avg_word_len"),
      length(col("text")).as("text_len"))
      .orderBy("doc_id")
  }

  def qWordFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(words(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  def qLangBreakdown(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")

  /** Heuristic n-gram language ID: score fixed character-bigram marker sets,
    * argmax with deterministic tiebreak. (A capability demo — the corpus
    * vocabulary is synthetic; profiles are constants, the operator shape is
    * what a real lang-ID uses: per-doc map over marker counts.) */
  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val sEn = (countOcc(col("text"), "th") + countOcc(col("text"), "er")).as("score_en")
    val sDe = (countOcc(col("text"), "sc") + countOcc(col("text"), "ta")).as("score_de")
    val sEs = (countOcc(col("text"), "or") + countOcc(col("text"), "ba")).as("score_es")
    d.select(col("doc_id"), col("lang"), sEn, sDe, sEs)
      .withColumn("pred_lang",
        when(col("score_en") >= col("score_de") && col("score_en") >= col("score_es"), "en")
          .when(col("score_de") >= col("score_es"), "de")
          .otherwise("es"))
      .orderBy("doc_id")
  }

  /** Composite quality score: token count, vowel ratio, digit ratio —
    * double arithmetic in fixed order, rounded to 6. */
  def qQualityScore(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val nTok = size(words(col("text"))).cast("double")
    val vowelRatio = dlen(col("text")).minus(dlen(regexp_replace(col("text"), "[aeiou]", ""))) / dlen(col("text"))
    val digitRatio = dlen(col("text")).minus(dlen(regexp_replace(col("text"), "[0-9]", ""))) / dlen(col("text"))
    d.select(
      col("doc_id"),
      round(least(lit(1.0), nTok / 100.0) * 0.5 + vowelRatio * 0.3 + (lit(1.0) - digitRatio) * 0.2, 6)
        .as("quality"),
      round(vowelRatio, 6).as("vowel_ratio"))
      .orderBy("doc_id")
  }

  /** BPE-ish regex token counting: runs of letters | runs of digits | single
    * other non-space char (simple ASCII classes — same in Java regex and
    * RE2). Round 9: ONE row-local byte walk
    * ([[graft.functions.BpeTokenCountExpr]], property-held equal to the
    * `regexp_extract_all` formulation the DuckDB oracle still runs) —
    * the declarative form materialized every token string just to count
    * them, and the 100x probe measured it super-linear (ratio 22.9,
    * GC pressure). */
  def qTokenCountRegex(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        graft.functions.BpeTokenCountExpr.bpeTokenCount(col("text"))
          .as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Document fingerprint: min-md5 over word 5-gram shingles (MinHash with
    * one hash function — a deterministic rolling-window fingerprint).
    * Round 8: ONE row-local walk ([[graft.functions.DocFingerprintExpr]] —
    * gram, md5, running unsigned-byte min, hex-encode the winner;
    * property-held equal to the explode + min(md5) form the oracle still
    * runs in DocFingerprintSpec), so the query is map-only: scan →
    * project → output sort. */
  def qDocFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"),
        graft.functions.DocFingerprintExpr.docFingerprint(col("ws")).as("fingerprint"))
      .orderBy("doc_id")

  /** Canonical text normalization (the cleaning map every corpus pipeline
    * runs before dedup/tokenization): lowercase, strip every char outside
    * [a-z0-9 ], collapse whitespace runs, trim. The DuckDB oracle keeps the
    * two-regex formulation (ASCII classes only, so Java regex and DuckDB
    * RE2 agree); the Spark side runs [[graft.functions.NormalizeTextExpr]]
    * — the same map fused into ONE codegen byte walk (round 8: the regex
    * chain cost ~8 effective passes per row and 51.6 s at the 100x probe;
    * see the expression's scaladoc for the arithmetic and the ASCII
    * equivalence precondition).
    *
    * Plan shape (same round-8 lesson as tokenize_rank): the output sort
    * runs BELOW the projection, on the raw (doc_id, text) rows — the
    * range partitioner's sampling pass executes only the pruned scan, and
    * the normalization runs exactly once, map-only, after the exchange.
    * The norm column is projected in its own step and its length taken
    * from the COLUMN in a second projection, so the walk is never
    * duplicated per output column (CollapseProject keeps non-cheap
    * expressions single-use). */
  def qTextNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .select(col("doc_id"),
        graft.functions.NormalizeTextExpr.normalizeText(col("text")).as("norm_text"),
        length(col("text")).as("n_chars_raw"))
      .withColumn("n_chars_norm", length(col("norm_text")))

  /** Minimum context occurrences for [[qNgramLm]]'s emitted rows. */
  private val LmMinCtx = 5

  /** Trigram language-model TABLE construction: for every word-bigram
    * context, the top-3 next words by count with the context's total — the
    * conditional-distribution table an n-gram LM (or a KenLM-style quality
    * filter) is built from, kept in exact integer counts so the result is
    * hash-checkable (no cross-engine log/float drift). Low-evidence
    * contexts (< [[LmMinCtx]] occurrences) are dropped, the same smoothing
    * floor a real LM table applies.
    *
    * Scale shape: the (ctx, next) count is one map-side-combined
    * aggregation over exploded triples; the rank window partitions by ctx
    * (corpus-cardinality key space, no hot partition); nothing collects.
    * Tiebreak (count desc, word asc) is total — next words are distinct
    * within a context. */
  def qNgramLm(spark: SparkSession, dir: String): DataFrame = {
    // The context string is rendered AFTER the aggregation — once per
    // UNIQUE (w1, w2, nxt) triple instead of once per instance (~250 M
    // at the 100x corpus). Grouping on the word columns is a bijection
    // with grouping on the rendered context: words() splits on
    // whitespace, so no word contains the joiner.
    val trips = Tables.documents(spark, dir)
      .select(words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 3), " +
          "i -> struct(ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS nxt))")).as("t"))
      .select(col("t.w1").as("w1"), col("t.w2").as("w2"), col("t.nxt").as("nxt"))
    val counts = trips.groupBy("w1", "w2", "nxt").agg(count(lit(1)).as("n"))
      .select(concat_ws(" ", col("w1"), col("w2")).as("ctx"), col("nxt"), col("n"))
    val wRank = Window.partitionBy("ctx").orderBy(col("n").desc, col("nxt"))
    val wCtx = Window.partitionBy("ctx")
    counts
      .withColumn("rank", row_number().over(wRank))
      .withColumn("ctx_total", sum(col("n")).over(wCtx))
      .filter(col("rank") <= 3 && col("ctx_total") >= LmMinCtx)
      .select("ctx", "nxt", "n", "rank", "ctx_total")
      .orderBy("ctx", "rank")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_normalize" -> qTextNormalize,
    "q_ngram_lm" -> qNgramLm,
    "q_text_stats" -> qTextStats,
    "q_word_freq" -> qWordFreq,
    "q_lang_breakdown" -> qLangBreakdown,
    "q_lang_id" -> qLangId,
    "q_quality_score" -> qQualityScore,
    "q_token_count_regex" -> qTokenCountRegex,
    "q_doc_fingerprint" -> qDocFingerprint
  )

  // SQL fragment mirrors of the helpers above
  private def sqlCountOcc(expr: String, pat: String): String =
    s"CAST((length($expr) - length(replace($expr, '$pat', ''))) / ${pat.length} AS INTEGER)"

  def oracleSql: Map[String, String] = Map(
    // 1-based list indexing: i in [1, len-2] yields w[i], w[i+1], w[i+2]
    "q_ngram_lm" ->
      s"""WITH ws AS (
         |  SELECT string_split(text, ' ') AS w FROM documents
         |  WHERE len(string_split(text, ' ')) >= 3),
         |t AS (
         |  SELECT unnest([{'ctx': w[i] || ' ' || w[i+1], 'nxt': w[i+2]}
         |                 for i in range(1, len(w) - 1)]) AS s
         |  FROM ws),
         |c AS (SELECT s.ctx AS ctx, s.nxt AS nxt, CAST(COUNT(*) AS BIGINT) AS n
         |      FROM t GROUP BY 1, 2),
         |r AS (SELECT ctx, nxt, n,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY ctx ORDER BY n DESC, nxt) AS INTEGER) AS rank,
         |        CAST(SUM(n) OVER (PARTITION BY ctx) AS BIGINT) AS ctx_total
         |      FROM c)
         |SELECT ctx, nxt, n, rank, ctx_total FROM r
         |WHERE rank <= 3 AND ctx_total >= $LmMinCtx
         |ORDER BY ctx, rank""".stripMargin,
    "q_text_normalize" -> {
      val norm = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
      s"""SELECT doc_id, $norm AS norm_text,
         |  CAST(length(text) AS INTEGER) AS n_chars_raw,
         |  CAST(length($norm) AS INTEGER) AS n_chars_norm
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "q_text_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
        |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')), 6) AS avg_word_len,
        |  CAST(length(text) AS INTEGER) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_word_freq" ->
      """SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY n DESC NULLS LAST, word LIMIT 20""".stripMargin,
    "q_lang_breakdown" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_lang_id" -> {
      val sEn = s"${sqlCountOcc("text", "th")} + ${sqlCountOcc("text", "er")}"
      val sDe = s"${sqlCountOcc("text", "sc")} + ${sqlCountOcc("text", "ta")}"
      val sEs = s"${sqlCountOcc("text", "or")} + ${sqlCountOcc("text", "ba")}"
      s"""WITH s AS (SELECT doc_id, lang,
         |  CAST($sEn AS INTEGER) AS score_en, CAST($sDe AS INTEGER) AS score_de, CAST($sEs AS INTEGER) AS score_es
         |FROM documents)
         |SELECT doc_id, lang, score_en, score_de, score_es,
         |  CASE WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
         |       WHEN score_de >= score_es THEN 'de' ELSE 'es' END AS pred_lang
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "q_quality_score" ->
      """WITH q AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
        |  (CAST(length(text) AS DOUBLE) - CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS DOUBLE)) / CAST(length(text) AS DOUBLE) AS vowel_ratio,
        |  (CAST(length(text) AS DOUBLE) - CAST(length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)) / CAST(length(text) AS DOUBLE) AS digit_ratio
        |FROM documents)
        |SELECT doc_id,
        |  round(least(1.0, n_tok / 100.0) * 0.5 + vowel_ratio * 0.3 + (1.0 - digit_ratio) * 0.2, 6) AS quality,
        |  round(vowel_ratio, 6) AS vowel_ratio
        |FROM q ORDER BY doc_id""".stripMargin,
    "q_token_count_regex" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INTEGER) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_doc_fingerprint" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id,
        |  list_aggregate(list_transform(range(1, greatest(len(ws) - 4, 1) + 1),
        |    i -> md5(array_to_string(ws[i:i+4], ' '))), 'min') AS fingerprint
        |FROM w ORDER BY doc_id""".stripMargin
  )
}
