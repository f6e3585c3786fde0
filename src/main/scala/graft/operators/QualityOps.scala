package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-quality and curation operators (SURVEY §2C, round 4): the
  * filter/dedup/coverage passes a production LLM training-data pipeline runs
  * between raw ingest and tokenization.
  *
  *  - Gopher-style repetition filters (duplicated n-gram fraction, top
  *    n-gram mass) — `q_rep_ngram_filters`
  *  - C4-style cross-corpus segment dedup (drop every repeated fixed-width
  *    text segment except its first occurrence, reassemble docs) —
  *    `q_segment_dedup`
  *  - Vocabulary coverage / OOV-rate audit against a frequency-built
  *    vocabulary — `q_vocab_coverage`
  *  - Length-weighted deterministic Bernoulli sampling — `q_sample_weighted`
  *  - Sign-binarized embedding signatures + Hamming-distance top-k ANN —
  *    `q_emb_hamming`
  *  - Sliding-window document chunking with overlap (context-window prep) —
  *    `q_doc_chunks`
  *
  * 100 TB posture: every per-doc computation is map-only over bounded-size
  * documents; the only shuffles are (a) keyed aggregations with map-side
  * combine (n-gram counts, per-doc totals), (b) one hash shuffle on the
  * segment text for cross-corpus first-occurrence dedup (the same shape as a
  * groupBy — C4's global line dedup is exactly this), and (c) a broadcast of
  * the tiny vocabulary / query-signature tables back onto the fact side.
  * Nothing collects, nothing single-partitions, and the Hamming path turns a
  * 64-float cosine into one XOR+POPCNT per candidate.
  *
  * Cross-engine determinism: md5-derived integers (exact hex parse both
  * sides), integer thresholds, fixed-order double arithmetic rounded to 6dp,
  * and total-order tiebreaks on every ranked output (same conventions as
  * TextOps/Dedup/Similarity — see FIXTURES.md §3).
  */
object QualityOps {

  /** documents.text is single-space-separated word soup (FIXTURES.md). */
  private def words(c: Column): Column = split(c, " ")

  /** Word n-grams starting at every position; the greatest() guard emits one
    * (possibly short) gram for docs with fewer than n words, mirroring
    * TextOps.qDocFingerprint. (Shared with the streaming ingest twin.) */
  private[graft] def ngrams(w: Column, n: Int): Column =
    transform(sequence(lit(1), greatest(size(w) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(w, i, lit(n))))

  // ---------------------------------------------------------------- filters

  /** Gopher-style repetition quality filters (Rae et al. 2021 §A1.1): the
    * fraction of word 3-grams that are repeats of an earlier 3-gram in the
    * same doc, and the mass of the single most frequent 2-gram. Docs that
    * exceed either threshold are boilerplate/spam candidates.
    *
    * Plan (round 8): both statistics are pure functions of ONE document,
    * so the whole query is map-only — a single
    * [[graft.functions.RepNgramStatsExpr]] walk per row emits
    * [total_3grams, distinct_3grams, total_2grams, max_2gram_count] and the
    * ratios are plain column arithmetic over it. The first cut exploded
    * every 2-gram into a (doc_id, gram) hash aggregation and joined back:
    * ~40 M shuffled gram rows and 17.0 s at the 100x probe for a row-local
    * statistic. The output sort runs BELOW the stats projection (the
    * tokenize_rank/text_normalize lesson: the range sampling pass executes
    * only the pruned scan, and the walk runs once, after the exchange);
    * the stats array is projected as a column first so the ratio
    * projections reference it without re-evaluating the walk
    * (CollapseProject keeps non-cheap expressions single-use). */
  def qRepNgramFilters(spark: SparkSession, dir: String): DataFrame = {
    val s = col("s")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .select(col("doc_id"),
        graft.functions.RepNgramStatsExpr.repNgramStats(words(col("text"))).as("s"))
      .select(
        col("doc_id"),
        round((s.getItem(0) - s.getItem(1)).cast("double") / s.getItem(0), 6)
          .as("dup_3gram_frac"),
        round(s.getItem(3).cast("double") / s.getItem(2), 6).as("top_2gram_frac"))
      .withColumn("keep",
        col("dup_3gram_frac") <= 0.02 && col("top_2gram_frac") <= 0.05)
  }

  /** Fixed-width word segments per doc: SegWords-word windows starting at
    * 1, 1+SegWords, … (non-overlapping; the last segment may be short). */
  private val SegWords = 5

  /** C4-style cross-corpus segment dedup (Raffel et al. 2020 §2.2 does this
    * with lines; the corpus has no newlines so the unit is a fixed 5-word
    * segment): every repeated segment keeps only its first occurrence in
    * (doc_id, seg_pos) order, then docs are reassembled from their surviving
    * segments.
    *
    * Plan: one explode, one hash shuffle keyed by segment text (first
    * occurrence via min-rank window — identical shape to a groupBy at any
    * scale; the key is the segment hash, so boilerplate clusters land
    * together and everything else is near-unique), one aggregation back by
    * doc_id. No collects, no single-partition exchange.
    */
  def qSegmentDedup(spark: SparkSession, dir: String): DataFrame = {
    // `w` must be an attribute: the transform lambda is interpreted and
    // re-evaluates captured expressions per element (inline split = O(n²)).
    val w = col("ws")
    val segs = Tables.documents(spark, dir)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(
        col("doc_id"),
        posexplode(transform(sequence(lit(1), greatest(size(w), lit(1)), lit(SegWords)),
          i => concat_ws(" ", slice(w, i, lit(SegWords))))).as(Seq("seg_pos", "seg")))
    val first = row_number().over(Window.partitionBy("seg").orderBy("doc_id", "seg_pos")) === 1
    segs.withColumn("kept", first)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segs"),
        count(when(col("kept"), lit(1))).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("kept"), struct(col("seg_pos"), col("seg"))))),
            x => x.getField("seg")),
          " ").as("dedup_text"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- coverage

  private val VocabSize = 20

  /** Vocabulary coverage audit: build the top-`VocabSize` vocabulary by
    * corpus frequency (deterministic count-desc/word-asc order), broadcast
    * it, and report each doc's out-of-vocabulary token rate — the standard
    * pre-tokenizer coverage check.
    *
    * Plan: one explode feeding (a) the vocab aggregation (map-side combine,
    * then a 20-row driver-free limit) and (b) per-doc totals; the vocab joins
    * back as a broadcast hash join (the scale shape: vocabulary ≪ corpus).
    */
  def qVocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
    val vocab = ex.groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(VocabSize).select("word")
    val tot = ex.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val inv = ex.join(broadcast(vocab), "word")
      .groupBy("doc_id").agg(count(lit(1)).as("n_invocab"))
    tot.join(inv, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        coalesce(col("n_invocab"), lit(0L)).as("n_invocab"),
        round(lit(1.0) - coalesce(col("n_invocab"), lit(0L)).cast("double") / col("n_tokens"), 6)
          .as("oov_rate"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- sampling

  /** Length-weighted deterministic Bernoulli sample: doc kept iff its
    * md5-derived 16-bit key falls under an integer threshold proportional to
    * n_chars (longer docs sampled proportionally more — the mixing knob a
    * data-recipe uses to upweight long-form text). Pure integer arithmetic,
    * identical on both engines, rerun- and cluster-size-stable; map-only. */
  def qSampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    val key = conv(substring(md5(concat(lit("wsmp|"), col("doc_id").cast("string"))), 1, 4), 16, 10)
      .cast("long")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        key.as("sample_key"),
        least(lit(65536L), col("n_chars") * 60L).as("threshold"))
      .filter(col("sample_key") < col("threshold"))
      .orderBy("doc_id")
  }

  /** Temperature-sampling scale constant: per-source keep rate is
    * `min(1, MixScale / sqrt(n_s))`, so expected sampled counts are
    * proportional to `sqrt(n_s)` — the tau = 2 temperature mixture that
    * upweights small domains against head domains (the standard recipe for
    * balancing web-crawl vs curated sources in a training mix). */
  private val MixScale = 8.0

  /** Temperature-weighted domain mixture sample: deterministic per-doc
    * Bernoulli with a PER-SOURCE rate derived from source sizes. Unlike
    * [[qSampleWeighted]] (per-row length weights), the knob here is the
    * domain mixture itself.
    *
    * Cross-engine determinism without rounding: every arithmetic step is a
    * single correctly-rounded IEEE op from exact integer inputs (sqrt of a
    * count, one divide, min, multiply by 65536, floor) — no multi-way double
    * sums whose association order could differ, so Spark and DuckDB agree
    * bit-for-bit. 100 TB shape: source stats are one tiny map-side-combined
    * groupBy; the sample itself is a map-only filter after a broadcast join
    * of the ~dozens-of-rows rate table. */
  def qMixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val rates = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
      .select(col("source"),
        floor(least(lit(1.0), lit(MixScale) / sqrt(col("n_s"))) * 65536).cast("long")
          .as("threshold"))
    val key = conv(substring(md5(concat(lit("temp|"), col("doc_id").cast("string"))), 1, 4), 16, 10)
      .cast("long")
    docs.join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"), key.as("sample_key"), col("threshold"))
      .filter(col("sample_key") < col("threshold"))
      .orderBy("doc_id")
  }

  /** Fixed per-source quota for [[qSampleReservoir]]. */
  private val ReservoirK = 40

  /** Shard fan-out for [[qSampleReservoir]]'s local top-K phase. */
  private val ReservoirShards = 8

  /** Deterministic reservoir (fixed-quota) sample: EXACTLY min(k, n_s) docs
    * per source — the quota-based companion to rate-based sampling
    * ([[qMixtureSample]]): a data recipe that says "at most K examples per
    * domain" regardless of domain size. Uniformity comes from ranking by
    * the md5 key (a random permutation per source); determinism and
    * rerun-stability come from the (key, doc_id) total order.
    *
    * 100 TB shape — two-phase top-K, EXACTLY the classic distributed
    * pattern: phase 1 ranks within (source, shard) — high-cardinality
    * partitions, any one bounded to ~n_s/shards rows — and keeps each
    * shard's local top-K; any global top-K row is necessarily in its
    * shard's top-K, so phase 2's per-source window ranks at most
    * shards·K ≈ hundreds of survivor rows per source, a bounded partition
    * at ANY corpus size. The round-4 shape ranked the full corpus on a
    * handful of source partitions — the low-cardinality funnel the verdict
    * flagged. Output is bit-identical (PlanSpec asserts the composite
    * first-phase key; the oracle is unchanged). */
  def qSampleReservoir(spark: SparkSession, dir: String): DataFrame = {
    val key = conv(substring(md5(concat(lit("resv|"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val local = Window.partitionBy("source", "shard").orderBy("sample_key", "doc_id")
    val global = Window.partitionBy("source").orderBy("sample_key", "doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), key.as("sample_key"))
      .withColumn("shard", pmod(col("doc_id"), lit(ReservoirShards)))
      .withColumn("lpick", row_number().over(local))
      .filter(col("lpick") <= ReservoirK)
      .withColumn("pick", row_number().over(global))
      .filter(col("pick") <= ReservoirK)
      .select(col("doc_id"), col("source"), col("sample_key"), col("pick"))
      .orderBy("doc_id")
  }

  /** PII scrub pass: mask email-shaped and long-digit-run tokens, report
    * per-doc counts — the redaction step every training corpus runs before
    * anything else sees the text. Map-only regexp work (two codegen'd
    * regexp_replace + two counts via regexp_count); patterns restricted to
    * the RE2/Java-regex common subset so the DuckDB oracle is identical.
    * The scrubbed text ships with the counts so the output is auditable
    * (docs with pii_total = 0 pass through byte-identical). */
  def qPiiScrub(spark: SparkSession, dir: String): DataFrame =
    piiScrub(Tables.documents(spark, dir)).orderBy("doc_id")

  /** The scrub transformation over any (doc_id, text) frame. The driver
    * corpus is PII-free by construction, so the oracle hash proves the
    * ZERO-FALSE-POSITIVE side (a scrub that mangles clean text corrupts
    * the corpus silently); the masking side is spec-proven on planted
    * emails/digit runs (QualityOpsSpec). */
  private[operators] def piiScrub(d: DataFrame): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val digits = "[0-9]{6,}"
    // digit runs are counted AFTER the email mask so every count maps to a
    // <NUM> actually present in the output (a digit run inside an email is
    // consumed by <EMAIL>) — counts reconcile 1:1 against the masks
    d.select(
      col("doc_id"),
      regexp_count(col("text"), lit(email)).cast("int").as("n_emails"),
      regexp_replace(col("text"), email, "<EMAIL>").as("demailed"))
      .select(
        col("doc_id"), col("n_emails"),
        regexp_count(col("demailed"), lit(digits)).cast("int").as("n_digit_runs"),
        regexp_replace(col("demailed"), digits, "<NUM>").as("scrubbed"))
      .withColumn("pii_total", col("n_emails") + col("n_digit_runs"))
  }

  // ------------------------------------------------------------- similarity

  private val NQueries = 5
  private val TopK = 5

  /** 64-bit sign-binarized embedding signature: bit i set iff embedding[i]
    * > 0. Same signed-64 assembly as Dedup's simhash: terms summed in
    * ascending bit order with the bit-63 term = Long.MinValue, so partial
    * sums peak at 2^63-1 and never overflow under ANSI. */
  private def signSig(emb: Column): Column =
    (0 until 64).map { bit =>
      val term = if (bit == 63) Long.MinValue else 1L << bit
      when(element_at(emb, bit + 1) > 0f, lit(term)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Hamming-distance top-k ANN over sign-binarized embeddings: the
    * compressed fast path of the similarity family — one XOR + POPCNT per
    * candidate instead of a 64-float dot product (64 bits vs 256 bytes per
    * vector; ~32x less memory traffic, and signatures bucket directly into
    * the SimHash Hamming-pigeonhole scheme at corpus scale). Queries =
    * vec_id < NQueries (same deterministic convention as q_cosine_topk);
    * rank tiebreak (hamming, vec_id) is total.
    *
    * Plan: map-only signature projection; the 5-row query side broadcasts;
    * top-k via per-query window (5 partitions of n rows — the candidate
    * stream never shuffles by more than q_id).
    */
  def qEmbHamming(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.embeddings(spark, dir).select(col("vec_id"), signSig(col("embedding")).as("sig"))
    val q = s.filter(col("vec_id") < NQueries)
    val cand = s.as("c")
      .join(broadcast(q.as("q")), col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("q_id"),
        col("c.vec_id").as("vec_id"),
        bit_count(col("q.sig").bitwiseXOR(col("c.sig"))).as("hamming"))
    cand
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("hamming"), col("vec_id"))))
      .filter(col("rank") <= TopK)
      .orderBy("q_id", "rank")
  }

  // --------------------------------------------------------------- chunking

  private val ChunkWords = 50
  private val ChunkStride = 25

  /** Sliding-window document chunking with overlap (stride < window — every
    * token lands in ≤ 2 chunks): the context-window preparation step between
    * cleaning and tokenization. Emits per-chunk offsets, lengths and an md5
    * content fingerprint (compact, hash-stable output). Map-only: one
    * projection + one generator, no shuffle at any scale. */
  def qDocChunks(spark: SparkSession, dir: String): DataFrame = {
    val w = words(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), w.as("ws"),
        posexplode(sequence(lit(1), greatest(size(w), lit(1)), lit(ChunkStride)))
          .as(Seq("chunk_idx", "start")))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        col("start"),
        size(slice(col("ws"), col("start"), lit(ChunkWords))).as("n_tokens"),
        md5(concat_ws(" ", slice(col("ws"), col("start"), lit(ChunkWords)))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  // ---------------------------------------------------------------- wiring

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rep_ngram_filters" -> qRepNgramFilters,
    "q_segment_dedup" -> qSegmentDedup,
    "q_vocab_coverage" -> qVocabCoverage,
    "q_sample_weighted" -> qSampleWeighted,
    "q_mixture_sample" -> qMixtureSample,
    "q_sample_reservoir" -> qSampleReservoir,
    "q_pii_scrub" -> qPiiScrub,
    "q_emb_hamming" -> qEmbHamming,
    "q_doc_chunks" -> qDocChunks
  )

  /** Exact integer parse of md5 hex chars [1..4] over alias m (DuckDB). */
  private val hex16Sql: String =
    Seq(4096, 256, 16, 1).zipWithIndex
      .map { case (mult, i) => s"(strpos('0123456789abcdef', m[${i + 1}]) - 1) * $mult" }
      .mkString("(", " + ", ")")

  /** Exact integer parse of md5 hex chars [1..8] (32-bit key, DuckDB). */
  private val hex32Sql: String =
    (0 until 8)
      .map(i => s"(strpos('0123456789abcdef', m[${i + 1}]) - 1) * ${1L << (4 * (7 - i))}")
      .mkString("(", " + ", ")")

  /** DuckDB n-gram list over alias ws (1-based slices, truncated tail grams
    * excluded by the same greatest() guard as the Spark side). */
  private def ngramsSql(n: Int): String =
    s"list_transform(range(1, greatest(len(ws) - ${n - 1}, 1) + 1), i -> array_to_string(ws[i:i+${n - 1}], ' '))"

  def oracleSql: Map[String, String] = Map(
    "q_rep_ngram_filters" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |d3 AS (SELECT doc_id,
         |  round(CAST(len(g) - len(list_distinct(g)) AS DOUBLE) / len(g), 6) AS dup_3gram_frac
         |  FROM (SELECT doc_id, ${ngramsSql(3)} AS g FROM w)),
         |g2 AS (SELECT doc_id, unnest(${ngramsSql(2)}) AS g FROM w),
         |c2 AS (SELECT doc_id, g, COUNT(*) AS n FROM g2 GROUP BY doc_id, g),
         |t2 AS (SELECT doc_id, round(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) AS top_2gram_frac
         |       FROM c2 GROUP BY doc_id)
         |SELECT doc_id, dup_3gram_frac, top_2gram_frac,
         |  (dup_3gram_frac <= 0.02 AND top_2gram_frac <= 0.05) AS keep
         |FROM d3 JOIN t2 USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_segment_dedup" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |s AS (SELECT doc_id, CAST((start - 1) // $SegWords AS INTEGER) AS seg_pos,
         |        array_to_string(ws[start:start+${SegWords - 1}], ' ') AS seg
         |      FROM (SELECT doc_id, ws,
         |              unnest(range(1, greatest(len(ws), 1) + 1, $SegWords)) AS start
         |            FROM w)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_pos) AS rn
         |      FROM s)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
         |  CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
         |  coalesce(string_agg(seg, ' ' ORDER BY seg_pos) FILTER (WHERE rn = 1), '') AS dedup_text
         |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_vocab_coverage" ->
      s"""WITH ex AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         |vocab AS (SELECT word FROM (
         |    SELECT word, COUNT(*) AS n FROM ex GROUP BY word
         |    ORDER BY n DESC, word LIMIT $VocabSize)),
         |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM ex GROUP BY doc_id),
         |inv AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_invocab FROM ex
         |        WHERE word IN (SELECT word FROM vocab) GROUP BY doc_id)
         |SELECT t.doc_id, t.n_tokens, coalesce(i.n_invocab, 0) AS n_invocab,
         |  round(1.0 - CAST(coalesce(i.n_invocab, 0) AS DOUBLE) / t.n_tokens, 6) AS oov_rate
         |FROM tot t LEFT JOIN inv i ON t.doc_id = i.doc_id ORDER BY t.doc_id""".stripMargin,
    "q_sample_weighted" ->
      s"""WITH h AS (SELECT doc_id, lang, n_chars,
         |    md5('wsmp|' || CAST(doc_id AS VARCHAR)) AS m FROM documents)
         |SELECT doc_id, lang, n_chars, CAST($hex16Sql AS BIGINT) AS sample_key,
         |  least(65536, n_chars * 60) AS threshold
         |FROM h WHERE $hex16Sql < least(65536, n_chars * 60)
         |ORDER BY doc_id""".stripMargin,
    "q_mixture_sample" ->
      s"""WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
         |           FROM documents GROUP BY source),
         |r AS (SELECT source,
         |        CAST(FLOOR(least(1.0, $MixScale / sqrt(n_s)) * 65536) AS BIGINT) AS threshold
         |      FROM s),
         |h AS (SELECT doc_id, d.source, threshold,
         |        md5('temp|' || CAST(doc_id AS VARCHAR)) AS m
         |      FROM documents d JOIN r ON d.source = r.source)
         |SELECT doc_id, source, CAST($hex16Sql AS BIGINT) AS sample_key, threshold
         |FROM h WHERE $hex16Sql < threshold
         |ORDER BY doc_id""".stripMargin,
    "q_sample_reservoir" ->
      s"""WITH h AS (SELECT doc_id, source,
         |    md5('resv|' || CAST(doc_id AS VARCHAR)) AS m FROM documents),
         |k AS (SELECT doc_id, source, CAST($hex32Sql AS BIGINT) AS sample_key FROM h)
         |SELECT doc_id, source, sample_key,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY sample_key, doc_id) AS INTEGER) AS pick
         |FROM k QUALIFY pick <= $ReservoirK
         |ORDER BY doc_id""".stripMargin,
    "q_pii_scrub" -> {
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val digits = "[0-9]{6,}"
      s"""WITH de AS (SELECT doc_id,
         |    CAST(length(regexp_extract_all(text, '$email')) AS INTEGER) AS n_emails,
         |    regexp_replace(text, '$email', '<EMAIL>', 'g') AS demailed
         |  FROM documents)
         |SELECT doc_id, n_emails,
         |  CAST(length(regexp_extract_all(demailed, '$digits')) AS INTEGER) AS n_digit_runs,
         |  regexp_replace(demailed, '$digits', '<NUM>', 'g') AS scrubbed,
         |  CAST(n_emails + length(regexp_extract_all(demailed, '$digits')) AS INTEGER) AS pii_total
         |FROM de ORDER BY doc_id""".stripMargin
    },
    "q_emb_hamming" -> {
      val sig = (0 until 64).map { bit =>
        val term = if (bit == 63) "(-9223372036854775807 - 1)" else s"CAST(${1L << bit} AS BIGINT)"
        s"CASE WHEN embedding[${bit + 1}] > 0 THEN $term ELSE CAST(0 AS BIGINT) END"
      }.mkString(" + ")
      s"""WITH s AS (SELECT vec_id, CAST($sig AS BIGINT) AS sig FROM embeddings),
         |cand AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
         |    CAST(bit_count(xor(q.sig, c.sig)) AS INTEGER) AS hamming
         |  FROM s q JOIN s c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < $NQueries),
         |r AS (SELECT *, CAST(row_number() OVER (
         |        PARTITION BY q_id ORDER BY hamming, vec_id) AS INTEGER) AS rank
         |      FROM cand)
         |SELECT q_id, vec_id, hamming, rank FROM r WHERE rank <= $TopK
         |ORDER BY q_id, rank""".stripMargin
    },
    "q_doc_chunks" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |c AS (SELECT doc_id, ws,
         |        unnest(range(1, greatest(len(ws), 1) + 1, $ChunkStride)) AS start
         |      FROM w)
         |SELECT doc_id, CAST((start - 1) // $ChunkStride AS INTEGER) AS chunk_idx,
         |  CAST(start AS INTEGER) AS start,
         |  CAST(len(ws[start:start+${ChunkWords - 1}]) AS INTEGER) AS n_tokens,
         |  md5(array_to_string(ws[start:start+${ChunkWords - 1}], ' ')) AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
  )
}
