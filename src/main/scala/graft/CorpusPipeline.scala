package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus funnel: the composition a real training-data
  * job runs, built from the same oracle-checked operators the driver
  * contract exercises individually —
  *
  *   exact dedup → near-dup removal (MinHash-LSH candidates, Jaccard
  *   verify) → quality filter → language filter → deterministic stratified
  *   sample → token counting
  *
  * Returns the surviving corpus plus per-stage row counts. Scale posture:
  * no stage collects the corpus; dedup drops are anti-joins against the
  * (small) verified-duplicate list; sampling and scoring are map-only; the
  * stage stats cost one count() per stage.
  */
object CorpusPipeline {

  /** Per-stage surviving row count, in funnel order. */
  case class StageStat(stage: String, rows: Long)

  def run(spark: SparkSession, dir: String,
          langs: Seq[String] = DefaultLangs,
          sampleRate: Int = DefaultSampleRate): (DataFrame, Seq[StageStat]) = {
    val stats = scala.collection.mutable.ArrayBuffer.empty[StageStat]
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // each stage is persisted before counting so the stats cost one count
    // per stage instead of re-executing the whole upstream funnel each time
    // (intermediates are released once the funnel is materialized)
    def stage(name: String)(df: DataFrame): DataFrame = {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached += df
      stats += StageStat(name, df.count())
      df
    }
    val docs = stage("input")(Tables.documents(spark, dir))

    // 1. exact dedup: keep the smallest doc_id per identical text
    val exactKeep = docs.groupBy("text").agg(min(col("doc_id")).as("doc_id"))
    val exact = stage("exact_dedup")(
      docs.join(exactKeep.select("doc_id"), Seq("doc_id"), "left_semi"))

    // 2. near-dup removal on the EXACT-DEDUP SURVIVORS (not raw docs): a
    // group of k exact duplicates collides on every LSH band and would blow
    // up to Bands*k²/2 candidate rows — real corpora have boilerplate
    // clusters with k in the millions. Running LSH after exact dedup keeps
    // the survivor set identical (any pair through a dropped copy is
    // mirrored by its kept min-id twin, which has the same text, signature,
    // and bands) while killing the k² candidate blowup. Verified by
    // Jaccard >= 0.5; drop the larger id of each pair.
    val dupPairs = operators.Dedup.verifiedNearDupPairs(exact)
      .select(greatest(col("doc_a"), col("doc_b")).as("doc_id")).distinct()
    val nearDeduped = stage("near_dedup")(
      exact.join(dupPairs, Seq("doc_id"), "left_anti"))

    // 3. quality filter: length band + digit-density cap (map-only)
    val digitRatio = (length(col("text")) -
      length(regexp_replace(col("text"), "[0-9]", ""))).cast("double") /
      greatest(length(col("text")), lit(1))
    val quality = stage("quality_filter")(
      nearDeduped.filter(col("n_chars") >= 20 && digitRatio < 0.3))

    // 4. language filter on the metadata column
    val langFiltered = stage("lang_filter")(quality.filter(col("lang").isin(langs: _*)))

    // 5. deterministic stratified hash sample (reproducible at any scale)
    val sampled = stage("sample")(langFiltered.filter(
      conv(substring(md5(concat(lit("corpus|"), col("doc_id").cast("string"))), 1, 4), 16, 10)
        .cast("long") % 100 < sampleRate))

    // 6. BPE-ish token counting (regexp word pieces), carried as a column
    val out = stage("tokenized")(sampled.withColumn("n_tokens",
      size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|\\S"), lit(0)))))
    // the final stage stays cached (callers consume it); upstreams released
    cached.dropRight(1).foreach(_.unpersist(blocking = false))
    (out, stats.toSeq)
  }

  val DefaultLangs: Seq[String] = Seq("en", "de", "es", "fr", "zh")
  val DefaultSampleRate: Int = 50

  /** The funnel as ONE lazy plan (no per-stage persists or counts) — the
    * driver-contract form: surviving (doc_id, n_tokens). Every stage is an
    * operator the oracle gate already checks individually; the end-to-end
    * composition is deterministic, so it gets its own CTE-composed DuckDB
    * oracle. Spec-proved survivor-equal to [[run]]. */
  def funnelQuery(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(spark, dir)
    val exactKeep = docs.groupBy("text").agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val exact = docs.join(exactKeep, Seq("doc_id"), "left_semi")
    // near-dup stage consumes exact-dedup survivors — see [[run]] stage 2
    // for the survivor-set-identity argument and the k² blowup this avoids.
    // The oracle intentionally keeps the raw-docs formulation: its result is
    // provably identical, so it cross-checks the rewrite every round.
    val dupPairs = operators.Dedup.verifiedNearDupPairs(exact)
      .select(greatest(col("doc_a"), col("doc_b")).as("doc_id")).distinct()
    val nearDeduped = exact.join(dupPairs, Seq("doc_id"), "left_anti")
    val digitRatio = (length(col("text")) -
      length(regexp_replace(col("text"), "[0-9]", ""))).cast("double") /
      greatest(length(col("text")), lit(1))
    nearDeduped
      .filter(col("n_chars") >= 20 && digitRatio < 0.3)
      .filter(col("lang").isin(DefaultLangs: _*))
      .filter(conv(substring(md5(concat(lit("corpus|"), col("doc_id").cast("string"))), 1, 4), 16, 10)
        .cast("long") % 100 < DefaultSampleRate)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|\\S"), lit(0))).as("n_tokens"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_corpus_funnel" -> funnelQuery)

  def oracleSql: Map[String, String] = {
    val hex16 =
      Seq(4096, 256, 16, 1).zipWithIndex
        .map { case (mult, i) => s"(strpos('0123456789abcdef', m[${i + 1}]) - 1) * $mult" }
        .mkString("(", " + ", ")")
    val langList = DefaultLangs.map(l => s"'$l'").mkString(", ")
    Map("q_corpus_funnel" ->
      s"""WITH ${operators.Dedup.jaccardCtes},
         |drops AS (SELECT DISTINCT greatest(doc_a, doc_b) AS doc_id FROM jj WHERE jaccard >= 0.5),
         |keepmin AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
         |f AS (
         |  SELECT d.doc_id, d.text FROM documents d
         |  JOIN keepmin k ON d.doc_id = k.doc_id
         |  WHERE NOT EXISTS (SELECT 1 FROM drops x WHERE x.doc_id = d.doc_id)
         |    AND d.n_chars >= 20
         |    AND CAST(length(d.text) - length(regexp_replace(d.text, '[0-9]', '', 'g')) AS DOUBLE)
         |        / greatest(length(d.text), 1) < 0.3
         |    AND d.lang IN ($langList)),
         |smp AS (
         |  SELECT doc_id, text, md5('corpus|' || CAST(doc_id AS VARCHAR)) AS m FROM f)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|\\S')) AS INTEGER) AS n_tokens
         |FROM smp WHERE $hex16 % 100 < $DefaultSampleRate
         |ORDER BY doc_id""".stripMargin)
  }
}
