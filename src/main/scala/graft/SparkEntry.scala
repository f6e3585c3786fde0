package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query/oracle maps. Every `queries` key has a
  * matching DuckDB `oracleSql` entry unless the operator is not
  * SQL-expressible (those are covered by ScalaTest/property specs instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core pipeline: quantile-tokenize the lineitem measures
    * via the scale-path two-phase boundary tokenizer. */
  def entry(spark: SparkSession): DataFrame =
    Tokenize.queries("q_tokenize_bucketize")(spark, "/root/testdata/sf0.001")

  // private[graft] so EntrySpec counts THE list (a hand-copied module
  // list in the spec drifted the moment OrcSource landed — round 15)
  private[graft] val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Tokenize.queries, Tokenize.oracleSql),
      (Relational.queries, Relational.oracleSql),
      (RelationalExt.queries, RelationalExt.oracleSql),
      (Relational3.queries, Relational3.oracleSql),
      (TpcH.queries, TpcH.oracleSql),
      (TypedOps.queries, TypedOps.oracleSql),
      (EventOps.queries, EventOps.oracleSql),
      (TextOps.queries, TextOps.oracleSql),
      (Dedup.queries, Dedup.oracleSql),
      (Similarity.queries, Similarity.oracleSql),
      (PipelineOps.queries, PipelineOps.oracleSql),
      (TrainPrep.queries, TrainPrep.oracleSql),
      (QualityOps.queries, QualityOps.oracleSql),
      (Relational4.queries, Relational4.oracleSql),
      (Layout.queries, Layout.oracleSql),
      (Bucketed.queries, Bucketed.oracleSql),
      (Graph.queries, Graph.oracleSql),
      (graft.multimodal.Multimodal.queries, graft.multimodal.Multimodal.oracleSql),
      (CorpusPipeline.queries, CorpusPipeline.oracleSql),
      (graft.sources.SchemaInfer.queries, graft.sources.SchemaInfer.oracleSql),
      (graft.sources.OrcSource.queries, graft.sources.OrcSource.oracleSql),
      (graft.sources.CsvSource.queries, graft.sources.CsvSource.oracleSql),
      (graft.sources.JsonSource.queries, graft.sources.JsonSource.oracleSql),
      (graft.streaming.StreamOps.queries, graft.streaming.StreamOps.oracleSql)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)

  /** The static map plus per-dir DYNAMIC entries whose SQL embeds model
    * state trained from `dir`'s data (q_ann_pq's codebook literals —
    * round-18 verdict item 1). `Verify` dumps this, not `oracleSql`,
    * because it knows the dir being verified; the static map remains the
    * dir-independent contract surface. */
  def oracleSqlFor(spark: SparkSession, dir: String): Map[String, String] =
    oracleSql ++ Similarity.dynamicOracleSql(spark, dir)
}
