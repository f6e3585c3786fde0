package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** CSV as a TEXT source format on the oracle lane (round 16 — the format
  * axis after parquet and ORC; Avro is out: `/opt/spark/jars` carries no
  * spark-avro connector). This is the repo title's capability — schema
  * INFERENCE — exercised on an actual text format: the contract query
  * reads a derived CSV copy of `part` with `inferSchema=true`, so the
  * types the engine computes with are DISCOVERED from the text, not
  * declared, and the DuckDB oracle reads the SOURCE parquet — the hash
  * meeting proves write → infer → read round-trips every value AND every
  * type choice bit-exactly. The reference's inference-adjacent behavior
  * is schema-on-read only (`pd.read_parquet`, `etl_benchmark.py:27` —
  * parquet is self-describing); inference from schemaless TEXT is this
  * engine's extension beyond it.
  *
  * Cross-engine traps, handled by CONSTRUCTION here and documented for
  * the general case:
  *  - Null literal: Spark writes null as "" and reads "" back as null
  *    only for non-string types, while an empty STRING field round-trips
  *    as "" — a lossy corner (null vs empty string collapse) every
  *    CSV-backed lake must pin with explicit `nullValue`/`emptyValue`
  *    options. `part` is null-free, so the contract hash is immune; the
  *    spec pins the option-contract separately.
  *  - Date/timestamp sniffing: inference may type "1995-01-02" DATE on
  *    one engine and VARCHAR on another (format-dependent); `part` has no
  *    temporal columns, and the engine's date-bearing formats read with
  *    declared schemas (the ORC/parquet lanes) — a production CSV drop
  *    pins `dateFormat` + a declared schema after first inference.
  *  - Doubles: Spark writes `Double.toString` (shortest form that
  *    round-trips) and inference reads it back to the identical bits, so
  *    p_retailprice survives exactly.
  *
  * Scale: inference is an EXTRA full scan before the real one — the
  * price of schema-on-read. A 100 TB deployment runs inference once
  * (or on a sample), pins the result as a declared schema, and reads
  * data with it thereafter; the derived-layout registry here re-infers
  * per query call precisely because the inference IS the thing under
  * test. The CSV copy itself is a fixture artifact (the Bucketed/Layout
  * registry convention: built once per (context, dir),
  * fingerprint-validated against the source parquet, per-process
  * scratch); at 100 TB nothing is copied — vendor drops already arrive
  * as CSV next to the parquet fact tables.
  */
object CsvSource {

  private[sources] def csvPart(spark: SparkSession, dir: String): String =
    DerivedCopy(spark, dir, "csv", "part", "CsvSource.csvPart") { path =>
      graft.Tables.part(spark, dir)
        .write.mode(SaveMode.Overwrite)
        .option("header", "true")
        .csv(path)
    }

  /** Heavyweight-container part lookup read FROM CSV with INFERRED
    * types: `inferSchema=true` discovers integer/double/string types
    * from the text (p_partkey/p_size land as INT, p_retailprice as
    * DOUBLE — the oracle CASTs the parquet source to the same types, so
    * the hash also gates the inference's type choices). Both predicates
    * are pushed to the CSV scan (`PushedFilters`; since SPARK-30323 the
    * CSV parser skips non-matching rows before row construction) and
    * only the referenced columns are parsed (column pruning reaches the
    * text parser — unreferenced fields are never converted), both
    * plan-asserted in PlanSpec. Row-level output: every surviving value
    * is hash-compared, the strongest round-trip gate. */
  def qCsvScan(spark: SparkSession, dir: String): DataFrame = {
    val path = csvPart(spark, dir)
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)
      .filter(col("p_type") === "PROMO" && col("p_size") > 25)
      .select(col("p_partkey"), col("p_name"), col("p_size"), col("p_retailprice"))
      .orderBy("p_partkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_csv_scan" -> qCsvScan
  )

  /** Oracle reads the SOURCE parquet with the INFERRED types — the CSV
    * copy must round-trip values and the inference must pick the same
    * types for the hashes to meet. */
  def oracleSql: Map[String, String] = Map(
    "q_csv_scan" ->
      """SELECT CAST(p_partkey AS INTEGER) AS p_partkey, p_name,
        |       CAST(p_size AS INTEGER) AS p_size,
        |       CAST(p_retailprice AS DOUBLE) AS p_retailprice
        |FROM part
        |WHERE p_type = 'PROMO' AND p_size > 25
        |ORDER BY p_partkey""".stripMargin
  )
}
