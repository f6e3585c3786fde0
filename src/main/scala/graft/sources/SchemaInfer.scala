package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema inference — the generalized form of the reference repo's title
  * capability. The reference's "schema inference" is parquet
  * footer-self-description (/root/reference/etl_benchmark.py:27, SURVEY
  * §1.3); for schemaless formats we expose Spark's samplers plus a custom
  * single-pass tightest-type inferencer for string columns.
  *
  * Scale: `inferFromStrings` is ONE aggregation over (a sample of) the data
  * — count parse-successes per candidate type with `try_cast` (codegen'd,
  * null on failure), then pick the tightest type whose success count covers
  * every non-null value. No driver-side row loops.
  */
object SchemaInfer {

  def inferCsv(spark: SparkSession, path: String): StructType =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path).schema

  def inferJson(spark: SparkSession, path: String): StructType =
    spark.read.json(path).schema

  /** Candidate ladder, tightest first. */
  private val Ladder: Seq[DataType] =
    Seq(LongType, DoubleType, BooleanType, TimestampNTZType, DateType)

  /** Spark-ANSI-compatible integer strings (optional sign, digits, outer
    * whitespace trimmed). Shared verbatim with the DuckDB oracle. */
  val LongPattern = "^[+-]?[0-9]+$"

  /** Decimal/scientific doubles. Deliberately EXCLUDES 'NaN'/'Infinity'
    * (a column made of those should not infer numeric) — a documented
    * narrowing of Spark's cast grammar. Shared verbatim with the oracle. */
  val DoublePattern = "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"

  /** Spark's StringUtils true/false string set. */
  val BoolStrings: Seq[String] =
    Seq("t", "true", "y", "yes", "1", "f", "false", "n", "no", "0")

  /** Does `c` parse at ladder rung `t`? All rungs are NON-THROWING: regex /
    * IN-list for long, double, boolean; Spark's Option-based datetime
    * parsers (via try_cast) for timestamp and date. The first version used
    * try_cast for the numeric rungs too — TRY-mode numeric casts unwind an
    * exception per failing row, which at sf0.1 turned this one aggregation
    * into a 30-second query; the predicate form is ~20x cheaper and, as a
    * bonus, byte-for-byte reproducible in the DuckDB oracle (whose TRY_CAST
    * rounds '1.5' to BIGINT 2 where Spark rejects it). */
  /** abs(Long.MinValue) / Long.MaxValue as digit strings, for the
    * overflow guard below. */
  private val MaxNegDigits = "9223372036854775808"
  private val MaxPosDigits = "9223372036854775807"

  /** In-range check for a string already known to match [[LongPattern]]:
    * strip sign and leading zeros, then length/lexicographic compare
    * against Long.MaxValue's digits (pure string ops — non-throwing,
    * cheap, and written identically in the DuckDB oracle). Without this,
    * a 20-digit ID column would "parse" as bigint and applyInferred's
    * non-ANSI cast would null every value — silent data loss. */
  private def longInRange(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val digits = regexp_replace(c, "^[+-]?0*", "")
    length(digits) < 19 ||
      (length(digits) === 19 &&
        when(c.startsWith("-"), digits <= MaxNegDigits)
          .otherwise(digits <= MaxPosDigits))
  }

  private def parses(c: org.apache.spark.sql.Column, t: DataType): org.apache.spark.sql.Column = t match {
    case LongType         => regexp_like(trim(c), lit(LongPattern)) && longInRange(trim(c))
    case DoubleType       => regexp_like(trim(c), lit(DoublePattern))
    case BooleanType      => lower(trim(c)).isin(BoolStrings: _*)
    case TimestampNTZType => try_cast(c, TimestampNTZType).isNotNull
    case DateType         => try_cast(c, DateType).isNotNull
    case _                => lit(true)
  }

  /** Full inference report — (inferred tightest type, nullable) per string
    * column — from ONE aggregation pass over `sampleFraction` of the rows.
    * Nullable = the column had at least one null in the (sampled) data. */
  def inferReport(df: DataFrame, cols: Seq[String],
                  sampleFraction: Double = 1.0): Seq[(String, DataType, Boolean)] = {
    val sampled = if (sampleFraction >= 1.0) df else df.sample(sampleFraction, seed = 42)
    val per = Ladder.size + 1
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      count(col(c)).as(s"${c}__n") +:
        Ladder.zipWithIndex.map { case (t, i) =>
          count(when(parses(col(c), t), 1)).as(s"${c}__t$i")
        }
    }
    val row = sampled.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getLong(0)
    cols.zipWithIndex.map { case (c, ci) =>
      val base = 1 + ci * per
      val n = row.getLong(base)
      val winner = Ladder.zipWithIndex
        .find { case (_, i) => n > 0 && row.getLong(base + 1 + i) == n }
        .map(_._1)
        .getOrElse(StringType)
      (c, winner, n < total)
    }
  }

  /** Tightest parseable type per string column, from one aggregation pass
    * over `sampleFraction` of the rows. */
  def inferFromStrings(df: DataFrame, cols: Seq[String],
                       sampleFraction: Double = 1.0): Map[String, DataType] =
    inferReport(df, cols, sampleFraction).map { case (c, t, _) => c -> t }.toMap

  private def try_cast(c: org.apache.spark.sql.Column, t: DataType): org.apache.spark.sql.Column =
    c.try_cast(t.sql)

  /** Apply inferred types: returns df with string columns cast to their
    * tightest parseable type. */
  /** Schema-evolution read: union parquet directories written at different
    * schema versions into one frame with the merged (superset) schema —
    * rows from older files carry null in the columns they predate. This is
    * the ingest posture a long-lived 100 TB corpus needs: writers add
    * columns over time and readers must keep consuming every vintage
    * without a rewrite (`mergeSchema` pays a footer read per file, so at
    * scale the merged schema would be pinned in a catalog; semantics are
    * identical). */
  def readEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  def applyInferred(df: DataFrame, inferred: Map[String, DataType]): DataFrame =
    df.select(df.columns.map { c =>
      inferred.get(c).filter(_ != StringType)
        .map(t => col(c).cast(t).as(c)).getOrElse(col(c))
    }.toSeq: _*)

  /** Engine-neutral label for the contract query's output. */
  private def label(t: DataType): String = t match {
    case LongType         => "bigint"
    case DoubleType       => "double"
    case BooleanType      => "boolean"
    case TimestampNTZType => "timestamp"
    case DateType         => "date"
    case _                => "string"
  }

  /** Contract query for the reference's TITLE capability (schema inference,
    * /root/reference/etl_benchmark.py:27): render five lineitem columns to
    * strings — a schemaless ingest stand-in, same shape as a headerless CSV
    * — and emit (column_name, inferred_type, nullable) from the one-pass
    * tightest-type ladder. The DuckDB oracle re-implements the ladder with
    * SPARK's ANSI parse semantics (digit-regex for longs, the exact
    * true/false string set for booleans): DuckDB's native TRY_CAST rounds
    * '1.5' to BIGINT 2 where Spark ANSI rejects it, so counts are emulated
    * rather than TRY_CAST everywhere. The winner per column is therefore
    * engine-deterministic and fully hash-checkable. */
  def qSchemaInfer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, dir).select(
      col("l_orderkey").cast("string").as("c_orderkey"),
      col("l_linenumber").cast("string").as("c_linenumber"),
      col("l_quantity").cast("string").as("c_quantity"),
      col("l_returnflag").cast("string").as("c_returnflag"),
      col("l_shipdate").cast("string").as("c_shipdate"))
    inferReport(li, li.columns.toSeq)
      .map { case (c, t, nul) => (c, label(t), nul) }
      .toDF("column_name", "inferred_type", "nullable")
      .orderBy("column_name")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_schema_infer" -> qSchemaInfer
  )

  /** The ladder in CASE order, with Spark-ANSI parse emulation (see
    * [[qSchemaInfer]]). Only winner-equality matters, so rungs BELOW each
    * column's winner may diverge between engines without affecting the
    * hash. */
  def oracleSql: Map[String, String] = {
    val cols = Seq("c_orderkey", "c_linenumber", "c_quantity", "c_returnflag", "c_shipdate")
    val boolList = BoolStrings.map(s => s"'$s'").mkString(",")
    // Same overflow guard as the Spark rung (longInRange), same string ops.
    def longOk(c: String): String = {
      val d = s"regexp_replace(trim($c), '^[+-]?0*', '')"
      s"""(len($d) < 19 OR (len($d) = 19 AND
         |     CASE WHEN starts_with(trim($c), '-') THEN $d <= '$MaxNegDigits'
         |          ELSE $d <= '$MaxPosDigits' END))""".stripMargin
    }
    def perCol(c: String): String =
      s"""COUNT($c) AS ${c}_n,
         |  COUNT(CASE WHEN regexp_matches(trim($c), '$LongPattern') AND ${longOk(c)} THEN 1 END) AS ${c}_long,
         |  COUNT(CASE WHEN regexp_matches(trim($c), '$DoublePattern') THEN 1 END) AS ${c}_dbl,
         |  COUNT(CASE WHEN lower(trim($c)) IN ($boolList) THEN 1 END) AS ${c}_bool,
         |  COUNT(TRY_CAST($c AS TIMESTAMP)) AS ${c}_ts,
         |  COUNT(TRY_CAST($c AS DATE)) AS ${c}_date""".stripMargin
    def verdict(c: String): String =
      s"""SELECT '$c' AS column_name,
         |  CASE WHEN ${c}_n > 0 AND ${c}_long = ${c}_n THEN 'bigint'
         |       WHEN ${c}_n > 0 AND ${c}_dbl  = ${c}_n THEN 'double'
         |       WHEN ${c}_n > 0 AND ${c}_bool = ${c}_n THEN 'boolean'
         |       WHEN ${c}_n > 0 AND ${c}_ts   = ${c}_n THEN 'timestamp'
         |       WHEN ${c}_n > 0 AND ${c}_date = ${c}_n THEN 'date'
         |       ELSE 'string' END AS inferred_type,
         |  ${c}_n < total AS nullable
         |FROM counts""".stripMargin
    Map(
      "q_schema_infer" ->
        s"""WITH s AS (
           |  SELECT CAST(l_orderkey AS VARCHAR) AS c_orderkey,
           |         CAST(l_linenumber AS VARCHAR) AS c_linenumber,
           |         CAST(l_quantity AS VARCHAR) AS c_quantity,
           |         CAST(l_returnflag AS VARCHAR) AS c_returnflag,
           |         CAST(l_shipdate AS VARCHAR) AS c_shipdate
           |  FROM lineitem),
           |counts AS (SELECT COUNT(*) AS total,
           |  ${cols.map(perCol).mkString(",\n  ")}
           |FROM s)
           |${cols.map(verdict).mkString("\nUNION ALL\n")}
           |ORDER BY column_name""".stripMargin
    )
  }
}
