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

  /** Tightest parseable type per string column, from one aggregation pass
    * over `sampleFraction` of the rows. */
  def inferFromStrings(df: DataFrame, cols: Seq[String],
                       sampleFraction: Double = 1.0): Map[String, DataType] = {
    val sampled = if (sampleFraction >= 1.0) df else df.sample(sampleFraction, seed = 42)
    val aggs = cols.flatMap { c =>
      count(col(c)).as(s"${c}__n") +:
        Ladder.zipWithIndex.map { case (t, i) =>
          count(try_cast(col(c), t)).as(s"${c}__t$i")
        }
    }
    val row = sampled.agg(aggs.head, aggs.tail: _*).head()
    cols.map { c =>
      val base = cols.indexOf(c) * (Ladder.size + 1)
      val n = row.getLong(base)
      val winner = Ladder.zipWithIndex
        .find { case (_, i) => n > 0 && row.getLong(base + 1 + i) == n }
        .map(_._1)
        .getOrElse(StringType)
      c -> winner
    }.toMap
  }

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
}
