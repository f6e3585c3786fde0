package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed Dataset[T] surface (SURVEY §1.4): case-class rows + a custom
  * `Aggregator[IN, BUF, OUT]` — the UDAF row of the §2B checklist (the
  * reference's only custom-compute escape hatch is its Numba kernel,
  * etl_benchmark_numba.py:39-50; an Aggregator is the Spark-native typed
  * equivalent).
  *
  * Determinism: revenue is accumulated as exact integer MICROS (the per-row
  * value price*(1-disc) sits on a 4-decimal grid, so rint(x*1e6) is exact);
  * long addition is associative, so the result is independent of partition
  * merge order and hash-matches the oracle.
  */
object TypedOps {

  case class Line(l_orderkey: Long, l_quantity: Double, l_extendedprice: Double,
                  l_discount: Double, l_returnflag: String)

  /** (revenue_micros, row_count) buffer. */
  object RevenueAgg extends Aggregator[Line, (Long, Long), (Double, Long)] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: Line): (Long, Long) = {
      val micros = math.rint(a.l_extendedprice * (1.0 - a.l_discount) * 1e6).toLong
      (b._1 + micros, b._2 + 1)
    }
    override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(b: (Long, Long)): (Double, Long) = (b._1 / 1e6, b._2)
    override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  }

  /** Typed pipeline: Dataset[Line] -> groupByKey -> custom Aggregator. */
  def qTypedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag")
      .as[Line]
    ds.groupByKey(_.l_returnflag)
      .agg(RevenueAgg.toColumn.name("rev"))
      .select(col("key").as("l_returnflag"),
        col("rev._1").as("revenue"), col("rev._2").as("n"))
      .orderBy("l_returnflag")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_typed_agg" -> qTypedAgg
  )

  def oracleSql: Map[String, String] = Map(
    "q_typed_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 1e6) AS BIGINT)) AS BIGINT) / 1e6 AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
