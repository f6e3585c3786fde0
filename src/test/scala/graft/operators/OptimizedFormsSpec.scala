package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-19 optimization-round equivalence pins: every contract query whose
  * PLAN was restructured this round is held row-for-row equal to its
  * round-18 form (the declared results may not change — the driver re-runs
  * every query against the DuckDB oracle, and the oracle SQL is untouched).
  * Comparisons collect both forms and compare ordered row seqs (each query
  * ends in a total ORDER BY / top-k, so order is part of the contract).
  */
class OptimizedFormsSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def assertEqualForms(opt: DataFrame, ref: DataFrame, tag: String): Unit = {
    val (o, r) = (rows(opt), rows(ref))
    assert(o.nonEmpty, s"$tag: optimized form returned no rows")
    assert(o == r, s"$tag: optimized form diverges from round-18 form:\n$o\nvs\n$r")
    assert(opt.schema == ref.schema,
      s"$tag: schema drift: ${opt.schema} vs ${ref.schema}")
  }

  test("q18: single-aggregation form == semi-join form (sf0.001 + sf0.01)") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01"))
      assertEqualForms(TpcH.q18(spark, dir), TpcH.q18SemiJoinForm(spark, dir),
        s"q18@$dir")
  }

  test("q21: window min/max form == semi+anti form (sf0.001 + sf0.01)") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01"))
      assertEqualForms(TpcH.q21(spark, dir), TpcH.q21SemiAntiForm(spark, dir),
        s"q21@$dir")
  }

  test("q13: aggregate-before-join form == join-then-aggregate form") {
    // the round-18 form inline: LEFT join the full orders fact onto
    // customer with the priority exclusion as a join condition, then count
    val ref = {
      val c = Tables.customer(spark, "/root/testdata/sf0.01")
      val o = Tables.orders(spark, "/root/testdata/sf0.01")
      c.join(o, col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT", "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }
    val opt = TpcH.q13(spark, "/root/testdata/sf0.01")
    val (o, r) = (rows(opt), rows(ref))
    assert(o.nonEmpty && o == r, s"q13 diverges:\n$o\nvs\n$r")
    // dtypes must hold (BIGINT c_count/custdist); nullability may differ
    // (sum is nullable where count was not) and the parquet/oracle lane is
    // nullability-blind, so compare dataTypes only
    assert(opt.schema.map(f => (f.name, f.dataType)) ==
      ref.schema.map(f => (f.name, f.dataType)),
      s"q13 dtype drift: ${opt.schema} vs ${ref.schema}")
  }

  test("q_unpivot: split-lane sum == direct Decimal(38,6) sum, bitwise") {
    val dir = "/root/testdata/sf0.01"
    val ref = Tables.lineitem(spark, dir)
      .unpivot(
        Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "value")
      .groupBy("measure")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
          .cast("double").as("sum_v"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .orderBy("measure")
    val opt = Relational4.qUnpivot(spark, dir)
    val (o, r) = (rows(opt), rows(ref))
    assert(o.nonEmpty && o == r, s"q_unpivot diverges:\n$o\nvs\n$r")
    assert(opt.schema.map(f => (f.name, f.dataType)) ==
      ref.schema.map(f => (f.name, f.dataType)),
      s"q_unpivot dtype drift: ${opt.schema} vs ${ref.schema}")
  }
}
