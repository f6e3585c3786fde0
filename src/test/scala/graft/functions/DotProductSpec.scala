package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DotProductSpec extends SparkSpec {

  test("codegen'd dot product is bit-identical to the HOF formulation") {
    val e = graft.Tables.embeddings(spark, sf)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val rows = e.select(
      DotProductExpr.dot(col("embedding"), col("embedding")).as("expr"),
      hof.as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
  }

  test("interpreted eval agrees with codegen") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val out = df.select(DotProductExpr.dot(col("a"), col("b"))).head().getDouble(0)
    assert(out == 32.0)
    // unequal lengths: zip semantics (shorter wins)
    val df2 = Seq((Array(1.0f, 2.0f), Array(10.0f))).toDF("a", "b")
    assert(df2.select(DotProductExpr.dot(col("a"), col("b"))).head().getDouble(0) == 10.0)
  }

  test("null array yields null") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(DotProductExpr.dot(col("a"), col("b"))).head().isNullAt(0))
  }
}
