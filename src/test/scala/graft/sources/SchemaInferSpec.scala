package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

class SchemaInferSpec extends SparkSpec {

  test("csv inferSchema recovers long/double/string/timestamp columns") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "t.csv")
    Files.writeString(f.toPath,
      """id,price,name,when
        |1,1.5,alpha,2024-01-01T00:00:00
        |2,2.25,beta,2024-01-02T12:30:00
        |""".stripMargin)
    val schema = SchemaInfer.inferCsv(spark, f.getAbsolutePath)
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("id") == IntegerType || types("id") == LongType)
    assert(types("price") == DoubleType)
    assert(types("name") == StringType)
    assert(types("when").isInstanceOf[TimestampType.type] ||
      types("when").isInstanceOf[TimestampNTZType.type])
  }

  test("json inference recovers nested structure") {
    val dir = Files.createTempDirectory("graft_json").toFile
    val f = new java.io.File(dir, "t.json")
    Files.writeString(f.toPath,
      """{"a": 1, "b": {"c": "x", "d": 2.5}}
        |{"a": 2, "b": {"c": "y", "d": 3.5}}
        |""".stripMargin)
    val schema = SchemaInfer.inferJson(spark, f.getAbsolutePath)
    assert(schema("a").dataType == LongType)
    val b = schema("b").dataType.asInstanceOf[StructType]
    assert(b("c").dataType == StringType)
    assert(b("d").dataType == DoubleType)
  }

  test("tightest-type inference over string columns") {
    import spark.implicits._
    val df = Seq(
      ("1", "1.5", "true", "2024-01-01 00:00:00", "abc", "1"),
      ("2", "2", "false", "2024-06-30 10:00:00", "1x", "2.5"),
      (null, "3.25", null, null, "z", "xyz"))
      .toDF("longs", "doubles", "bools", "tss", "strs", "mixed")
    val inferred = SchemaInfer.inferFromStrings(df, df.columns.toSeq)
    assert(inferred("longs") == LongType)
    assert(inferred("doubles") == DoubleType)
    assert(inferred("bools") == BooleanType)
    assert(inferred("tss") == TimestampNTZType)
    assert(inferred("strs") == StringType)
    assert(inferred("mixed") == StringType) // "xyz" defeats numeric
  }

  test("long rung rejects out-of-range digit strings (overflow falls to double)") {
    import spark.implicits._
    val df = Seq(
      // 26-digit ID: syntactically integer, numerically > Long.MaxValue
      ("99999999999999999999999999", "9223372036854775807", "-9223372036854775808"),
      ("12345678901234567890", "42", "-1"),
      // leading zeros must not defeat the length check (value fits)
      ("00000000000000000000000001", "0000123", "-000009223372036854775808"))
      .toDF("overflow", "max_ok", "min_ok")
    val inferred = SchemaInfer.inferFromStrings(df, df.columns.toSeq)
    // overflow column: regex matches but range check fails -> DoublePattern
    // catches plain digits, so it lands on double (the old try_cast
    // behavior), NOT a bigint whose cast would null every row
    assert(inferred("overflow") == DoubleType)
    assert(inferred("max_ok") == LongType)   // boundary values inclusive
    assert(inferred("min_ok") == LongType)
    // one past the boundary is rejected
    val edge = Seq(("9223372036854775808", "-9223372036854775809")).toDF("pos", "neg")
    val e = SchemaInfer.inferFromStrings(edge, edge.columns.toSeq)
    assert(e("pos") == DoubleType)
    assert(e("neg") == DoubleType)
  }

  test("schema evolution: vintages union under the merged superset schema") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("evolve").toString
    // v1 writer: (doc_id, text); v2 writer adds a lang column
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$base/v1")
    Seq((3L, "gamma", "en"), (4L, "delta", "fr")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$base/v2")
    val merged = SchemaInfer.readEvolved(spark, s"$base/v1", s"$base/v2")
    assert(merged.columns.sorted.toSeq == Seq("doc_id", "lang", "text"))
    val rows = merged.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("lang"))).toMap
    assert(rows.size == 4, "every vintage's rows present")
    assert(rows(1L).isEmpty && rows(2L).isEmpty, "pre-evolution rows carry null lang")
    assert(rows(3L).contains("en") && rows(4L).contains("fr"))
  }

  test("applyInferred casts in place") {
    import spark.implicits._
    val df = Seq(("1", "x"), ("2", "y")).toDF("n", "s")
    val out = SchemaInfer.applyInferred(df, SchemaInfer.inferFromStrings(df, Seq("n", "s")))
    assert(out.schema("n").dataType == LongType)
    assert(out.schema("s").dataType == StringType)
    assert(out.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0) == 3L)
  }
}
