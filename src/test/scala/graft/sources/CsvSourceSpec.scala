package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.SparkSpec

class CsvSourceSpec extends SparkSpec {

  test("q_csv_scan infers int/int/double and matches the parquet source row-for-row") {
    import org.apache.spark.sql.functions._
    val fromCsv = CsvSource.qCsvScan(spark, sf)
    // the inferred types are part of the contract (the oracle CASTs to them)
    assert(fromCsv.schema("p_partkey").dataType == IntegerType, fromCsv.schema.treeString)
    assert(fromCsv.schema("p_size").dataType == IntegerType)
    assert(fromCsv.schema("p_retailprice").dataType ==
      org.apache.spark.sql.types.DoubleType)
    val fromParquet = graft.Tables.part(spark, sf)
      .filter(col("p_type") === "PROMO" && col("p_size") > 25)
      .select(col("p_partkey").cast("int"), col("p_name"),
        col("p_size"), col("p_retailprice"))
      .orderBy("p_partkey")
      .collect().map(_.toSeq).toSeq
    val got = fromCsv.collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == fromParquet,
      "CSV write -> infer -> read must round-trip values and types exactly")
  }

  test("CSV null/empty-string collapse and the option-contract that pins it") {
    // The documented cross-engine trap (CsvSource scaladoc): with default
    // options Spark writes null as "" and reads "" back as null, so a
    // STRING column cannot tell null from empty after a round-trip — and
    // the fix every CSV-backed lake ships is an explicit nullValue
    // sentinel distinct from the empty string (emptyValue defaults to ""
    // on write and is read back as "" once nullValue no longer claims it).
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("s", StringType)))
    val rows = java.util.Arrays.asList(
      Row(1, "x"), Row(2, null), Row(3, ""))
    val df = spark.createDataFrame(rows, schema)
    val root = graft.ScratchDirs.freshRoot("csvnull", "spec")
    try {
      // default options: null and "" COLLAPSE (both come back null —
      // lossy, which is why part's null-free columns make q_csv_scan's
      // hash immune and why this lane documents rather than hides it)
      val dPath = s"$root/default"
      df.write.option("header", "true").csv(dPath)
      val defaults = spark.read.option("header", "true").schema(schema).csv(dPath)
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(defaults(2) == null && defaults(3) == null,
        s"default CSV options collapse null and empty string: $defaults")
      // pinned options: a distinct nullValue sentinel keeps them apart
      val pPath = s"$root/pinned"
      df.write.option("header", "true").option("nullValue", "\\N")
        .option("emptyValue", "\"\"").csv(pPath)
      val pinned = spark.read.option("header", "true").option("nullValue", "\\N")
        .schema(schema).csv(pPath)
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(pinned(1) == "x" && pinned(2) == null && pinned(3) == "",
        s"nullValue/emptyValue must keep null and \"\" distinct: $pinned")
    } finally graft.ScratchDirs.deleteRecursively(root)
  }
}
