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

  test("sampled inference + declared-schema read == full-inference read (the 100 TB path)") {
    // Both text-lane scaladocs name the production path — infer on a
    // SAMPLE, pin the result as a declared schema, read everything with
    // it — but nothing drove it (round-18 verdict item 6). This proves
    // the three-step equivalence on the fixture copy: sampled inference
    // lands the full-scan schema, and the declared-schema read (zero
    // inference scans) is value-identical to the full-inference read.
    val path = CsvSource.csvPart(spark, sf)
    def read(extra: (String, String)*) = {
      val r = spark.read.option("header", "true")
      extra.foldLeft(r)((acc, kv) => acc.option(kv._1, kv._2)).csv(path)
    }
    val full = read("inferSchema" -> "true")
    val sampled = read("inferSchema" -> "true", "samplingRatio" -> "0.2")
    assert(sampled.schema == full.schema,
      s"20% sampled inference must land the full-scan schema on a type-homogeneous " +
        s"table:\n${sampled.schema}\nvs\n${full.schema}")
    val declared = spark.read.option("header", "true").schema(sampled.schema).csv(path)
    val key = Seq("p_partkey")
    val a = full.orderBy((key ++ full.columns.toSeq).distinct.map(full(_)): _*).collect()
    val b = declared.orderBy((key ++ declared.columns.toSeq).distinct.map(declared(_)): _*).collect()
    assert(a.sameElements(b), "declared-schema read must be value-identical to full inference")
  }

  test("the sampling trap, pinned: a schema that missed a wider tail row NULLs it silently") {
    // The documented risk of sample-pinned schemas: a rare wider-typed
    // tail row the sample missed. The consequence is NOT an error — under
    // the default PERMISSIVE mode the unparseable cell lands NULL, i.e.
    // silent data loss. Deterministic form: read a file whose last row
    // holds "1.5" under the integer schema a tail-blind sample would pin.
    val rootP = java.nio.file.Files.createTempDirectory("graft_csv_trap")
    val root = rootP.toString
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/t.csv"), "v\n1\n2\n1.5\n")
      val full = spark.read.option("header", "true").option("inferSchema", "true")
        .csv(s"$root/t.csv")
      assert(full.schema.head.dataType.typeName == "double",
        s"full inference must widen to double: ${full.schema}")
      val narrow = StructType(Seq(StructField("v", IntegerType)))
      val pinned = spark.read.option("header", "true").schema(narrow)
        .csv(s"$root/t.csv").collect().map(_.get(0)).toSeq
      assert(pinned == Seq(1, 2, null),
        s"PERMISSIVE mode must land the unparseable tail as NULL (silently): $pinned")
    } finally graft.ScratchDirs.deleteRecursively(rootP)
  }
}
