package graft.sources

import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class JsonSourceSpec extends SparkSpec {

  test("q_json_scan infers bigint/timestamp/double and a NESTED struct, matching parquet row-for-row") {
    import org.apache.spark.sql.functions._
    val fromJson = JsonSource.qJsonScan(spark, sf)
    // the inferred/landed types are part of the contract (the oracle
    // compares against the parquet source's native types)
    assert(fromJson.schema("event_id").dataType == LongType, fromJson.schema.treeString)
    assert(fromJson.schema("ts").dataType == TimestampNTZType,
      s"ts must land as the star schema's NTZ convention, got ${fromJson.schema("ts").dataType}")
    assert(fromJson.schema("value").dataType == DoubleType)
    assert(fromJson.schema("prop_k").dataType == LongType,
      "the nested props.k must infer as bigint and project out of the struct")
    val fromParquet = graft.Tables.events(spark, sf)
      .withColumn("prop_k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("event_type") === "purchase" && col("prop_k") > 50)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"),
        col("prop_k"))
      .orderBy("event_id")
      .collect().map(_.toSeq).toSeq
    val got = fromJson.collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == fromParquet,
      "JSONL write -> infer -> read must round-trip values (micros included) and types exactly")
  }

  test("the nested props object is DISCOVERED as a struct, not read as a string") {
    // the shape CSV cannot exercise: spark.read.json must type props as
    // struct<k: bigint> from the text alone — nothing on the lane
    // declares it (the write side infers the sub-schema from the source
    // strings with spark.read.json too)
    val path = JsonSource.jsonEvents(spark, sf) // same registry entry the contract query uses
    val inferred = spark.read.json(path).schema
    inferred("props").dataType match {
      case s: StructType =>
        assert(s.fieldNames.sameElements(Array("k")) && s("k").dataType == LongType,
          s"expected struct<k: bigint>, got ${s.treeString}")
      case other => fail(s"props must infer as a nested struct, got $other")
    }
  }

  test("null fields are OMITTED on write: value round-trip safe, inference blind to always-null") {
    // The remaining scaladoc trap, proven: ignoreNullFields=true (the
    // default) drops null fields from each written line — reading back
    // yields null (round-trip SAFE per value), but a column that is null
    // on EVERY row leaves no trace in the text, so a schema inferred
    // from such data simply does not contain it. events is null-free, so
    // the contract hash is immune; a production JSONL lake pins the
    // inferred schema after first discovery for exactly this reason.
    import org.apache.spark.sql.functions._
    val root = graft.ScratchDirs.freshRoot("jsonnull", "spec")
    try {
      val path = s"$root/mixed"
      val df = spark.range(4).select(col("id"),
        when(col("id") === 2, lit(null).cast("string"))
          .otherwise(concat(lit("v"), col("id"))).as("sometimes"),
        lit(null).cast("string").as("always"))
      df.write.json(path)
      // the null row's line carries NO "sometimes" key (omitted, not "null")
      val lines = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".json"))
        .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq
      assert(lines.exists(l => !l.contains("sometimes")),
        s"a null field must be omitted from its line, got:\n${lines.mkString("\n")}")
      // value round-trip is safe under the DECLARED schema...
      val back = spark.read.schema(df.schema).json(path)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(back(2) == null && back(1) == "v1",
        s"omitted field must read back as null: $back")
      // ...but INFERENCE cannot see the always-null column at all
      val inferred = spark.read.json(path).schema
      assert(inferred.fieldNames.contains("sometimes"))
      assert(!inferred.fieldNames.contains("always"),
        s"an always-null column must be absent from the inferred schema: $inferred")
    } finally graft.ScratchDirs.deleteRecursively(root)
  }

  test("default JSON formats LOSE microseconds, and the pin must name the column's TYPE (NTZ)") {
    // The documented cross-engine trap (JsonSource scaladoc): Spark's
    // default JSON formats carry at most millis, AND the pinning option
    // is per timestamp type — for an NTZ column (events.ts),
    // `timestampFormat` is silently ignored; only `timestampNTZFormat`
    // takes effect. Both failure shapes are proven here.
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("ts", TimestampNTZType)))
    val micros = LocalDateTime.parse("2024-03-01T12:34:56.123456")
    val mk = () => spark.createDataFrame(
      java.util.Arrays.asList(Row(1, micros)), schema)
    val root = graft.ScratchDirs.freshRoot("jsonts", "spec")
    def readBack(path: String, opts: Map[String, String]): LocalDateTime =
      opts.foldLeft(spark.read)((r, kv) => r.option(kv._1, kv._2))
        .schema(schema).json(path)
        .collect().head.getAs[LocalDateTime](1)
    try {
      // default options: micros truncate to millis — lossy
      val dPath = s"$root/default"
      mk().write.json(dPath)
      val defaultBack = readBack(dPath, Map.empty)
      assert(defaultBack != micros && defaultBack.getNano == 123000000,
        s"default JSON round-trip must truncate micros to millis, got $defaultBack")
      // the WRONG pin: timestampFormat on an NTZ column is ignored
      val wPath = s"$root/wrongpin"
      mk().write.option("timestampFormat", JsonSource.TsFormat).json(wPath)
      val wrongBack = readBack(wPath, Map("timestampFormat" -> JsonSource.TsFormat))
      assert(wrongBack != micros && wrongBack.getNano == 123000000,
        s"timestampFormat must NOT apply to an NTZ column (still lossy), got $wrongBack")
      // the RIGHT pin: 6-digit timestampNTZFormat round-trips exactly
      val pPath = s"$root/pinned"
      mk().write.option("timestampNTZFormat", JsonSource.TsFormat).json(pPath)
      val pinnedBack = readBack(pPath, Map("timestampNTZFormat" -> JsonSource.TsFormat))
      assert(pinnedBack == micros,
        s"pinned 6-digit NTZ format must round-trip micros exactly, got $pinnedBack")
    } finally graft.ScratchDirs.deleteRecursively(root)
  }

  test("sampled inference + declared-schema read == full-inference read (the 100 TB path)") {
    // Round-18 verdict item 6, JSON side — and the harder one: the schema
    // carries a NESTED struct and opt-in timestamp inference, both of
    // which the sampled pass must land identically before pinning.
    val path = JsonSource.jsonEvents(spark, sf)
    def read(extra: (String, String)*) = {
      val r = spark.read
        .option("inferTimestamp", "true")
        .option("timestampFormat", JsonSource.TsFormat)
        .option("timestampNTZFormat", JsonSource.TsFormat)
      extra.foldLeft(r)((acc, kv) => acc.option(kv._1, kv._2)).json(path)
    }
    val full = read()
    val sampled = read("samplingRatio" -> "0.2")
    assert(sampled.schema == full.schema,
      s"20% sampled inference must land the full schema (nested struct + timestamp " +
        s"included):\n${sampled.schema}\nvs\n${full.schema}")
    val declared = spark.read
      .option("timestampFormat", JsonSource.TsFormat)
      .option("timestampNTZFormat", JsonSource.TsFormat)
      .schema(sampled.schema).json(path)
    val a = full.orderBy(full("event_id")).collect()
    val b = declared.orderBy(declared("event_id")).collect()
    assert(a.sameElements(b), "declared-schema read must be value-identical to full inference")
  }

  test("the sampling trap, pinned: a field the sample never saw VANISHES silently") {
    // JSON's version of the tail-row trap is worse than CSV's NULL: a
    // rare field absent from every sampled record is absent from the
    // pinned schema, and every later occurrence is silently DROPPED on
    // read — no null placeholder, no error. Deterministic form: read
    // with the schema a tail-blind sample would pin.
    val rootP = java.nio.file.Files.createTempDirectory("graft_json_trap")
    val root = rootP.toString
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/t.json"),
        """{"a":1}
          |{"a":2}
          |{"a":3,"b":"rare"}
          |""".stripMargin)
      val full = spark.read.json(s"$root/t.json")
      assert(full.schema.fieldNames.toSeq == Seq("a", "b"),
        s"full inference must see the tail field: ${full.schema}")
      val pinned = spark.read.schema(StructType(Seq(StructField("a", LongType))))
        .json(s"$root/t.json")
      assert(pinned.schema.fieldNames.toSeq == Seq("a"),
        "the sample-pinned schema silently drops the unseen field")
      assert(pinned.count() == 3,
        "every row still reads cleanly — the loss is invisible without a schema diff")
    } finally graft.ScratchDirs.deleteRecursively(rootP)
  }
}
