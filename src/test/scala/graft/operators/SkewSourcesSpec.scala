package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSourcesSpec extends SparkSpec {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key
    val large = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(999L)).as("k"),
        col("id").as("payload"))
    val small = Seq((0L, "a"), (1L, "b"), (999L, "hot"), (5L, "x")).toDF("k", "tag")
    val plain = large.join(small, "k").select("k", "payload", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = SkewJoin.saltedInnerJoin(large, small, "k", salt = 8)
      .select("k", "payload", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }

  test("csv/json/orc sinks round-trip the star schema sample") {
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val n = li.count()
    val base = Files.createTempDirectory("graft_sinks").toString
    // csv
    li.write.option("header", "true").csv(s"$base/csv")
    val csv = spark.read.option("header", "true").option("inferSchema", "true").csv(s"$base/csv")
    assert(csv.count() == n)
    assert(csv.agg(sum("l_quantity")).head().getDouble(0) ==
      li.agg(sum("l_quantity")).head().getDouble(0))
    // json
    li.write.json(s"$base/json")
    assert(spark.read.json(s"$base/json").count() == n)
    // orc
    li.write.orc(s"$base/orc")
    val orc = spark.read.orc(s"$base/orc")
    assert(orc.count() == n)
    assert(orc.schema("l_quantity").dataType == org.apache.spark.sql.types.DoubleType)
  }
}
