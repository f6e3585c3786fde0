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

  test("partitionBy parquet sink is partition-PRUNED on read (100 TB layout)") {
    val base = Files.createTempDirectory("graft_part").toString
    val docs = graft.Tables.documents(spark, sf)
    docs.write.partitionBy("lang").parquet(s"$base/by_lang")
    val rd = spark.read.parquet(s"$base/by_lang").filter(col("lang") === "en")
    // the filter must prune at the PARTITION level (directory skip), not as
    // a row predicate after reading everything
    val plan = rd.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val partFilters = plan.linesIterator.find(_.trim.startsWith("PartitionFilters:")).get
    assert(partFilters.contains("lang"), partFilters)
    assert(rd.count() == docs.filter(col("lang") === "en").count())
    // and the partition column round-trips as data
    assert(rd.select("doc_id").distinct().count() == rd.count())
  }

  test("bucketed table co-locates the join (no exchange on the bucketed side)") {
    // bucketing is THE pre-shuffle device for repeated big joins: write both
    // sides bucketed by the key into the warehouse, join without exchanges
    spark.sql("DROP TABLE IF EXISTS g_orders_b")
    spark.sql("DROP TABLE IF EXISTS g_cust_b")
    graft.Tables.orders(spark, sf).write
      .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("g_orders_b")
    graft.Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey").write
      .bucketBy(4, "o_custkey").saveAsTable("g_cust_b")
    val joined = spark.table("g_orders_b").join(spark.table("g_cust_b"), "o_custkey")
      .groupBy("o_custkey").count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join must not shuffle either side:\n" + plan)
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS g_orders_b")
    spark.sql("DROP TABLE IF EXISTS g_cust_b")
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
