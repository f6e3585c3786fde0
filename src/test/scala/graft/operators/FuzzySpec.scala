package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Brute-force equivalence for the round-11 distinct-name funnel
  * (Relational4.qFuzzyBest / qFuzzyPairs): the rewrite's per-(block,name)
  * second-min/self-exclusion algebra is intricate, and the DuckDB oracle
  * only exercises it on the fixed 64-name fixture — this spec pins it
  * against a naive all-pairs reference on a RANDOM corpus that forces
  * every edge case: singleton blocks, all-same-name blocks, name groups
  * of size 1/2/3+ (the doc-IS-the-min-key branch needs cnt ≥ 2; ties on
  * dist need the smallest-key argmin), names both inside and outside the
  * τ=5 radius, and a block whose every candidate is beyond τ
  * (n_close = 0 but best_dist still defined). */
class FuzzySpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def writeCorpus(dir: String): Seq[(Long, String, String, Int)] = {
    val rnd = new scala.util.Random(17)
    // name pool with structure: near-dup clusters (distance <= 5 between
    // variants), far names (two long distinct strings beyond tau of
    // everything), and exact duplicates via repeated draws
    val pool = Seq(
      "small ring", "small rings", "smal ring", "large ring",
      "blue bolt", "blue bolts", "red bolt",
      "quux widget", "quux widgets",
      "zzzzzzzzzzzzzzzzzzzzzz", "qqqqqqqqqqkkkkkkkkkkkk")
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Int)]
    var key = 1L
    def add(brand: String, size: Int, name: String): Unit = {
      rows += ((key, name, brand, size)); key += 1
    }
    // random blocks with duplicate-heavy draws
    for (b <- Seq("B1", "B2", "B3"); sz <- 1 to 3; _ <- 0 until rnd.nextInt(12))
      add(b, sz, pool(rnd.nextInt(pool.length)))
    // forced edge cases
    add("B9", 9, "singleton block")               // block_n = 1: absent from output
    for (_ <- 0 until 4) add("B8", 8, "all same") // one name group, cnt = 4
    add("B7", 7, "zzzzzzzzzzzzzzzzzzzzzz")        // block where every dist > 5:
    add("B7", 7, "qqqqqqqqqqkkkkkkkkkkkk")        //   n_close = 0, best_dist > 5
    val df = spark.createDataFrame(rows.toSeq)
      .toDF("p_partkey", "p_name", "p_brand", "p_size")
      .withColumn("p_type", lit("t")).withColumn("p_retailprice", lit(1.0))
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    df.write.mode("overwrite").parquet(s"$dir/part.parquet")
    rows.toSeq
  }

  test("qFuzzyBest == all-pairs brute force on a random duplicate-heavy corpus") {
    val dir = java.nio.file.Files.createTempDirectory("fuzzyspec").toString
    val rows = writeCorpus(dir)
    val expected = rows.flatMap { case (k, n, b, s) =>
      val cands = rows.filter(r => r._3 == b && r._4 == s && r._1 != k)
      if (cands.isEmpty) None
      else {
        val encs = cands.map(r => (lev(n, r._2).toLong << 48) | r._1)
        val enc = encs.min
        Some((k, n, enc & ((1L << 48) - 1), (enc >> 48).toInt,
          cands.count(r => lev(n, r._2) <= 5).toLong, (cands.size + 1).toLong))
      }
    }.sortBy(_._1)
    val got = Relational4.qFuzzyBest(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(got == expected)
  }

  test("qFuzzyPairs == all-pairs brute force on the same corpus") {
    val dir = java.nio.file.Files.createTempDirectory("fuzzyspec2").toString
    val rows = writeCorpus(dir)
    val expected = (for {
      a <- rows; b <- rows
      if a._3 == b._3 && a._4 == b._4 && a._1 < b._1
      d = lev(a._2, b._2) if d <= 5
      bn = rows.count(r => r._3 == a._3 && r._4 == a._4).toLong
    } yield (a._1, b._1, a._2, b._2, d, bn, bn * (bn - 1) / 2))
      .sortBy(t => (t._1, t._2))
    val got = Relational4.qFuzzyPairs(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getInt(4), r.getLong(5), r.getLong(6)))
    assert(got == expected)
  }

  test("open-vocabulary name column fails loudly, not with a broadcast OOM (round 12)") {
    // round-11 advisor item: the funnel broadcasts a D² distance table, so
    // D past the cap must be a clear error pointing at the banded family
    val dir = java.nio.file.Files.createTempDirectory("fuzzyspec3").toString
    spark.range(Relational4.MaxFuzzyDistinctNames + 10)
      .selectExpr("id AS p_partkey", "concat('unique name ', id) AS p_name",
        "'B1' AS p_brand", "'t' AS p_type", "1 AS p_size",
        "1.0 AS p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val e = intercept[IllegalArgumentException](
      Relational4.qFuzzyPairs(spark, dir).collect())
    assert(e.getMessage.contains("MinHash"), e.getMessage)
  }
}
