package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("reference-parity pipeline: generate -> bounds -> tokenize -> sink") {
    val dir = Files.createTempDirectory("graft_pipeline").toString
    val (n, timings) = Pipeline.run(spark, dir, rows = 50000, cols = 4)
    assert(n == 50000)
    assert(timings.keySet ==
      Set("jvm_warmup", "generate", "scan", "boundaries", "tokenize+sink"))
    val tokens = spark.read.parquet(s"$dir/tokens.parquet")
    assert(tokens.columns.toSeq == (0 until 4).map(i => s"col_${i}_token"))
    val mm = tokens.agg(
      min(col("col_0_token")), max(col("col_0_token"))).head()
    assert(mm.getInt(0) == 0 && mm.getInt(1) == 99)
    // near-uniform mass on continuous data
    val counts = tokens.groupBy("col_0_token").count().collect().map(_.getLong(1))
    assert(counts.length == 100 && counts.max < 2 * 500 && counts.min > 250)
  }

  test("sample-mode boundaries degenerate to exact when the sample covers the data") {
    // sampleSize (1M default) >= rows => fraction 1.0 => the sampled path
    // IS an exact sort — bounds must be bit-identical to selection's
    val dir = Files.createTempDirectory("graft_sample").toString
    Pipeline.writeIgnore(Pipeline.syntheticTable(spark, 20000, 3), s"$dir/massive_data.parquet")
    val df = spark.read.parquet(s"$dir/massive_data.parquet")
    val cols = df.columns.toSeq
    val probs = operators.Tokenize.innerProbs(100)
    val exact = operators.Tokenize.quantileBoundsSelect(df, cols, probs)
    val sampled = operators.Tokenize.quantileBoundsSample(df, cols, probs)
    assert(sampled == exact)
    // graft_bucketize SQL surface: the optional rightClosed argument
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bucketize", exprs => GraftExtensions.buildBucketize(exprs), "built-in")
    val out = spark.sql(
      "SELECT graft_bucketize(v, array(1.0, 2.0), 100, false) AS t FROM VALUES (1.0), (2.0) AS d(v)")
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(1, 2)) // boundary-equal -> upper bin in right-open mode
  }

  test("idempotent write guard (O2): second generate is a no-op") {
    val dir = Files.createTempDirectory("graft_ignore").toString
    Pipeline.writeIgnore(Pipeline.syntheticTable(spark, 100, 2, seed = 1), s"$dir/d.parquet")
    Pipeline.writeIgnore(Pipeline.syntheticTable(spark, 999, 2, seed = 2), s"$dir/d.parquet")
    assert(spark.read.parquet(s"$dir/d.parquet").count() == 100)
  }

  test("graft_bucketize is callable from SQL via extensions") {
    // inject into the existing session's registry (same builder path as
    // spark.sql.extensions would take)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bucketize", exprs => GraftExtensions.buildBucketize(exprs), "built-in")
    val out = spark.sql(
      "SELECT graft_bucketize(v, array(1.0, 2.0, 3.0), 100) AS t FROM VALUES (0.5), (2.0), (9.0) AS d(v)")
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(0, 1, 3))
  }

  test("graft_bpe_merge is callable from SQL via extensions") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_merge", exprs => GraftExtensions.buildBpeMerge(exprs), "built-in")
    val out = spark.sql(
      "SELECT graft_bpe_merge(array('a', 'a', 'a', 'b'), 'a', 'a') AS m")
      .collect().head.getSeq[String](0)
    assert(out == Seq("aa", "a", "b"))
  }

  test("byte-walk family is callable from SQL via extensions") {
    GraftExtensions.byteWalkFunctions.foreach { case (name, build) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, exprs => { require(exprs.length == 1); build(exprs.head) }, "built-in")
    }
    val sh = spark.sql("SELECT graft_simhash64('a b') AS h").collect().head.getLong(0)
    assert(sh == graft.functions.SimHash64Expr.simhash(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b")))
    val nt = spark.sql("SELECT graft_normalize_text('  A   b ') AS t")
      .collect().head.getString(0)
    assert(nt == "a b")
    val rep = spark.sql("SELECT graft_rep_ngram_stats(array('a','a','a')) AS s")
      .collect().head.getSeq[Int](0)
    assert(rep == Seq(1, 1, 2, 2))
    assert(spark.sql("SELECT graft_type_probe('42') AS p").collect().head.get(0) != null)
    val ent = spark.sql("SELECT graft_char_entropy('abcd').entropy_bits AS e")
      .collect().head.getDouble(0)
    assert(ent == 2.0)
    val shg = spark.sql("SELECT graft_shingles(array('a','b','c','d')) AS s")
      .collect().head.getSeq[String](0)
    assert(shg == Seq("a|b|c", "b|c|d"))
    val bpe = spark.sql("SELECT graft_bpe_token_count('hello, w0rld!') AS n")
      .collect().head.getInt(0)
    assert(bpe == 6, "hello | , | w | 0 | rld | !")
  }

  test("graft_dot is callable from SQL via extensions") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => GraftExtensions.buildDot(exprs), "built-in")
    val out = spark.sql(
      """SELECT graft_dot(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>),
        |                 CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS d""".stripMargin)
      .collect().head.getDouble(0)
    assert(out == 11.0)
  }
}
