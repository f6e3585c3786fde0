package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Properties of the round-2 pipeline operators (sessionize, hash sampling,
  * BPE pairs, TF-IDF, mode, array funcs, IVF ANN) that the DuckDB oracle
  * cannot express directly. */
class PipelineOpsSpec extends SparkSpec {

  test("sessionize: per-user event counts are conserved and gaps respected") {
    val sessions = PipelineOps.qSessionize(spark, sf).cache()
    val perUser = sessions.groupBy("user_id").agg(sum("n_events").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val events = graft.Tables.events(spark, sf).groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUser == events, "sessionization must partition each user's events exactly")
    val bad = sessions.filter(col("duration_us") < 0 || col("n_events") < 1).count()
    assert(bad == 0)
    sessions.unpersist()
  }

  test("hash sampling: deterministic, rate near 20%") {
    val a = PipelineOps.qSampleHash(spark, sf).collect().map(_.getLong(0))
    val b = PipelineOps.qSampleHash(spark, sf).collect().map(_.getLong(0))
    assert(a.sameElements(b), "hash sample must be identical across runs")
    val total = graft.Tables.documents(spark, sf).count()
    val rate = a.length.toDouble / total
    assert(rate > 0.10 && rate < 0.30, s"20% hash sample rate out of band: $rate")
  }

  test("bpe pairs: counts positive, pairs are two existing words") {
    val rows = PipelineOps.qBpePairs(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.forall(_.getLong(1) > 0))
    assert(rows.forall(_.getString(0).split(" ").length == 2))
  }

  test("tfidf: scores non-negative, df <= corpus size") {
    val n = graft.Tables.documents(spark, sf).count()
    val rows = PipelineOps.qTfidf(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(4) >= 0.0), "idf = ln(N/df) >= 0 since df <= N")
    assert(rows.forall(_.getLong(3) <= n))
  }

  test("mode: the reported value really is a maximal-frequency value") {
    val counts = graft.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_quantity").count().collect()
      .groupBy(_.getString(0))
    PipelineOps.qModeAgg(spark, sf).collect().foreach { r =>
      val flag = r.getString(0)
      val maxN = counts(flag).map(_.getLong(2)).max
      assert(r.getLong(2) == maxN, s"mode count for $flag must equal the max frequency")
    }
  }

  test("array funcs: dim, ordering and norm invariants") {
    val rows = PipelineOps.qArrayFuncs(spark, sf).collect()
    assert(rows.forall(_.getInt(1) == 64))
    assert(rows.forall(r => r.getDouble(3) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(4)),
      "min <= first element <= max")
    assert(rows.forall(_.getDouble(5) > 0.0))
  }

  test("rolling quantile: frame bounded at 20 rows, degenerate frames exact") {
    val rows = EventOps.qRollingQuantile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, med, p90) = (r.getInt(2), r.getDouble(3), r.getDouble(4))
      assert(n >= 1 && n <= 20, s"frame bound violated: $r")
      assert(med <= p90 + 1e-9, s"median must not exceed p90: $r")
      if (n == 1) assert(med == p90, s"single-row frame: both quantiles equal: $r")
    }
  }

  test("bpe merge expr: greedy non-overlapping fusion, resume after merge") {
    import spark.implicits._
    val out = Seq(
      (Seq("a", "a", "a"), 1L),
      (Seq("a", "b", "a", "b", "c"), 1L),
      (Seq("x"), 1L)).toDF("sym", "freq")
      .select(graft.functions.BpeMergeExpr.mergePair(col("sym"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("aa", "a"), s"overlap must not re-merge: ${out(0)}")
    assert(out(1) == Seq("a", "b", "a", "b", "c"), "no occurrence, no change")
    assert(out(2) == Seq("x"), "single symbol untouched")
  }

  test("bpe training learns the Sennrich merges on the classic vocabulary") {
    import spark.implicits._
    // low:5 lower:2 newest:6 widest:3 — hand-derived rule sequence:
    // (e,s) 9 [tie with (s,t), lexicographic asc], (es,t) 9, (l,o) 7
    // [tie with (o,w)], (lo,w) 7
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
      .select(split(col("word"), "").as("sym"), col("freq"))
    val rules = PipelineOps.trainBpe(words, 4)
    assert(rules == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L), (4, "lo", "w", 7L)),
      s"got $rules")
  }

  test("ivf ann: three ranked hits per query from probed cells only") {
    val rows = Similarity.qAnnIvf(spark, sf).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == Similarity.NQueries)
    byQuery.values.foreach { hits =>
      assert(hits.map(_.getInt(4)).sorted.sameElements(1 to hits.length))
      assert(hits.map(r => r.getInt(2)).distinct.length <= Similarity.NProbe,
        "hits must come from at most NProbe cells")
    }
  }
}
