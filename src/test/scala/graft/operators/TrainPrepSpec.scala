package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainPrepSpec extends SparkSpec {

  test("decontamination reports every corpus doc with a ratio in [0,1]") {
    val d = graft.Tables.documents(spark, sf)
    val corpusDocs = d.filter(col("doc_id") % 97 =!= 0).count()
    val out = TrainPrep.qDecontaminate(spark, sf).collect()
    assert(out.length == corpusDocs, "one row per non-benchmark doc")
    out.foreach { r =>
      val (nGrams, nOverlap, c) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nOverlap >= 0 && nOverlap <= nGrams, s"overlap bounds: $r")
      assert(c >= 0.0 && c <= 1.0, s"ratio bounds: $r")
      assert((nOverlap == 0) == (c == 0.0), s"ratio zero iff overlap zero: $r")
    }
  }

  test("an exact copy of a benchmark doc is fully contaminated") {
    import spark.implicits._
    // planted corpus: doc 0 is the benchmark (0 % 97 == 0); doc 5 is its
    // exact copy, doc 6 is disjoint vocabulary
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (5L, "alpha beta gamma delta epsilon zeta"),
      (6L, "one two three four five six")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("__trainprep_docs")
    // drive the same logic through a temp dir is heavier; instead verify the
    // gram-overlap core directly with the production shingle convention
    val grams = docs.select(col("doc_id"), explode(array_distinct(expr(
      "transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), i -> concat_ws('|', slice(split(text, ' '), i, 3)))")))
      .as("g"))
    val bench = grams.filter(col("doc_id") === 0L).select("g").distinct()
    val ov = grams.filter(col("doc_id") =!= 0L).join(bench, "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ov(5L) == 4L, "copy shares all 4 distinct 3-grams")
    assert(!ov.contains(6L), "disjoint doc has zero overlap")
  }

  test("bloom scrub list equals the exact overlap arm of decontamination") {
    // the bloom prefilter must be invisible in the result: same rows as the
    // plain query's n_overlap > 0 subset
    val exact = TrainPrep.qDecontaminate(spark, sf)
      .filter(col("n_overlap") > 0).select("doc_id", "n_overlap")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = TrainPrep.qDecontaminateBloom(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom == exact, "bloom-prefiltered scrub list differs from exact")
  }

  test("bloom probe admits every member and prunes most non-members") {
    import spark.implicits._
    val members = (0 until 1000).map(i => s"member_$i").toDF("k")
    val bf = graft.functions.Bloom.build(members, col("k"), 1000)
    val probed = (0 until 10000).map(i => s"other_$i").toDF("k")
      .filter(graft.functions.Bloom.mightContain(bf, col("k"))).count()
    val kept = members.filter(graft.functions.Bloom.mightContain(bf, col("k"))).count()
    assert(kept == 1000, "bloom filters never false-negative")
    assert(probed < 500, s"~1% FPP expected, got $probed/10000 false positives")
  }

  test("interleave order: each full round takes exactly one doc per source") {
    val out = TrainPrep.qInterleaveOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(out.map(_._4).distinct.length == out.length, "global_pos unique")
    val bySource = out.groupBy(_._2)
    val minRounds = bySource.values.map(_.length).min
    // while every source still has docs, round k (pos == k) holds one doc
    // from each source
    (1 to minRounds).foreach { k =>
      val round = out.filter(_._3 == k)
      assert(round.map(_._2).toSet == bySource.keySet,
        s"round $k must cover every source once")
    }
    assert(out.map(_._1).toSet == bySource.values.flatten.map(_._1).toSet)
  }

  test("truncation: counts consistent, overflow iff past budget, head kept") {
    val texts = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TrainPrep.qTruncateBudget(spark, sf).collect()
    assert(out.length == texts.size)
    out.foreach { r =>
      val (id, n, kept, dropped, over, trunc) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4), r.getString(5))
      assert(kept + dropped == n, s"count conservation: $r")
      assert(over == (n > 30), s"overflow flag: $r")
      val expect = texts(id).split(" ", -1).take(30).mkString(" ")
      assert(trunc == expect, s"head words kept verbatim for doc $id")
    }
  }

  test("sequence packing conserves docs and tokens, budget bounds pack starts") {
    val d = graft.Tables.documents(spark, sf)
    val totalDocs = d.count()
    val totalTokens = d.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    val packs = TrainPrep.qPackSequences(spark, sf).collect()
    assert(packs.map(_.getLong(2)).sum == totalDocs, "every doc in exactly one pack")
    assert(packs.map(_.getLong(3)).sum == totalTokens, "token mass conserved")
    // pack ids per source are contiguous from 0 (offset packing never skips
    // a pack: a doc landing past a budget boundary still starts in the pack
    // its first token falls in)
    packs.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val ids = rows.map(_.getInt(1)).sorted
      assert(ids.head == 0, s"$src: first pack is 0")
      assert(ids.last == ids.length - 1, s"$src: contiguous pack ids")
    }
  }

  test("shard assignment is a permutation: every doc once, positions dense per shard") {
    val out = TrainPrep.qShardAssign(spark, sf).collect()
    val n = graft.Tables.documents(spark, sf).count()
    assert(out.length == n)
    assert(out.map(_.getLong(0)).distinct.length == n, "each doc exactly once")
    out.groupBy(_.getInt(1)).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < TrainPrep.NShards)
      val pos = rows.map(_.getInt(2)).sorted
      assert(pos.head == 1 && pos.last == pos.length, s"shard $shard positions dense 1..n")
    }
    // determinism: a second run yields the identical assignment
    val again = TrainPrep.qShardAssign(spark, sf).collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq)
  }

  test("containment >= jaccard on every surviving pair; asymmetric pairs surface") {
    val cont = Dedup.qDedupContainment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    val jac = Dedup.queries("q_dedup_jaccard")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every Jaccard-verified pair also passes the containment gate (for any
    // sets, max containment >= jaccard: the union is at least the smaller set)
    jac.foreach { case (pair, j) =>
      assert(cont.contains(pair), s"jaccard pair $pair missing from containment")
      val (ca, cb) = cont(pair)
      assert(math.max(ca, cb) >= j - 1e-6, s"$pair: max containment < jaccard")
    }
  }
}
