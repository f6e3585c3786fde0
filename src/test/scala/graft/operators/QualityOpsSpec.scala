package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityOpsSpec extends SparkSpec {

  test("rep filters: fractions bounded, keep flag matches the thresholds") {
    val nDocs = graft.Tables.documents(spark, sf).count()
    val out = QualityOps.qRepNgramFilters(spark, sf).collect()
    assert(out.length == nDocs, "one row per document")
    out.foreach { r =>
      val (d3, t2, keep) = (r.getDouble(1), r.getDouble(2), r.getBoolean(3))
      assert(d3 >= 0.0 && d3 <= 1.0, s"dup3 bounds: $r")
      assert(t2 > 0.0 && t2 <= 1.0, s"top2 bounds: $r")
      assert(keep == (d3 <= 0.02 && t2 <= 0.05), s"keep flag: $r")
    }
  }

  test("rep-filter gram math flags a planted boilerplate doc") {
    import spark.implicits._
    // 40x the same word: every 3-gram identical -> dup frac = (n-1)/n,
    // the single 2-gram carries all the mass. Same formulas as the query.
    val df = Seq((1L, Seq.fill(40)("spam").mkString(" "))).toDF("doc_id", "text")
    val g3 = expr("transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), " +
      "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))")
    val dup3 = df.select(((size(g3) - size(array_distinct(g3))).cast("double") / size(g3)).as("d"))
      .head().getDouble(0)
    assert(dup3 > 0.9, s"boilerplate must show near-total 3-gram duplication, got $dup3")
  }

  test("segment dedup keeps exactly one occurrence of every distinct segment") {
    val totKept = QualityOps.qSegmentDedup(spark, sf)
      .agg(sum("n_kept")).head().getLong(0)
    val distinctSegs = graft.Tables.documents(spark, sf)
      .select(explode(expr("transform(sequence(1, greatest(size(split(text, ' ')), 1), 5), " +
        "i -> concat_ws(' ', slice(split(text, ' '), i, 5)))")).as("seg"))
      .select(countDistinct("seg")).head().getLong(0)
    assert(totKept == distinctSegs, "kept segments = distinct segments, corpus-wide")
  }

  test("a doc whose segments all survive reassembles to its original text") {
    val d = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val full = QualityOps.qSegmentDedup(spark, sf).join(d, "doc_id")
      .filter(col("n_kept") === col("n_segs"))
    assert(full.count() > 0, "fixture has at least one fully-unique doc")
    assert(full.filter(col("dedup_text") =!= col("text")).count() == 0,
      "reassembly must be lossless when nothing is dropped")
  }

  test("vocab coverage: counts consistent, oov rate in [0,1]") {
    val out = QualityOps.qVocabCoverage(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nTok, nInv, oov) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nInv >= 0 && nInv <= nTok, s"in-vocab bounds: $r")
      assert(oov >= 0.0 && oov <= 1.0, s"oov bounds: $r")
      assert(math.abs(oov - (1.0 - nInv.toDouble / nTok)) < 1e-5, s"oov arithmetic: $r")
    }
  }

  test("weighted sampling: integer predicate holds; kept set skews long") {
    val out = QualityOps.qSampleWeighted(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(3) < r.getLong(4), s"key under threshold: $r"))
    val meanKept = out.map(_.getLong(2)).sum.toDouble / out.length
    val meanAll = graft.Tables.documents(spark, sf)
      .agg(avg("n_chars")).head().getDouble(0)
    assert(meanKept > meanAll,
      s"length-weighted inclusion must overrepresent long docs ($meanKept vs $meanAll)")
  }

  test("mixture sample: per-source rate follows the tau=2 temperature law") {
    val docs = graft.Tables.documents(spark, sf)
    val sizes = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = QualityOps.qMixtureSample(spark, sf).collect()
    out.foreach { r =>
      val (src, key, thr) = (r.getString(1), r.getLong(2), r.getLong(3))
      val expected = math.floor(math.min(1.0, 8.0 / math.sqrt(sizes(src))) * 65536).toLong
      assert(thr == expected, s"threshold law for $src: $thr != $expected")
      assert(key < thr, s"kept row violates its own threshold: $r")
    }
    // sampled fraction per source tracks the rate within binomial noise
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val rate = math.min(1.0, 8.0 / math.sqrt(sizes(src)))
      val n = sizes(src).toDouble
      val tol = 4 * math.sqrt(rate * (1 - rate) / n) + 2.0 / n
      assert(math.abs(rows.length / n - rate) <= tol + 1e-9,
        s"$src: sampled ${rows.length}/$n vs rate $rate")
    }
  }

  test("reservoir sample: exactly min(k, n_s) docs per source, dense picks") {
    val sizes = graft.Tables.documents(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = QualityOps.qSampleReservoir(spark, sf).collect()
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      assert(rows.length == math.min(40L, sizes(src)), s"quota for $src")
      assert(rows.map(_.getInt(3)).sorted.sameElements(1 to rows.length),
        s"picks must be dense 1..k for $src")
    }
    assert(out.map(_.getString(1)).toSet == sizes.keySet, "every source sampled")
  }

  test("pii scrub masks planted emails and digit runs, leaves clean text alone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact me at alice@example.com or bob.smith@mail.co today"),
      (2L, "card 1234567890 and pin 999999 leaked"),
      (3L, "clean text with short 12345 digits and no at signs")).toDF("doc_id", "text")
    val out = QualityOps.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4)))).toMap
    assert(out(1L) == ((2, 0, "contact me at <EMAIL> or <EMAIL> today", 2)), s"${out(1L)}")
    assert(out(2L) == ((0, 2, "card <NUM> and pin <NUM> leaked", 2)), s"${out(2L)}")
    assert(out(3L) == ((0, 0, "clean text with short 12345 digits and no at signs", 0)),
      "five-digit run must NOT mask (threshold is 6)")
  }

  test("hamming top-k: 5 ranked neighbors per query, distance bounded") {
    val out = QualityOps.qEmbHamming(spark, sf).collect()
    assert(out.length == 25, "5 queries x top-5")
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to 5), s"ranks contiguous for q=$q")
      val hs = byRank.map(_.getInt(2))
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b }, s"rank order follows distance for q=$q")
      hs.foreach(h => assert(h >= 0 && h <= 64, s"hamming in [0,64] for q=$q"))
      rows.foreach(r => assert(r.getLong(1) != q, "self is excluded"))
    }
  }

  test("hamming agrees with a first-principles sign-bit recompute") {
    val sigs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END)").as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    QualityOps.qEmbHamming(spark, sf).collect().foreach { r =>
      val (q, c, h) = (r.getLong(0), r.getLong(1), r.getInt(2))
      val expected = sigs(q).zip(sigs(c)).count { case (a, b) => a != b }
      assert(h == expected, s"hamming($q,$c)")
    }
  }

  test("chunking: stride/window arithmetic per doc") {
    val nWords = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = QualityOps.qDocChunks(spark, sf).collect()
    out.groupBy(_.getLong(0)).foreach { case (doc, rows) =>
      val n = nWords(doc)
      assert(rows.length == (n - 1) / 25 + 1, s"chunk count for doc=$doc n=$n")
      rows.foreach { r =>
        val (idx, start, nt) = (r.getInt(1), r.getInt(2), r.getInt(3))
        assert(start == idx * 25 + 1, s"stride offsets: $r")
        assert(nt == math.min(50, n - start + 1), s"window clamp: $r")
      }
    }
    assert(nWords.keySet == out.map(_.getLong(0)).toSet, "every doc chunked")
  }
}
