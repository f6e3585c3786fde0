package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSimilaritySpec extends SparkSpec {

  test("exact dedup keeps one row per distinct text") {
    val distinctTexts = graft.Tables.documents(spark, sf).select("text").distinct().count()
    assert(Dedup.qDedupExact(spark, sf).count() == distinctTexts)
  }

  test("minhash signatures: identical texts get identical signatures") {
    val sigs = Dedup.minhashSignatures(spark, sf)
    assert(sigs.count() == graft.Tables.documents(spark, sf).count())
    // signature values are 32-bit non-negative
    val row = sigs.agg(min("sig0"), max("sig0"), min("sig15"), max("sig15")).head()
    assert(row.getLong(0) >= 0L && row.getLong(1) < (1L << 32))
    assert(row.getLong(2) >= 0L && row.getLong(3) < (1L << 32))
  }

  test("LSH catches the highest-jaccard near-dup pair") {
    // brute-force the best same-source pair at this scale, then require the
    // LSH candidate set to contain it (P(miss | j~0.97) ~ 0)
    val d = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        array_distinct(expr(
          "transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), i -> concat_ws('|', slice(split(text, ' '), i, 3)))"))
          .as("sh"))
    val a = d.as("a"); val b = d.as("b")
    val top = a.join(b, col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("j"))
      .orderBy(col("j").desc).limit(1).head()
    assume(top.getDouble(2) > 0.8, "corpus has a strong near-dup pair")
    val cands = Dedup.qDedupMinhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((top.getLong(0), top.getLong(1))))
  }

  test("jaccard verification only returns pairs >= 0.5") {
    val rows = Dedup.qDedupJaccard(spark, sf).collect()
    assert(rows.forall(_.getDouble(2) >= 0.5))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("near-dup clusters: pair endpoints co-clustered, label = component min") {
    val pairs = Dedup.qDedupJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.qDedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every doc in a verified pair is labeled, both ends identically
    pairs.foreach { case (a, b) =>
      assert(clusters.contains(a) && clusters.contains(b))
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split across clusters")
    }
    // label is the minimum doc_id of its cluster; sizes are consistent
    clusters.groupBy(_._2._1).foreach { case (label, members) =>
      assert(members.keys.min == label, s"cluster $label not labeled by its min")
      assert(members.values.forall(_._2 == members.size))
    }
    // the distributed min-label propagation path (forced with
    // smallCollect = 0) must agree with the driver union-find fast path
    val distributed = Dedup.dedupClusters(spark, sf, smallCollect = 0L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(distributed == clusters, "distributed and union-find clusterings differ")
  }

  test("distributed label propagation clusters long chains (pointer doubling)") {
    import spark.implicits._
    // worst-case shape for plain min-propagation: a 64-node chain (diameter
    // 63) plus a separate 5-node chain — doubling must converge in O(log)
    val pairs = ((0L until 63L).map(i => (i, i + 1)) ++
      (100L until 104L).map(i => (i, i + 1))).toDF("doc_a", "doc_b")
      .persist()
    val out = Dedup.distributedClusters(spark, pairs, npairs = pairs.count())
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size == 69)
    (0L to 63L).foreach(d => assert(out(d) == ((0L, 64L)), s"doc $d"))
    (100L to 104L).foreach(d => assert(out(d) == ((100L, 5L)), s"doc $d"))
    // hints-off path (edge count above the broadcast gate): AQE picks the
    // join strategy and the result must be identical
    val outAqe = Dedup.distributedClusters(spark, pairs, npairs = Long.MaxValue)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(outAqe == out, "broadcast-hinted and AQE paths disagree")
  }

  test("simhash pairs respect the Hamming radius; exact dups collide at 0") {
    val pairs = Dedup.qDedupSimhash(spark, sf).collect()
    assert(pairs.forall(r => r.getInt(2) >= 0 && r.getInt(2) <= 7))
    // identical texts within one source have identical simhashes — every
    // such pair must surface with hamming = 0 (64-bit hash, radius 7)
    val d = graft.Tables.documents(spark, sf)
    val a = d.as("a"); val b = d.as("b")
    val exactPairs = a.join(b,
        col("a.source") === col("b.source") && col("a.text") === col("b.text") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val zero = pairs.filter(_.getInt(2) == 0).map(r => (r.getLong(0), r.getLong(1))).toSet
    exactPairs.foreach(p => assert(zero.contains(p), s"exact-dup pair $p missing"))
  }

  test("cosine top-k: sims in [-1,1], ranks 1..k per query") {
    val rows = Similarity.qCosineTopk(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(2) >= -1.0000001 && r.getDouble(2) <= 1.0000001))
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == Similarity.NQueries)
    byQuery.values.foreach { rs =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to Similarity.TopK))
      // descending similarity in rank order
      val sims = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("LSH probe results are a subset of brute-force ranking universe") {
    val brute = Similarity.qCosineTopk(spark, sf)
      .select("query_id", "vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val probe = Similarity.qAnnLshProbe(spark, sf).collect()
    // any probe hit that also appears in the brute-force top-k must carry
    // the identical similarity value (same fp formula on both paths)
    probe.foreach { r =>
      brute.get((r.getLong(0), r.getLong(1))).foreach { s =>
        assert(math.abs(s - r.getDouble(2)) < 1e-12)
      }
    }
    // buckets fit the size-scaled plane count
    val np = Similarity.planesFor(graft.Tables.embeddings(spark, sf).count())
    val buckets = Similarity.qAnnLshBuckets(spark, sf).select("bucket").distinct()
      .collect().map(_.getInt(0))
    assert(buckets.forall(b => b >= 0 && b < (1 << np)))
  }

  test("planesFor holds expected bucket occupancy ~TargetBucket across scales") {
    import Similarity.{planesFor, TargetBucket, MinPlanes, MaxPlanes}
    assert(planesFor(0L) == MinPlanes)
    assert(planesFor(500L) == MinPlanes)
    // exactly at the boundary stays; one past it steps up
    assert(planesFor(TargetBucket.toLong << MinPlanes) == MinPlanes)
    assert(planesFor((TargetBucket.toLong << MinPlanes) + 1) == MinPlanes + 1)
    assert(planesFor(1L << 30) == MaxPlanes) // clamped at the top
    // occupancy bound: n / 2^p <= TargetBucket whenever the ladder isn't capped
    // (6 M = the 100x probe corpus that silently crossed the old cap of 16)
    for (n <- Seq(10000L, 1000000L, 6000000L, 50000000L)) {
      val p = planesFor(n)
      if (p < MaxPlanes) assert(n.toDouble / (1L << p) <= TargetBucket)
    }
    assert(planesFor(6000000L) == 17, "the 100x probe corpus must sit inside the ladder")
  }

  test("pq: codes are PqM subspace indices in [0, PqK); top-k shape holds") {
    val e = graft.Tables.embeddings(spark, sf)
    val cb = Similarity.pqCodebooks(e)
    assert(cb.length == Similarity.PqM &&
      cb.forall(m => m.length == Similarity.PqK && m.forall(_.length == Similarity.PqSub)))
    val out = Similarity.qAnnPq(spark, sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size == Similarity.NQueries, s"queries: ${byQ.keySet}")
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getInt(3)).sorted.sameElements(1 to Similarity.TopK))
      assert(rows.forall(_.getLong(1) != q), "query never its own neighbor")
      // adc distances weakly increase with rank
      val byRank = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
  }

  test("pq adc recall@5 vs exact cosine stays useful") {
    val e = graft.Tables.embeddings(spark, sf)
    val all = e.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val byId = all.toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      for (i <- a.indices) { val t = a(i) - b(i); s += t * t }
      s
    }
    val approx = Similarity.qAnnPq(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = approx.map { case (q, ids) =>
      // ADC approximates squared L2, so the ground truth is exact L2 top-5
      val brute = all.filter(_._1 != q)
        .map { case (id, v) => (id, l2(byId(q), v)) }
        .sortBy { case (id, s) => (s, id) }.take(5).map(_._1).toSet
      ids.intersect(brute).size / 5.0
    }
    val avg = recalls.sum / recalls.size
    info(f"pq recall@5 per query: ${recalls.mkString(", ")} avg=$avg%.2f")
    // i.i.d. random embeddings are the hard case for any quantizer
    // (distance concentration); measured avg 0.48 at sf0.001 with the
    // 16x64 geometry — pin well above the ~0.01 random-pick baseline
    // but below measurement noise
    assert(avg >= 0.3, s"recall collapsed: $recalls")
  }

  test("pq self-gate: recall_avg matches the hand-computed recall, within_bound true") {
    val out = Similarity.qAnnPq(spark, sf).collect()
    // the in-query gate's recall_avg is the fraction of PQ top-k rows whose
    // (query_id, vec_id) lands in the exact L2 top-k — recompute it from
    // the per-row flags and require self-consistency + the pinned floor
    val flagged = out.count(_.getBoolean(4))
    val expect = flagged.toDouble / out.length
    out.foreach { r =>
      assert(math.abs(r.getDouble(5) - expect) < 1e-6,
        s"recall_avg ${r.getDouble(5)} != flag fraction $expect")
      assert(r.getBoolean(6), s"within_bound false: recall_avg=${r.getDouble(5)}")
    }
    assert(expect >= Similarity.PqRecallFloor)
  }

  test("pq gate exact: the oracle-checked ground truth agrees with qAnnPq's self-gate flags") {
    // q_pq_gate_exact (round-14 verdict item 3) surfaces the self-gate's
    // exact-L2 top-k as a hash-checked query; consistency contract: a PQ
    // top-k row is flagged in_exact_topk by qAnnPq IFF its (query_id,
    // vec_id) appears in q_pq_gate_exact's rows — the two plans compute
    // the same ground truth or the gate is lying.
    val exact = Similarity.qPqGateExact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == Similarity.NQueries * Similarity.TopK,
      s"expected full top-k per query, got ${exact.size}")
    val pq = Similarity.qAnnPq(spark, sf).collect()
    pq.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getBoolean(4) == exact.contains(key),
        s"self-gate flag disagrees with the exact query at $key")
    }
    // ranks are 1..TopK per query and distances non-decreasing in rank
    val byQ = Similarity.qPqGateExact(spark, sf).collect()
      .groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to Similarity.TopK))
      assert(sorted.map(_.getDouble(2)).sliding(2).forall(p => p(0) <= p(1)))
    }
  }

  test("ann recall full query set: gate ids are the pinned md5 subset and " +
      "the FULL-set recall property still holds at spec level") {
    // the contract query gates a deterministic md5 subsample (round-9);
    // the subset is a compile-time property of the fixed candidate ids —
    // pin it so a selector change can never silently move the gate
    assert(Similarity.lshGateIds == Seq(1L, 4L), Similarity.lshGateIds)
    assert(Similarity.ivfGateIds == Seq(103L, 104L), Similarity.ivfGateIds)
    // full-set recall@3 over ALL 10 candidate queries (what the driver
    // gate measured pre-subsample): every LSH query's bucket probe and
    // every IVF query's cell probe must keep a sane fraction of the exact
    // brute top-3 — the property the oracle now checks on the subsample
    val brute = Similarity.bruteTopKInSpec(spark, sf,
      Seq((0L, Similarity.NQueries.toLong),
        (Similarity.IvfQueryLo.toLong, (Similarity.IvfQueryLo + Similarity.NQueries).toLong)), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val lsh = Similarity.qAnnLshProbe(spark, sf)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.qAnnIvf(spark, sf)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.toSeq.sortBy(_._1).map { case (q, exact) =>
      val approx = if (q < Similarity.NQueries) lsh.getOrElse(q, Set.empty)
                   else ivf.getOrElse(q, Set.empty)
      (q, exact.intersect(approx).size / 3.0)
    }
    info(s"full-set recall@3: ${recalls.map { case (q, r) => f"$q=$r%.2f" }.mkString(", ")}")
    // every candidate query must have an exact top-3 and a well-formed
    // recall; the IVF path (NProbe cells of NSeeds) must keep real recall
    // even at this scale. LSH bucket recall is near zero HERE by fixture
    // property, not by bug: ~600 iid vectors over 2^8 buckets ≈ 2-3
    // occupants, so the global top-3 rarely share the query's bucket —
    // the scaling ladder only holds occupancy (and thus recall) once the
    // corpus outgrows TargetBucket × 2^MinPlanes.
    assert(recalls.size == 2 * Similarity.NQueries)
    assert(recalls.forall { case (_, r) => r >= 0.0 && r <= 1.0 })
    val ivfAvg = recalls.filter(_._1 >= Similarity.IvfQueryLo).map(_._2).sum / Similarity.NQueries
    assert(ivfAvg >= 0.2, s"full-set IVF recall collapsed: $recalls")
  }

  test("identical embeddings share an LSH bucket at every plane count") {
    import spark.implicits._
    // near-identical cluster: base vector and +-1e-6 perturbations keep all
    // 64 signed projections on the same side of 0 (|proj| >> 64 * 1e-6),
    // so the whole cluster collides in ONE bucket at any np in [8, 16] —
    // the recall property that must survive the size-scaled plane count
    val base = Array.tabulate(Similarity.Dim)(d => (0.1f + 0.01f * (d % 7)))
    val docs = (0 until 20).map { i =>
      (i.toLong, base.map(v => v + (if (i % 2 == 0) 1e-6f else -1e-6f) * (i % 3)))
    }
    val df = docs.toDF("vec_id", "embedding")
    for (np <- Seq(Similarity.MinPlanes, 12, Similarity.MaxPlanes)) {
      val nb = Similarity.bucketOf(df, np).select("bucket").distinct().count()
      assert(nb == 1L, s"cluster split across $nb buckets at np=$np")
    }
  }

  test("probe sign-flip derivation: within-replica dot products bit-identical, patterns distinct (round 14)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the 100x-corpus claim (ScaleProbe.signFlip doc): a per-replica ±1
    // diagonal preserves every within-replica pairwise dot product
    // EXACTLY in float arithmetic — (dᵢxᵢ)(dᵢyᵢ) = xᵢyᵢ per term, same
    // order — so the derived corpus's near-dup structure mirrors the
    // base corpus per replica; and the per-replica sign patterns differ,
    // so replicas cannot form cross-replica near-dup cliques.
    val r = new scala.util.Random(11)
    val vecs = Seq.fill(6)(Array.fill(Similarity.Dim)(r.nextFloat() - 0.5f))
    val base = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    def dots(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] = {
      val x = df.as("x"); val y = df.as("y")
      val dot = (0 until Similarity.Dim).map(d =>
        col("x.embedding")(d).cast("double") * col("y.embedding")(d).cast("double"))
        .reduce(_ + _)
      x.join(y, col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id"), col("y.vec_id"), dot.as("dot"))
        .collect().toSeq.map(r0 => (r0.getLong(0), r0.getLong(1), r0.getDouble(2)))
        .sortBy(t => (t._1, t._2))
    }
    val baseDots = dots(base)
    val patterns = (1 to 5).map { rep =>
      val flipped = base.select(col("vec_id"),
        graft.ScaleProbe.signFlip(col("embedding"), lit(rep)).as("embedding"))
      // exact equality: not approx — the transform must be a pure ±1
      // diagonal with no arithmetic on the magnitudes
      assert(dots(flipped) == baseDots, s"replica $rep changed a dot product")
      flipped.orderBy("vec_id").limit(1).select("embedding")
        .as[Array[Float]].head().map(v => v > 0).toSeq
    }
    assert(patterns.distinct.size == patterns.size,
      "two replicas drew the same sign pattern")
  }
}
