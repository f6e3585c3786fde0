package graft

class CorpusPipelineSpec extends SparkSpec {

  test("corpus funnel: monotone shrink, nonempty, deterministic") {
    val (out1, stats1) = CorpusPipeline.run(spark, sf)
    val rows = stats1.map(_.rows)
    assert(stats1.map(_.stage) ==
      Seq("input", "exact_dedup", "near_dedup", "quality_filter", "lang_filter", "sample", "tokenized"))
    assert(rows.zip(rows.tail).forall { case (a, b) => b <= a },
      s"each stage must only drop rows: $stats1")
    assert(rows.last > 0, "funnel must not empty the corpus")
    val ids1 = out1.select("doc_id").collect().map(_.getLong(0)).sorted
    val (out2, _) = CorpusPipeline.run(spark, sf)
    val lazySurvivors = CorpusPipeline.funnelQuery(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val statSurvivors = out2.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lazySurvivors == statSurvivors,
      "contract funnel query and stats pipeline disagree on survivors")
    val ids2 = out2.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2), "funnel must be deterministic")
    assert(out1.select("n_tokens").collect().forall(_.getInt(0) > 0))
  }

  test("near-dup stage on exact survivors kills the k² candidate blowup") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // planted boilerplate cluster: ONE text repeated k times + distinct docs
    val k = 30
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    // filler docs share NO words with each other (per-doc vocabulary), so
    // they can never LSH-collide — all candidates come from the cluster
    val docs = ((0 until k).map(i => (i.toLong, boiler)) ++
      (100 until 120).map(i => (i.toLong, (0 until 12).map(j => s"w${i}x$j").mkString(" "))))
      .toDF("doc_id", "text")
    val rawCands = operators.Dedup.lshCandidates(docs).count()
    // every pair of the k copies collides on all bands: >= k(k-1)/2 pairs
    assert(rawCands >= k.toLong * (k - 1) / 2,
      s"expected the planted cluster to blow up raw candidates, got $rawCands")
    val survivors = docs.join(
      docs.groupBy("text").agg(min(col("doc_id")).as("doc_id")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val survCands = operators.Dedup.lshCandidates(survivors).count()
    assert(survCands < k.toLong * (k - 1) / 2 / 4,
      s"survivor-side candidates must drop far below the k² blowup, got $survCands")
  }
}
