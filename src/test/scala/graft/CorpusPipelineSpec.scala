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
}
