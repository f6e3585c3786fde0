package graft
/** Plan-shape sweep: prints suspicious physical-plan features per query
  * (cartesian products, non-broadcast NL joins, single-partition windows).
  * Dev tool: `tools/run.sh graft.PlanSweep [sfDir]`. */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    // Exchange SinglePartition is LEGITIMATE when it carries only a global
    // scalar aggregate's partial rows (one row per upstream partition):
    // q_gap_fill's min/max hour bounds, q_tfidf's n_docs denominator,
    // q_scalar_subquery's scalar aggregates. Audited 2026-08 round 3 — the
    // single partition sees ~|partitions| rows, never the fact table.
    // Extended round 20 with the TPC-H gauntlet's global scalar aggregates
    // (q6/q14/q17/q19 one-row revenue totals, q15's max-revenue scalar,
    // q22's avg-balance scalar) and q_ann_pq's scalar gate — each single
    // partition carries one partial-agg row per upstream partition.
    val auditedScalarAgg = Set("q_gap_fill", "q_scalar_subquery", "q_tfidf",
      "q_tpch_q6", "q_tpch_q14", "q_tpch_q15", "q_tpch_q17", "q_tpch_q19",
      "q_tpch_q22", "q_ann_pq")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val flags = Seq(
          // the non-broadcast nested-loop form in Spark IS CartesianProduct
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          // a window/sort with no partitioning funnels through one partition
          "SinglePartitionExchange" -> (plan.contains("Exchange SinglePartition")
            && !auditedScalarAgg.contains(name)),
          "SinglePartition(audited scalar agg)" -> (plan.contains("Exchange SinglePartition")
            && auditedScalarAgg.contains(name)),
          "SortMergeJoin" -> plan.contains("SortMergeJoin")
        ).filter(_._2).map(_._1)
        if (flags.nonEmpty) println(s"$name: ${flags.mkString(", ")}")
      } catch { case e: Throwable => println(s"$name: PLAN-ERROR ${e.getMessage.take(80)}") }
    }
    println("sweep done")
    spark.stop()
  }
}
