package graft

/** Round-20 A/B (r19 verdict item 6's residue): the TPC-H revenue dsums
  * that OPTIMIZATION_r20 left on the direct Decimal(38,6) accumulation —
  * measured instead of argued, for the two with the largest aggregate
  * inputs: Q3 (post-join rows grouped by the HIGH-cardinality l_orderkey)
  * and Q15 (a quarter of lineitem grouped by l_suppkey). Each is timed
  * against its split-primitive-long-lane form (the q1/q_cube convention,
  * bit-identical by construction — TpcHSpec-pinned before promotion).
  * Interleaved round-robin passes (the probe standard: a form pair must
  * sample the same windows), min per form, HostMeter telemetry per sample.
  *
  * OUTCOME (round 20): REJECTED — sf0.1 mins q3 0.74 s decimal / 0.85 s
  * split, q15 0.58 / 0.62; 100× mins q3 2.75 / 2.80, q15 1.33 / 1.36.
  * Parity at 100×, slight decimal win locally: these aggregates' inputs
  * are post-filter/post-join slivers of the fact, so the BigDecimal merge
  * they'd save is minor while the split form pays its per-row lane-bound
  * guard on more rows (q3 projects the lane before the join). Confirms
  * OPTIMIZATION_r20's "left with reasons" adjudication with probe rows.
  *
  * Usage: tools/run.sh graft.DsumAB [corpusDir] [passes]
  * (corpusDir defaults to sf0.1; pass tmp/sfprobe100/x100 for the 100× row)
  */
object DsumAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    // the sentinel only exists on GENERATED corpora; sf dirs are canonical
    if (!dir.startsWith("/root/testdata")) ScaleProbe.requireCurrentDerivation(dir)
    ScaleProbe.warmDir(dir)
    val forms: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] =
      Seq("q3_decimal" -> operators.TpcH.q3 _,
          "q3_splitlane" -> (operators.TpcH.q3SplitForm _),
          "q15_decimal" -> operators.TpcH.q15 _,
          "q15_splitlane" -> (operators.TpcH.q15SplitForm _))
    if (passes == 0) { // plan-diff mode: print each form's initial plan
      for ((tag, f) <- forms) {
        println(s"===== $tag =====")
        println(f(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
      spark.stop(); return
    }
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (p <- 1 to passes; (tag, f) <- forms) {
      HostMeter.untimedGc()
      val h0 = HostMeter.sample()
      val s0 = System.nanoTime()
      f(spark, dir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - s0) / 1e9
      val host = HostMeter.describe(h0, HostMeter.sample())
      println(f"[dsumab] pass=$p $tag%-13s $t%7.2fs  $host")
      best(tag) = math.min(best.getOrElse(tag, Double.MaxValue), t)
    }
    val body = best.map { case (k, v) => f""""$k":$v%.2f""" }.mkString(",")
    println(s"""{"probe":"dsum-form-ab","dir":"$dir","passes":$passes,$body}""")
    spark.stop()
  }
}
