package graft

/** Round-20 A/B (r19 verdict item 1, second clause): Q18's single-
  * aggregation form vs the round-18 aggregate→semi-join→re-aggregate form
  * BELOW the spill regime. The r19 100× probe read the new form at 6.71 s
  * where the r18 form had read 5.64 s — if that ordering is real (and not
  * the r19 window), the single-agg form should be made size-adaptive
  * rather than unconditional. Interleaved round-robin passes (the probe
  * standard: a strategy pair must sample the same windows), min per form,
  * HostMeter telemetry per sample.
  *
  * Usage: tools/run.sh graft.Q18AB [corpusDir] [passes]
  * (corpusDir defaults to the 100× corpus at tmp/sfprobe100/x100)
  */
object Q18AB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmp/sfprobe100/x100")
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleProbe.requireCurrentDerivation(dir)
    ScaleProbe.warmDir(dir)
    // the r18 join-then-aggregate Q13 (the OptimizedFormsSpec reference
    // form, inlined): full order rows cross the join, counted after
    import org.apache.spark.sql.functions._
    val q13JoinForm = (sp: org.apache.spark.sql.SparkSession, d: String) => {
      val c = Tables.customer(sp, d)
      val o = Tables.orders(sp, d)
      c.join(o, col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT", "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }
    val forms: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] =
      Seq("q18_singleagg" -> operators.TpcH.q18 _,
          "q18_semijoin" -> (operators.TpcH.q18SemiJoinForm _),
          "q13_preagg" -> operators.TpcH.q13 _,
          "q13_joinform" -> q13JoinForm)
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (p <- 1 to passes; (tag, f) <- forms) {
      HostMeter.untimedGc()
      val h0 = HostMeter.sample()
      val s0 = System.nanoTime()
      f(spark, dir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - s0) / 1e9
      val host = HostMeter.describe(h0, HostMeter.sample())
      println(f"[q18ab] pass=$p $tag%-9s $t%7.2fs  $host")
      best(tag) = math.min(best.getOrElse(tag, Double.MaxValue), t)
    }
    val body = best.map { case (k, v) => f""""$k":$v%.2f""" }.mkString(",")
    println(s"""{"probe":"q18-form-ab","dir":"$dir","passes":$passes,$body}""")
    spark.stop()
  }
}
