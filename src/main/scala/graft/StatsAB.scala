package graft

/** Dev-only A/B (round 16 — verdict "what's wrong" item 4): time
  * q_stats_agg's two exact-sum shapes interleaved in ONE window (the
  * SessAB discipline): `split` = the five Decimal(38,6) power sums on
  * (div 1e9, mod 1e9) primitive-long lanes (no per-row BigDecimal
  * merge; bit-identical output, spec-pinned), `decimal` = the direct
  * Decimal(38,6) sums. Usage: tools/run.sh graft.StatsAB [sfDir]
  * [passes] — point sfDir at the 100× probe corpus for the scale
  * reading. */
object StatsAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sfprobe100/x100")
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    def once(split: Boolean): Unit = {
      operators.Relational3.StatsSumSplitLong = split
      operators.Relational3.qStatsAgg(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    HostMeter.abLoop("statsab", passes, Seq(
      "split" -> (() => once(true)),
      "decimal" -> (() => once(false))))
    spark.stop()
  }
}
