package graft

import org.apache.spark.sql.SparkSession

/** Dev-only A/B: time q_session_window_live at a given dir across
  * state-partition counts (the 100x probe showed per-batch state work is
  * single-threaded per partition under paced eviction), and — round 13 —
  * across the sum's STATE-ROW WIDTH (Decimal(38,6) 16-byte slow-path
  * buffer vs exact-micros 8-byte long; bit-identical output, see
  * StreamOps.SessionSumStateLong). Variants interleave round-robin inside
  * ONE window with per-pass host telemetry, the FuzzyProbe discipline.
  * Usage: tools/run.sh graft.SessAB <sfDir> <parts>...
  *   SPARK_GRAFT_SESSION_SUM=decimal,long   variants to interleave
  *   SPARK_GRAFT_SESSAB_PASSES=N            passes per (parts, variant) */
object SessAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val parts = args.drop(1).map(_.toInt)
    val cpus = Sessions.cpus
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    graft.streaming.StreamOps.StateProviderClass =
      sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER", "")
    // optional pace override (rows per paced micro-batch; 0 = derived)
    sys.env.get("SPARK_GRAFT_PACE").foreach(p =>
      graft.streaming.StreamOps.PaceRowsPerBatch = p.toLong)
    // round-13 state-row-width A/B: "long" sums exact micros in an 8-byte
    // long state slot instead of Decimal(38,6); comma-list interleaves
    val variants = sys.env.getOrElse("SPARK_GRAFT_SESSION_SUM", "long")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val passes = sys.env.getOrElse("SPARK_GRAFT_SESSAB_PASSES", "2").toInt
    def once(p: Int, v: String): Unit = {
      graft.streaming.StreamOps.StreamStatePartitions = p
      graft.streaming.StreamOps.SessionSumStateLong = v == "long"
      graft.streaming.StreamOps.qSessionWindowLive(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    HostMeter.abLoop("sessab", passes,
      for (p <- parts.toSeq; v <- variants)
        yield f"parts=$p sum=$v" -> (() => once(p, v)))
    spark.stop()
  }
}
