package graft

import org.apache.spark.sql.SparkSession

/** Dev-only A/B: time q_session_window_live at a given dir across
  * state-partition counts (the 100x probe showed per-batch state work is
  * single-threaded per partition under paced eviction). Usage:
  * tools/run.sh graft.SessAB <sfDir> <parts>... */
object SessAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val parts = args.drop(1).map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.streaming.StreamOps.StateProviderClass =
      sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER", "")
    // optional pace override (rows per paced micro-batch; 0 = derived)
    sys.env.get("SPARK_GRAFT_PACE").foreach(p =>
      graft.streaming.StreamOps.PaceRowsPerBatch = p.toLong)
    def once(p: Int): Double = {
      graft.streaming.StreamOps.StreamStatePartitions = p
      val t0 = System.nanoTime()
      graft.streaming.StreamOps.qSessionWindowLive(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    parts.foreach(p => println(f"parts=$p pass1=${once(p)}%.2f pass2=${once(p)}%.2f"))
    spark.stop()
  }
}
