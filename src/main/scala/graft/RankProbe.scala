package graft

/** Dev-only decomposition of q_tokenize_rank (round-10 verdict item 5):
  * on a given corpus dir, how does the 100× wall split between count /
  * sample / histogram / boundary-gather (the selection machinery GridIndex
  * could accelerate) and the output sort + map-only token projection (the
  * part that is already the documented floor)? Usage:
  * tools/run.sh graft.RankProbe [sfDir] — prints [rank] phase lines per
  * pass plus the end-to-end wall; sort+project ≈ total − phases. */
object RankProbe {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.qsel.verbose", "true")
    val dir = args.headOption.getOrElse("/root/repo/tmp/sfprobe100/x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries("q_tokenize_rank")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[rank] total_pass$i=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
