package graft

/** Dev-only decomposition of RefBench's scan stage (round 13): the stage
  * wraps `spark.read.parquet(path)` + `count()` and reads ~3.6 s in every
  * round-13 window — suspicious for what is a footer-metadata count of 32
  * files. Splits the stage into session-warm (first trivial job), read
  * (analysis + schema inference), and count (the job) to see which term
  * owns the wall. Usage: tools/run.sh graft.ScanProbe [dataDir] */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val data = args.headOption.getOrElse("/tmp/refbench/massive_data.parquet")
    val cpus = Sessions.cpus
    val t00 = System.nanoTime()
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scan] $tag=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    println(f"[scan] session=${(System.nanoTime() - t00) / 1e9}%.2f")
    t("warm_job") { spark.range(10).count() }
    var df: org.apache.spark.sql.DataFrame = null
    t("read_pass1") { df = spark.read.parquet(data) }
    t("count_pass1") { df.count() }
    t("read_pass2") { df = spark.read.parquet(data) }
    t("count_pass2") { df.count() }
    spark.stop()
  }
}
