package graft
// scratch: reference-scale pipeline timing, exact vs approx bounds (not committed)
object RefBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val approx = args.headOption.contains("approx")
    val (n, t) = Pipeline.run(spark, "/tmp/refbench", rows = 10000000L, cols = 20, approx = approx)
    println(s"approx=$approx rows=$n timings=$t total=${t.values.sum}")
    spark.stop()
  }
}
