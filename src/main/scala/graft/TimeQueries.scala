package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic timer: run a comma-separated subset of SparkEntry.queries
  * against one data dir and print per-pass times. Unlike Bench this makes
  * no noise-model claims — it is for quick A/B plan comparisons (e.g.
  * single-file vs multi-file input layout, pre/post plan change).
  *
  * Usage: TimeQueries <dataDir> <q1,q2,...> [passes=2]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQueries <dataDir> <q1,q2,...> [passes]")
    val dir = args(0)
    val names = args(1).split(',').toSeq
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = Sessions.cpus
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    for (p <- 1 to passes; n <- names) {
      val s0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(f"[timeq] pass=$p $n%-24s ${(System.nanoTime() - s0) / 1e9}%8.2fs")
      if (explain && p == passes) {
        // write() ran a SEPARATE QueryExecution; drive THIS df's execution
        // so the printed plan is the AQE-final one (isFinalPlan=true, with
        // any ReusedExchange decisions), not a freshly-planned static tree.
        df.collect()
        println(s"=== $n executed plan (AQE final) ===")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
