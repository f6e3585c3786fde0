package graft

/** Dump `.explain("formatted")` output for named queries to files — the
  * optimization-round evidence artifact (plans/r19/<query>_<tag>.txt).
  *
  * Usage: `tools/run.sh graft.PlanDump <outDir> <tag> [sfDir] [q ...]`
  * (no query names = every declared query). The plan is the PRE-execution
  * formatted physical plan (AQE initial plan), the same form PlanSpec pins
  * assert against; the judge checks plan-shape claims against these files.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sf = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sf)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val p = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
        java.nio.file.Files.write(p, plan.getBytes("UTF-8"))
        println(s"[plandump] wrote $p (${plan.length} chars)")
      } catch { case e: Throwable =>
        println(s"[plandump] ERROR $name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    spark.stop()
  }
}
