package graft
import org.apache.spark.sql.SparkSession

/** Dev-only targeted bench: time the named queries (2 passes, min) at a
  * given SF dir. Usage: tools/run.sh graft.BenchSome <sfDir> <query>...
  * The round-contract harness is [[Bench]]; this exists for the edit loop.
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = Sessions.cpus
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val p1 = names.map(n => n -> once(n)).toMap
    val p2 = names.map(n => n -> once(n)).toMap
    names.foreach(n => println(f"$n%-28s min=${math.min(p1(n), p2(n))}%.2f  (${p1(n)}%.2f, ${p2(n)}%.2f)"))
    spark.stop()
  }
}
