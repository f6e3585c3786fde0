package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
import org.apache.spark.sql.graft.Bridge

/** Dev-only decomposition of q_tokenize_rank (round-10 verdict item 5;
  * round 13 — packed-sort A/B): on a given corpus dir, how does the 100×
  * wall split between the selection machinery + token projection and the
  * contract's output sort, and which SORT SHAPE wins:
  *
  *  - `packed` = HEAD: ORDER BY (keys, one packed-token long), decode
  *    above the Sort — 3-field ≈ 32 B sort row, but the range
  *    partitioner's sampling pass re-evaluates the 4 composite-key
  *    VectorBucketize searches (the sort input now contains them);
  *  - `raw`    = the round-8..12 shape (via -Dgraft.rank.rawsort): ORDER
  *    BY the 6-column raw tiebreak below the token projection — 6–7-slot
  *    ≈ 56 B sort row, single token evaluation above the exchange;
  *  - `nosort` = the packed plan with the top Sort stripped (keeps the
  *    decode projection) — the scan + selection + token-compute floor.
  *
  * Variants round-robin within each pass ([[HostMeter]] prints each
  * window's contention). Usage: tools/run.sh graft.RankProbe [sfDir]
  * [passes].
  */
object RankProbe {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.qsel.verbose", "true")
    val dir = args.headOption.getOrElse("/root/repo/tmp/sfprobe100/x100")
    val passes = if (args.length > 1) args(1).toInt else 3
    val cpus = Sessions.cpus
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ScaleProbe.requireCurrentDerivation(dir) // refuse a stale-derivation corpus
    ScaleProbe.warmDir(dir)
    def noSort(df: DataFrame): DataFrame = df.queryExecution.analyzed match {
      case p @ Project(_, s: Sort) => Bridge.ofRows(spark, p.copy(child = s.child))
      case s: Sort => Bridge.ofRows(spark, s.child)
      case p => sys.error(s"expected Project(Sort(..)) or Sort, got ${p.nodeName}")
    }
    def mk(shape: String): DataFrame = {
      System.setProperty("graft.rank.rawsort", (shape == "raw").toString)
      try {
        val q = SparkEntry.queries("q_tokenize_rank")(spark, dir)
        if (shape == "nosort") noSort(q) else q
      } finally System.setProperty("graft.rank.rawsort", "false")
    }
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (p <- 1 to passes; shape <- Seq("packed", "raw", "nosort")) {
      val (t, host) = HostMeter.timed {
        mk(shape).write.format("noop").mode("overwrite").save()
      }
      println(f"[rank] pass=$p $shape%-7s $t%7.2fs  $host")
      best(shape) = math.min(best.getOrElse(shape, Double.MaxValue), t)
    }
    val body = best.map { case (k, v) => f""""$k%s_s":$v%.2f""" }.mkString(",")
    println(s"""{"probe":"rank-100x","passes":$passes,$body}""")
    spark.stop()
  }
}
