package graft

import org.apache.spark.sql.SparkSession

/** Round-13: same-window shuffle-codec A/B at fixture scale. The FuzzyProbe
  * window showed zstd ~24% faster on the volume-bound ~20 GB 100× sort
  * exchange, but the full sf0.1 bench's q1-normalized median moved +7%
  * under zstd vs the morning's lz4 window — with q1 itself moving, so the
  * normalization is confounded. This harness interleaves codecs per pass
  * (context restart per switch, the FuzzyProbe pattern) over a named query
  * list at a given dir, so the small-shuffle regime gets its own
  * clean-window verdict. Round-13 verdict: at sf0.1 the codec is NEUTRAL
  * within the host band (per-query deltas −8%..+22%, worst absolute
  * +0.16 s) — the earlier "+7% q1-normalized median under zstd" was
  * cross-window normalization noise (q1 itself moved). With the 100×
  * volume-bound sort exchange ~24% faster under zstd (FuzzyProbe) and the
  * small-shuffle regime a wash, zstd ships as the session standard.
  * Usage:
  *   tools/run.sh graft.CodecAB <sfDir> <passes> <query>...
  */
object CodecAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "pass query names")
    val codecs = sys.env.getOrElse("SPARK_GRAFT_FUZZY_CODECS", "lz4,zstd")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = Sessions.cpus
    def session(codec: String): SparkSession =
      Sessions.local(cpus, extra = Seq("spark.io.compression.codec" -> codec))
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (p <- 1 to passes; codec <- codecs) {
      val spark = session(codec)
      spark.sparkContext.setLogLevel("ERROR")
      for (n <- names) {
        val (t, host) = HostMeter.timed {
          SparkEntry.queries(n)(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        val k = s"$n@$codec"
        println(f"[codecab] pass=$p $k%-34s $t%7.2fs  $host")
        best(k) = math.min(best.getOrElse(k, Double.MaxValue), t)
      }
      spark.stop()
    }
    for (n <- names) {
      val row = codecs.map(c => f"$c=${best(s"$n@$c")}%.2fs").mkString("  ")
      println(s"[codecab] min $n  $row")
    }
  }
}
