package graft

/** One-window A/B of the round-14 untimed-pre-sample-GC convention on a
  * single query (round-15 reconciliation of verdict item 1): interleaves
  * `gc` samples (System.gc() untimed before the timer, the Bench/HostMeter
  * convention) with `nogc` samples (timer starts immediately, the ≤ r13
  * convention) in ONE window, so a systematic wall difference between the
  * two conventions is measurable without cross-window confounds. The
  * suspected mechanism: a full G1 collection can shrink/uncommit the heap,
  * and an allocation-heavy query (e.g. q_stats_agg's six decimal power
  * sums) then pays heap re-expansion inside its timed region — which
  * would make the new convention read SLOWER on such queries even though
  * it exists to remove a different artifact (the phase-locked periodic
  * tick). MEASURED (round 15, clean windows, default 8 g launcher):
  * q_unpivot gc-min 1.87 vs nogc-min 1.25 s, q_stats_agg 2.43 vs 2.01,
  * q1 neutral; with -Xms=-Xmx the gap vanished — mechanism = G1 heap
  * uncommit. The fix is HostMeter.heapShrinkPinned; run this probe with
  * pin=false to reproduce the raw bias, pin=true (default) to validate
  * the fix (expect gc ≈ nogc).
  * Usage: tools/run.sh graft.GcAB <sfDir> <query> [passes] [pin=true|false]
  */
object GcAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    // [passes] is positional but optional before [pin=...]: accept
    // "GcAB <dir> <query> pin=false" (passes defaults) as the docstring
    // suggests, instead of crashing in toInt on the pin flag
    val rest = args.drop(2).toSeq
    val passes = rest.find(!_.startsWith("pin=")).map(_.toInt).getOrElse(6)
    require(passes > 0, s"passes must be > 0, got $passes")
    val pin = !rest.contains("pin=false")
    val spark = Sessions.local(Sessions.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    def run(): Unit =
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    run() // untimed warmup: JIT + codegen + page cache
    val best = scala.collection.mutable.Map.empty[String, Double]
    val sums = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
    for (p <- 1 to passes; mode <- Seq("gc", "nogc")) {
      if (mode == "gc") { if (pin) HostMeter.untimedGc() else System.gc() }
      val b = HostMeter.sample()
      val t0 = System.nanoTime()
      run()
      val t = (System.nanoTime() - t0) / 1e9
      val host = HostMeter.describe(b, HostMeter.sample())
      println(f"[gcab] pass=$p $mode%-5s $t%7.2fs  $host")
      best(mode) = math.min(best.getOrElse(mode, Double.MaxValue), t)
      sums(mode) += t
    }
    println(f"[gcab] $name: gc min=${best("gc")}%.2f avg=${sums("gc") / passes}%.2f | " +
      f"nogc min=${best("nogc")}%.2f avg=${sums("nogc") / passes}%.2f")
    spark.stop()
  }
}
