package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-20 state-store provider A/B for the live streaming drains (r19
  * verdict item 3): the r17 DrainProbe adjudicated the drains' walls as
  * 75–95 % fixed micro-batch machinery, and the one Spark-level lever that
  * adjudication never tried is the state-store PROVIDER — the default
  * HDFS-backed store keeps state on-heap and writes per-batch delta files
  * through the checkpoint file manager; RocksDB keeps state off-heap with
  * its own changelog. This A/B swaps the provider via the existing
  * [[graft.streaming.StreamOps.StateProviderClass]] hook (the SessAB hook)
  * for the NON-transformWithState stateful drains (the tws drains already
  * run RocksDB by API requirement; the foreachBatch roller has no state
  * store). Interleaved round-robin passes, min per (provider, drain).
  *
  * Usage: tools/run.sh graft.DrainAB [sfDir] [passes]
  */
object DrainAB {
  private val Drains: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "session"  -> streaming.StreamOps.qSessionWindowLive,
    "sjoin"    -> streaming.StreamOps.qStreamJoinLive,
    "sjoinout" -> streaming.StreamOps.qStreamJoinOuterLive,
    "dedupwm"  -> streaming.StreamOps.qStreamDedupWmLive,
    "dedup"    -> streaming.StreamOps.qStreamDedupLive)

  private val Providers: Seq[(String, String)] = Seq(
    "hdfs" -> "", // empty = Spark default (HDFSBackedStateStoreProvider)
    "rocksdb" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    // one untimed staging build + first drain per provider config, so the
    // timed passes are staging-warm (the DrainProbe convention)
    streaming.StreamOps.qStreamDedupLive(spark, sfDir).collect()
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (p <- 1 to passes; (ptag, pcls) <- Providers; (tag, entry) <- Drains) {
      streaming.StreamOps.StateProviderClass = pcls
      try {
        HostMeter.untimedGc()
        val h0 = HostMeter.sample()
        val s0 = System.nanoTime()
        entry(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - s0) / 1e9
        val host = HostMeter.describe(h0, HostMeter.sample())
        println(f"[drainab] pass=$p $ptag%-8s $tag%-9s $t%7.2fs  $host")
        val k = s"$ptag/$tag"
        best(k) = math.min(best.getOrElse(k, Double.MaxValue), t)
      } finally streaming.StreamOps.StateProviderClass = ""
    }
    println("[drainab] ==== minima ====")
    for ((tag, _) <- Drains) {
      val h = best(s"hdfs/$tag"); val r = best(s"rocksdb/$tag")
      println(f"[drainab] min $tag%-9s hdfs=$h%6.2f rocksdb=$r%6.2f rocks/hdfs=${r / h}%5.2f")
    }
    val body = best.map { case (k, v) => f""""$k":$v%.2f""" }.mkString(",")
    println(s"""{"probe":"drain-provider-ab","passes":$passes,$body}""")
    spark.stop()
  }
}
