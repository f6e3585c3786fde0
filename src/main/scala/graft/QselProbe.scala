package graft

import org.apache.spark.sql.functions.col

/** Dev-only decomposition of the exact-selection boundary phase (round-10
  * verdict item 5): on the reference workload (10 M×20 doubles), how much
  * of the histogram / gather passes is parquet decode + row iteration
  * (irreducible for any exact algorithm that scans) vs the per-value
  * bucket binary search (the part a codegen walk could in principle
  * shave)? Usage: tools/run.sh graft.QselProbe [dataDir]. Prints decode
  * wall (full-column scan, no search), then two warm
  * quantileBoundsSelect calls with their [qsel] phase lines. */
object QselProbe {
  def main(args: Array[String]): Unit = {
    // the [qsel] phase lines are gated off for contract queries (round-10
    // verdict item 3); this harness is their one consumer
    System.setProperty("graft.qsel.verbose", "true")
    val data = args.headOption.getOrElse("/tmp/refbench/massive_data.parquet")
    val cpus = Sessions.cpus
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(data)
    val cols = df.columns.toSeq
    val proj = df.select(cols.map(c => col(c).cast("double")): _*)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $tag=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // decode floor: iterate every row of every column, touch one value
    for (i <- 1 to 3) time(s"decode_pass$i") {
      proj.queryExecution.toRdd.foreachPartition { it =>
        var s = 0.0
        while (it.hasNext) { val r = it.next(); if (!r.isNullAt(0)) s += r.getDouble(0) }
      }
    }
    for (i <- 1 to 2) time(s"select_pass$i") {
      operators.Tokenize.quantileBoundsSelect(df, cols, operators.Tokenize.innerProbs(100))
    }
    spark.stop()
  }
}
