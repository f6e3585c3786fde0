package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: run only these queries (dev loop); the driver
    // always passes exactly (sfDir, outDir) and gets the full set
    val only: Set[String] = args.drop(2).toSet
    val cpus = Sessions.env("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, extra = Seq(
      "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS"))
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Write the oracle json BEFORE running the queries: the dump costs one
    // tiny Spark job (q_ann_pq's codebook training collects <=512 vectors)
    // and an external kill mid-dump (host degradation phases run single
    // queries 100x over) must still leave every already-written result
    // comparable instead of zeroing the round. If the dynamic entry dies
    // (e.g. a dir without embeddings) fall back to the static map — same
    // artifact shape as rounds <= 17, never a zeroed round.
    val oracle =
      try SparkEntry.oracleSqlFor(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] dynamic oracle failed, static fallback: ${e.getMessage}")
        SparkEntry.oracleSql
      }
    val json = oracle
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val t0 = System.nanoTime()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
      val s0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] done q=$name sec=${(System.nanoTime() - s0) / 1e9}%.2f elapsed=${(System.nanoTime() - t0) / 1e9}%.1f")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
