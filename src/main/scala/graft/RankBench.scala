package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev bench: the three rank-tokenizer formulations at reference scale
  * (10M rows x 4 cols from the RefBench parquet), substantiating the
  * SURVEY §6 claim that the window form stops scaling past one core per
  * column. Usage: tools/run.sh graft.RankBench [window|melt|select ...]
  */
object RankBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    val modes = if (args.nonEmpty) args.toSeq else Seq("select", "melt", "window")
    val cols = Seq("col_0", "col_1", "col_2", "col_3")
    // id is unique -> (id, cols...) is a total order and a key
    val df = spark.read.parquet("/tmp/refbench/massive_data.parquet")
      .select((0 until 4).map(i => col(s"col_$i")): _*)
      .withColumn("id", monotonically_increasing_id())
      .localCheckpoint(true) // freeze ids; all modes tokenize the same table
    val tiebreak = Seq("id") ++ cols
    modes.foreach { m =>
      val t0 = System.nanoTime()
      val out = m match {
        case "window" => operators.Tokenize.tokenizeRank(df, cols, tiebreak)
        case "melt" => operators.Tokenize.tokenizeRankDistributed(df, cols, tiebreak)
        case _ => operators.Tokenize.tokenizeRankSelect(df, cols, tiebreak)
      }
      out.write.format("noop").mode("overwrite").save()
      println(f"$m%-8s ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
