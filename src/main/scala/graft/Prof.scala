import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    println("=== q_filter_project ===")
    graft.operators.Relational.qFilterProject(spark, dir).explain("formatted")
    println("=== q_join_star ===")
    graft.operators.Relational.qJoinStar(spark, dir).explain("formatted")
    println("=== q1_pricing_summary ===")
    graft.operators.Relational.q1PricingSummary(spark, dir).explain("formatted")
    spark.stop()
  }
}
