import org.apache.spark.sql.SparkSession
object ExplainJ1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.MatchQueries.queries("j1_blocked_join")(spark, "/root/testdata/sf0.01")
    df.explain("formatted")
    spark.stop()
  }
}
