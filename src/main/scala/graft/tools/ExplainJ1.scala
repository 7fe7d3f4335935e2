import org.apache.spark.sql.SparkSession
object ExplainJ1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.MatchQueries.queries("j1_similarity_join")(spark, "/root/testdata/sf0.01")
      .explain("formatted")
    graft.operators.Dedup.minhashPairs(
      spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select(org.apache.spark.sql.functions.col("doc_id"), org.apache.spark.sql.functions.col("text")),
      "doc_id", "text", 3, 16, 4, 50).explain("formatted")
    spark.stop()
  }
}
