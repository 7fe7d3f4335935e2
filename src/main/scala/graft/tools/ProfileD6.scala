import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileD6 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $n%-22s ${(System.nanoTime()-t0)/1e9}%6.2f rows=$r")
    }
    val docs = spark.read.parquet(s"$d/documents.parquet").select(col("doc_id"), col("text"))
    val all = docs.unionByName(docs.select((col("doc_id")+100000).as("doc_id"),
      concat(col("text"), lit(" zz qq ww")).as("text")))
    val sims = graft.operators.Dedup.simhashes(graft.model.Tables.spread(all), "doc_id", "text", 48)
    time("sims") { sims.count() }
    val p = graft.operators.Dedup.simhashNearDup(all, "doc_id", "text", 48, 3, 4)
    time("full neardup") { p.count() }
    time("full again") { p.count() }
    spark.stop()
  }
}
