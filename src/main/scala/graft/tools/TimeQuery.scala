package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one named query N times in isolation (profiling aid — the
  * cross-query Bench attributes shared memoized tables to whichever
  * query runs first, and ambient machine load swamps run-to-run
  * totals; this isolates a single operator's warm cost).
  *   sbt "runMain graft.tools.TimeQuery c2_dup_clusters 3 /root/testdata/sf0.1"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val d = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    val times = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, d).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"TIMES $name ${times.map(t => f"$t%.2f").mkString(" ")} min=${times.min}%.2f")
    spark.stop()
  }
}
