package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Stage-level profiling of the bench hotspots; each measurement runs
  * twice so driver-side planning+codegen (first run) separates from
  * executor time (second run).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time2(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val df = f
      val t0 = System.nanoTime(); val n1 = df.count()
      val t1 = System.nanoTime(); val n2 = df.count()
      val t2 = System.nanoTime()
      println(f"PROF $name%-28s run1=${(t1 - t0) / 1e9}%7.2f  run2=${(t2 - t1) / 1e9}%7.2f  rows=$n1")
    }
    spark.read.parquet(s"$d/customer.parquet").count()

    // ── j1 stages ──
    val queries = graft.queries.MatchQueries.queries
    time2("j1_similarity_join") { queries("j1_similarity_join")(spark, d) }
    time2("j3_topk_candidates") { queries("j3_topk_candidates")(spark, d) }
    time2("j1_blocked_join") { queries("j1_blocked_join")(spark, d) }
    time2("a6_argmax") { graft.queries.CoreQueries.queries("a6_argmax")(spark, d) }

    // ── u1 stages ──
    time2("u1_unified") { graft.queries.PipelineQueries.queries("u1_unified_pipeline")(spark, d) }

    // ── dedup / ann ──
    time2("d2_minhash_pairs") { graft.queries.DedupQueries.queries("d2_minhash_pairs")(spark, d) }
    time2("n2_ann_lsh") { graft.queries.AnnQueries.queries("n2_ann_lsh")(spark, d) }
    time2("d1_exact_dedup") { graft.queries.DedupQueries.queries("d1_exact_dedup")(spark, d) }
    spark.stop()
  }
}
