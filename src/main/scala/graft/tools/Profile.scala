package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Stage-level profiling of the bench hotspots. */
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
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    spark.read.parquet(s"$d/customer.parquet").count()
    spark.read.parquet(s"$d/documents.parquet").count()

    // ── u1 stages ──
    val ccCols = Seq(
      "c_custkey AS cc_id",
      "concat('https://www.c', CAST(c_custkey AS STRING), '.com.au') AS website_url",
      """CASE CAST(c_custkey % 5 AS INT)
        | WHEN 0 THEN concat(c_name, ' Pty Ltd | Home')
        | WHEN 1 THEN concat('The ', c_name, ' Group')
        | WHEN 2 THEN concat('RSS ', c_name)
        | WHEN 3 THEN '  '
        | ELSE concat(c_name, ' & Associates (AU)')
        |END AS company_name""".stripMargin,
      "CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 'Technology' WHEN 1 THEN 'Mining' ELSE NULL END AS industry")
    val customer = spark.read.parquet(s"$d/customer.parquet")
    val cc = Tables.spread(customer.filter(col("c_custkey") % 7 === 0).selectExpr(ccCols: _*))
    val abr = Tables.spread(customer.selectExpr(
      "CAST(c_custkey AS STRING) AS abn", "c_name AS entity_name",
      "c_mktsegment AS entity_type", "'Active' AS entity_status",
      "'' AS address", "'' AS postcode", "'' AS state", "CAST(NULL AS DATE) AS start_date")
      .orderBy(col("abn")).limit(10000))
    time("u1 cleanCandidates") {
      graft.pipeline.Pipeline.cleanCandidates(cc).count()
    }
    time("u1 buildUnified full") {
      graft.pipeline.Pipeline.buildUnified(abr, cc, "cc_id", 80).count()
    }

    // ── d2 stages ──
    val docs = Tables.spread(spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text")))
    val docs2 = docs.unionByName(docs.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" zz qq ww")).as("text")))
    time("d2 signatures only") {
      graft.operators.Dedup.minhashSignatures(docs2, "doc_id", "text", 3, 16, 4).count()
    }
    time("d2 pairs full") {
      graft.operators.Dedup.minhashPairs(docs2, "doc_id", "text", 3, 16, 4, 50).count()
    }

    // ── j3 ──
    time("j3 full") {
      graft.queries.MatchQueries.queries("j3_topk_candidates")(spark, d).count()
    }

    // ── d5 stages (LSH-bucket-blocked embedding near-dup) ──
    val emb = Tables.spread(spark.read.parquet(s"$d/embeddings.parquet"))
    time("d5 prep (vec+nrm+buckets)") {
      emb.select(col("vec_id"),
          graft.functions.Vectors.lshBucketsAll(
            org.apache.spark.sql.functions.transform(col("embedding"), x => x.cast("double")), 8, 4).as("b"))
        .count()
    }
    time("d5 full") {
      graft.queries.DedupQueries.queries("d5_embedding_neardup")(spark, d).count()
    }
    time("d5 full (2nd)") {
      graft.queries.DedupQueries.queries("d5_embedding_neardup")(spark, d).count()
    }

    // ── x3 (KMV + median) ──
    time("x3 kmv only") {
      graft.operators.Sketches.kmvDistinctEstimate(
        spark.read.parquet(s"$d/lineitem.parquet"), "l_orderkey", 256).count()
    }
    time("x3 full") {
      graft.queries.ScaleQueries.queries("x3_approx_stats")(spark, d).count()
    }

    // ── u1/a7/u2 shared-intermediate check ──
    time("u1 query (memoized)") {
      graft.queries.PipelineQueries.queries("u1_unified_pipeline")(spark, d).count()
    }
    time("u2 after u1 (cache hit)") {
      graft.queries.PipelineQueries.queries("u2_quality_report")(spark, d).count()
    }
    time("a7 (match memo)") {
      graft.queries.MatchQueries.queries("a7_match_rate")(spark, d).count()
    }
    spark.stop()
  }
}
