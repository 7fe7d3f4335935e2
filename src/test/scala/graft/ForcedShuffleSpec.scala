package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Execution-robustness sweeps: results must be identical whatever the
  * runtime picks — broadcast vs shuffle joins, AQE re-planning on or
  * off, and any shuffle partition count (FP addition order).
  *
  * At 100 TB the shuffle paths are what actually run — "small" sides
  * stop fitting the broadcast threshold — so correctness must not
  * depend on AQE's local join choice. (Explicitly `broadcast()`-hinted
  * plans are unaffected by the threshold; the sweeps target the
  * AQE-decided ones.)
  *
  * NB: memo-backed queries (d5/c2/d2 route through persisted TrieMap
  * memos) would serve the SECOND run from cache and make the sweep
  * vacuous — those operators are rebuilt fresh per run here instead of
  * going through SparkEntry.
  */
class ForcedShuffleSpec extends SparkSpec {

  private def docs: DataFrame = spark.read.parquet(s"$sf/documents.parquet")
    .selectExpr("doc_id", "text")
  private def vecs: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")
    .selectExpr("vec_id", "embedding")

  // fresh plans per invocation — conf changes apply to every run
  private val targets: Map[String, () => DataFrame] = Map(
    "j6_equi_join" -> (() => SparkEntry.queries("j6_equi_join")(spark, sf)),
    "c1_decontaminate" -> (() => SparkEntry.queries("c1_decontaminate")(spark, sf)),
    "n7_knn_join" -> (() => SparkEntry.queries("n7_knn_join")(spark, sf)),
    "y4_band_join" -> (() => SparkEntry.queries("y4_band_join")(spark, sf)),
    "t10_heavy_hitters" -> (() => SparkEntry.queries("t10_heavy_hitters")(spark, sf)),
    "w7_funnel" -> (() => SparkEntry.queries("w7_funnel")(spark, sf)),
    "d10_pq_neardup" -> (() => SparkEntry.queries("d10_pq_neardup")(spark, sf)),
    "minhash_pairs(fresh)" -> (() =>
      graft.operators.Dedup.minhashPairs(docs, "doc_id", "text", 3, 16, 4, 50)),
    "dup_clusters(fresh)" -> (() =>
      graft.operators.Components.connectedComponentsStar(
        graft.operators.Dedup.minhashPairs(docs, "doc_id", "text", 3, 16, 4, 50),
        "id_a", "id_b")),
    "embedding_knn(fresh)" -> (() =>
      graft.operators.SimilaritySearch.knnJoin(vecs, "vec_id", "embedding", 3, 6, 2)),
    "span_dedup(fresh)" -> (() =>
      graft.operators.Dedup.spanDedup(docs, "doc_id", "text", 16)),
    "incr_span_dedup(fresh)" -> (() =>
      graft.operators.Dedup.incrementalSpanDedup(
        docs.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 500000).as("doc_id"), col("text")),
        graft.operators.Dedup.spanStore(docs, "doc_id", "text", 16),
        "doc_id", "text", 16)),
    "t11_oov_unk" -> (() => SparkEntry.queries("t11_oov_unk")(spark, sf)),
    "substring_scrub(fresh)" -> (() =>
      graft.operators.Dedup.dedupSubstrings(docs, "doc_id", "text", 8)),
    "incr_substring_scrub(fresh)" -> (() =>
      graft.operators.Dedup.incrementalSubstringScrub(
        docs.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 500000).as("doc_id"), col("text")),
        graft.operators.Dedup.substringGramStore(docs, "text", 8),
        "doc_id", "text", 8)),
    "incr_winnowing(fresh)" -> (() =>
      graft.operators.Dedup.incrementalWinnowingOverlap(
        docs.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 500000).as("doc_id"), col("text")),
        graft.operators.Dedup.winnowedFingerprints(docs, "doc_id", "text", 3, 4),
        "doc_id", "text", 3, 4, minShared = 3, fpDfCap = 100)),
    // the model join is the operator's scale story: a production model
    // exceeds the broadcast threshold, so the shuffle-hash fallback
    // must be byte-equal
    "t13_classifier_score" -> (() => SparkEntry.queries("t13_classifier_score")(spark, sf))
  )

  private def rows(name: String): Seq[String] =
    targets(name)().collect().map(_.toString).sorted.toSeq

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.get(key)
    try { spark.conf.set(key, value); body }
    finally spark.conf.set(key, prev)
  }

  test("unhinted-join operators are result-identical with auto-broadcast disabled") {
    val names = Seq("j6_equi_join", "c1_decontaminate", "n7_knn_join",
      "y4_band_join", "t10_heavy_hitters", "w7_funnel", "d10_pq_neardup",
      "minhash_pairs(fresh)", "dup_clusters(fresh)", "embedding_knn(fresh)",
      "span_dedup(fresh)", "incr_span_dedup(fresh)", "t11_oov_unk",
      "t13_classifier_score", "substring_scrub(fresh)",
      "incr_substring_scrub(fresh)", "incr_winnowing(fresh)")
    for (name <- names) {
      val withBroadcast = rows(name)
      val forced = withConf("spark.sql.autoBroadcastJoinThreshold", "-1")(rows(name))
      assert(forced == withBroadcast,
        s"$name diverges under forced shuffle joins " +
          s"(${forced.size} vs ${withBroadcast.size} rows)")
    }
  }

  test("operators are result-identical with AQE disabled") {
    // AQE re-plans joins, coalesces partitions, and splits skew at
    // runtime — none of which may change RESULTS
    val names = Seq("minhash_pairs(fresh)", "embedding_knn(fresh)",
      "n7_knn_join", "d10_pq_neardup", "w7_funnel", "span_dedup(fresh)",
      "substring_scrub(fresh)")
    for (name <- names) {
      val adaptive = rows(name)
      val static = withConf("spark.sql.adaptive.enabled", "false")(rows(name))
      assert(static == adaptive, s"$name diverges with AQE off")
    }
  }

  test("FP-aggregating queries are partition-count invariant") {
    // partition count changes FP addition order; the declared rounding
    // discipline (round / integer units / dyadic values) must absorb it
    val names = Seq("a2_pricing_summary", "w2_user_running", "x1_salted_agg",
      "u2_quality_report", "t2_quality_score", "x3_approx_stats",
      // not FP — pinned here because its two-stage offset construction
      // must yield the same global rank at ANY partition count
      "p9_epoch_ordinals")
    def qrows(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sf).collect().map(_.toString).sorted.toSeq
    for (name <- names) {
      val p4 = qrows(name)
      val p7 = withConf("spark.sql.shuffle.partitions", "7")(qrows(name))
      assert(p7 == p4, s"$name diverges at a different shuffle partition count")
    }
  }
}
