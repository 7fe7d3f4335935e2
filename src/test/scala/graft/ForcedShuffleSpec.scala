package graft

/** Broadcast-independence: the UNHINTED joins across the operator
  * library must produce byte-identical results when auto-broadcast is
  * disabled and every join falls back to shuffle-hash / sort-merge.
  * At 100 TB this is the path that actually runs — "small" sides stop
  * fitting the broadcast threshold — so correctness must not depend on
  * AQE's local join choice. (Explicitly `broadcast()`-hinted plans are
  * unaffected by the threshold; this sweep targets the AQE-decided
  * ones.)
  */
class ForcedShuffleSpec extends SparkSpec {

  private def rows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect().map(_.toString).sorted.toSeq
  }

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.get(key)
    try { spark.conf.set(key, value); body }
    finally spark.conf.set(key, prev)
  }

  test("unhinted-join queries are result-identical with auto-broadcast disabled") {
    val names = Seq("j6_equi_join", "d5_embedding_neardup", "d10_pq_neardup",
      "c1_decontaminate", "n7_knn_join", "y4_band_join", "t10_heavy_hitters",
      "c2_dup_clusters", "w7_funnel")
    for (name <- names) {
      val withBroadcast = rows(name)
      val forced = withConf("spark.sql.autoBroadcastJoinThreshold", "-1")(rows(name))
      assert(forced == withBroadcast,
        s"$name diverges under forced shuffle joins " +
          s"(${forced.size} vs ${withBroadcast.size} rows)")
    }
  }

  test("queries are result-identical with AQE disabled") {
    // AQE re-plans joins, coalesces partitions, and splits skew at
    // runtime — none of which may change RESULTS
    val names = Seq("d2_minhash_pairs", "d5_embedding_neardup", "n7_knn_join",
      "x2_salted_join", "u3_curation_pipeline")
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
      "u2_quality_report", "t2_quality_score", "x3_approx_stats")
    for (name <- names) {
      val p4 = rows(name)
      val p7 = withConf("spark.sql.shuffle.partitions", "7")(rows(name))
      assert(p7 == p4, s"$name diverges at a different shuffle partition count")
    }
  }
}
