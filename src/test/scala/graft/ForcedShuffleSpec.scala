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

  test("unhinted-join queries are result-identical with auto-broadcast disabled") {
    val names = Seq("j6_equi_join", "d5_embedding_neardup", "d10_pq_neardup",
      "c1_decontaminate", "n7_knn_join", "y4_band_join", "t10_heavy_hitters",
      "c2_dup_clusters", "w7_funnel")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    for (name <- names) {
      val withBroadcast = rows(name)
      val forced = try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        rows(name)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      assert(forced == withBroadcast,
        s"$name diverges under forced shuffle joins " +
          s"(${forced.size} vs ${withBroadcast.size} rows)")
    }
  }
}
