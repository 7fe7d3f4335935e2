package graft

import org.apache.spark.sql.functions.{concat, lit}
import graft.operators.MatchJoin

/** Fixture bands per FIXTURES.md §A: auto-match per scorer, keyword-only
  * match, 60-79 reject band, <60, and candidate tie. */
class MatchJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "Acme Widgets Pty Ltd"),    // exact-ish: token_set 100 vs cand 10
    (2L, "Bolt Fabrication"),        // vs "Fabrication Bolt Co" → token_sort 100
    (3L, "Quokka Mining"),           // no candidate anywhere near → no match
    (4L, "Delta Epsilon Gamma Pty"), // keyword overlap with cand 40
    (5L, "Zeta Partners")            // mid-band ~60-79 vs cand 50 → reject
  ).toDF("abn", "entity_name")

  private val right = Seq(
    (10L, "Acme Widgets (Australia) | Home"),
    (20L, "Fabrication Bolt Co - Contact"),
    (40L, "Gamma Epsilon Delta Services"),
    (50L, "Zeta Partnership Holdings XYZA"),
    (60L, "Totally Unrelated Plumbing")
  ).toDF("cc_id", "company_name")

  private lazy val result = MatchJoin.broadcastJoin(
    left, "abn", "entity_name", right, "cc_id", "company_name", 80)
    .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(4))).toMap

  test("token-set / token-sort / keyword strategies each produce accepts") {
    assert(result(1L) == (10L, 100)) // ACME WIDGETS ⊂ ACME WIDGETS PROPRIETARY LIMITED
    assert(result(2L) == (20L, 100)) // sorted tokens equal after normalize
    assert(result(4L)._1 == 40L)     // keyword Jaccard (same 3 keywords)
    assert(result(4L)._2 >= 80)
  }

  test("sub-cutoff candidates rejected") {
    assert(!result.contains(3L))
    assert(!result.contains(5L))
  }

  test("argmax tie-break keeps lowest right key") {
    val l = Seq((9L, "Mirror Image")).toDF("abn", "entity_name")
    val r = Seq((101L, "Mirror Image"), (100L, "Mirror Image")).toDF("cc_id", "company_name")
    val m = MatchJoin.broadcastJoin(l, "abn", "entity_name", r, "cc_id", "company_name", 80)
      .collect()
    assert(m.length == 1 && m.head.getLong(2) == 100L)
  }

  test("blocked join agrees with broadcast join on rare-token data") {
    val b = MatchJoin.blockedJoin(
      left, "abn", "entity_name", right, "cc_id", "company_name", 80, maxTokenFreq = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(4))).toMap
    assert(b == result)
  }

  test("top-k candidates ranked by score then key") {
    val tk = MatchJoin.topKCandidates(
      left.filter($"abn" === 1L), "abn", "entity_name", right, "cc_id", "company_name", 3)
      .collect()
    assert(tk.length == 3)
    assert(tk.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
    val scores = tk.map(_.getInt(2)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("native exact ratio equals declarative ratio on a corpus") {
    val names = spark.read.parquet(s"$sf/customer.parquet").limit(1000)
      .select($"c_name".as("a"),
        concat(lit("The "), $"c_name", lit(" Pty | x")).as("b"))
      .select(graft.functions.Names.normalizeName($"a").as("na"),
        graft.functions.Names.normalizeName($"b").as("nb"))
    val bad = names.select(
        graft.plans.RatioScore.column($"na", $"nb").as("nat"),
        graft.functions.Similarity.ratio($"na", $"nb").as("dec"))
      .filter($"nat" =!= $"dec").count()
    assert(bad == 0, "native ratio diverges from declarative levenshtein ratio")
  }
}
