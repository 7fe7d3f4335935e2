package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Y-1: backward as-of join semantics (union-merge formulation). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // right timeline: user 1 has states at t=10 and t=20; user 2 at t=15
  private lazy val right = Seq(
    (1L, 10L, "a", Some(1.0)),
    (1L, 20L, "b", None), // payload value null on a real right row
    (2L, 15L, "c", Some(3.0))
  ).toDF("user_id", "ts", "state", "score")

  private def asof(left: Seq[(Long, Long, Long)]) =
    AsOfJoin.backward(left.toDF("user_id", "ts", "event_id"), right,
        Seq("user_id"), "ts")
      .select($"event_id", $"asof_ts", $"state", $"score")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toList.sortBy(_._1)

  test("picks the most recent right row at or before the left ts") {
    val out = asof(Seq((1L, 15L, 100L), (1L, 25L, 101L)))
    assert(out == List((100L, 10L, "a", 1.0), (101L, 20L, "b", null)))
  }

  test("equal timestamps match inclusively") {
    val out = asof(Seq((1L, 20L, 102L)))
    assert(out == List((102L, 20L, "b", null)))
  }

  test("left rows before any right row get all-null payloads") {
    val out = asof(Seq((1L, 5L, 103L), (3L, 50L, 104L)))
    assert(out == List((103L, null, null, null), (104L, null, null, null)))
  }

  test("null payload values fill atomically from the matched row") {
    // t=25 matches the t=20 row whose score is null — score must be
    // null (from that row), NOT 1.0 leaked forward from t=10
    val out = asof(Seq((1L, 25L, 105L)))
    assert(out == List((105L, 20L, "b", null)))
  }

  test("keys never cross-fill") {
    val out = asof(Seq((2L, 100L, 106L)))
    assert(out == List((106L, 15L, "c", 3.0)))
  }

  test("forward variant picks the earliest right row at or after the left ts") {
    val out = AsOfJoin.forward(
        Seq((1L, 15L, 200L), (1L, 20L, 201L), (1L, 21L, 202L), (2L, 99L, 203L))
          .toDF("user_id", "ts", "event_id"),
        right, Seq("user_id"), "ts")
      .select($"event_id", $"asof_ts", $"state")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1), r.getString(2))).toList.sortBy(_._1)
    // 15→next is 20; 20→inclusive match at 20; 21→none; user 2 at 99→none
    assert(out == List((200L, 20L, "b"), (201L, 20L, "b"),
      (202L, null, null), (203L, null, null)))
  }

  test("null keys and null timestamps never match (SQL join semantics)") {
    val l = Seq((Some(1L), Some(30L), 300L), (None, Some(30L), 301L),
        (Some(1L), None, 302L))
      .toDF("user_id", "ts", "event_id")
    val r = Seq((Some(1L), Some(10L), "a"), (None, Some(5L), "nullkey"),
        (Some(1L), None, "nullts"))
      .toDF("user_id", "ts", "state")
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        Seq[String], String) => org.apache.spark.sql.DataFrame) =
      f(l, r, Seq("user_id"), "ts")
        .select($"event_id", $"state")
        .collect().map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    // backward: only the real (1, 10, "a") row can fill; null-key and
    // null-ts rows on either side stay unmatched
    assert(run(AsOfJoin.backward(_, _, _, _)) ==
      Map(300L -> Some("a"), 301L -> None, 302L -> None))
    // forward: no right row at-or-after ts=30 → all unmatched
    assert(run(AsOfJoin.forward(_, _, _, _)) ==
      Map(300L -> None, 301L -> None, 302L -> None))
  }

  test("tolerance reverts too-distant matches to nulls") {
    // right rows for user 1 at t=10 and t=20; a left row at t=35 is 15
    // units past the latest right row — within tol=20, outside tol=10
    def run(tol: Long) = AsOfJoin.backward(
        Seq((1L, 35L, 400L)).toDF("user_id", "ts", "event_id"),
        right, Seq("user_id"), "ts", tolerance = Some(tol))
      .select($"event_id", $"asof_ts")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(run(20L) == Map(400L -> 20L))
    assert(run(10L) == Map(400L -> null))
    // forward: gap measured the other way
    val fwd = AsOfJoin.forward(
        Seq((1L, 5L, 401L)).toDF("user_id", "ts", "event_id"),
        right, Seq("user_id"), "ts", tolerance = Some(3L))
      .select($"asof_ts").collect().head
    assert(fwd.isNullAt(0)) // nearest following is t=10, gap 5 > 3
  }

  test("colliding left/right column names are rejected up front") {
    val l = Seq((1L, 1L, "x")).toDF("user_id", "ts", "state")
    val r = Seq((1L, 1L, "y")).toDF("user_id", "ts", "state")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, Seq("user_id"), "ts")
    }
    assert(e.getMessage.contains("state"))
  }

  test("a marker name colliding with a right payload, key, or ts is rejected") {
    val l = Seq((1L, 1L, "x")).toDF("user_id", "ts", "lv")
    // right payload already has an asof_ts column: the fill struct
    // would carry two fields of one name
    val r = Seq((1L, 1L, 9L)).toDF("user_id", "ts", "asof_ts")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, Seq("user_id"), "ts")
    }
    assert(e.getMessage.contains("asof_ts"))
    val r2 = Seq((1L, 1L, "y")).toDF("user_id", "ts", "rv")
    intercept[IllegalArgumentException] { // marker = ts column
      AsOfJoin.backward(l, r2, Seq("user_id"), "ts", asofTsAs = "ts")
    }
    intercept[IllegalArgumentException] { // marker = a key
      AsOfJoin.backward(l, r2, Seq("user_id"), "ts", asofTsAs = "user_id")
    }
  }

  test("reserved internal names are rejected: a left __filled would be silently replaced") {
    // withColumn(\"__filled\", ...) REPLACES an existing column of that
    // name — the user's data would be re-emitted as the fill struct
    // with no error (unlike __side/__fill, which fail as duplicates)
    val l = Seq((1L, 1L, "x")).toDF("user_id", "ts", "__filled")
    val r = Seq((1L, 1L, "y")).toDF("user_id", "ts", "rv")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, Seq("user_id"), "ts")
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
    val r3 = Seq((1L, 1L, "y")).toDF("user_id", "ts", "__side")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(Seq((1L, 1L, "x")).toDF("user_id", "ts", "lv"),
        r3, Seq("user_id"), "ts")
    }
  }

  test("matches a per-key scan of the timeline on random data") {
    val rnd = new scala.util.Random(7)
    val rs = (1 to 60).map(_ => (rnd.nextInt(4).toLong, rnd.nextInt(40).toLong))
      .distinct.map { case (u, t) => (u, t, s"s$u-$t", Some(t.toDouble)) }
    val ls = (1 to 80).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i.toLong))
    val got = AsOfJoin.backward(ls.toDF("user_id", "ts", "event_id"),
        rs.toDF("user_id", "ts", "state", "score"), Seq("user_id"), "ts")
      .select($"event_id", $"state")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val byUser = rs.groupBy(_._1)
    val want = ls.map { case (u, t, id) =>
      id -> byUser.getOrElse(u, Nil).filter(_._2 <= t).sortBy(_._2).lastOption.map(_._3)
    }.toMap
    assert(got == want)
  }
}
