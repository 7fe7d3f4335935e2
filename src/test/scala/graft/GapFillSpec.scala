package graft

import graft.operators.GapFill

/** W-5: fixed-step grid + forward fill. */
class GapFillSpec extends SparkSpec {
  import spark.implicits._

  test("grid spans first..last bucket; gaps carry the last observation") {
    // key 1: obs at t=5 (v=1.0), t=25 (v=2.0), step 10 → buckets 0..2,
    // bucket 1 is a gap filled with 1.0
    // key 2: single obs → single-bucket grid
    val df = Seq((1L, 5L, 1.0), (1L, 25L, 2.0), (2L, 99L, 9.0))
      .toDF("k", "ts", "v")
    val out = GapFill.forwardFill(df, "k", "ts", "v", step = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out == Map(
      (1L, 0L) -> (1.0, false),
      (1L, 1L) -> (1.0, true),
      (1L, 2L) -> (2.0, false),
      (2L, 9L) -> (9.0, false)))
  }

  test("negative timestamps bucket by FLOOR division (DuckDB // parity)") {
    // ts=-1 with step=10 must land in bucket -1 (floor), not bucket 0
    // (DIV's truncation toward zero) — otherwise the zero bucket is
    // double-width across the epoch boundary and the grid span, fill
    // order, and the w5 oracle's `//` all diverge
    val df = Seq((1L, -1L, 1.0), (1L, 12L, 2.0)).toDF("k", "ts", "v")
    val out = GapFill.forwardFill(df, "k", "ts", "v", step = 10L)
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(out == Map(
      -1L -> (1.0, false), 0L -> (1.0, true), 1L -> (2.0, false)))
  }

  test("within a bucket the latest observation wins, ties on value") {
    val df = Seq((1L, 3L, 5.0), (1L, 7L, 8.0), // same bucket, t=7 wins
      (1L, 7L, 6.0)) // exact ts tie → greater value deterministically
      .toDF("k", "ts", "v")
    val out = GapFill.forwardFill(df, "k", "ts", "v", step = 10L)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out == Map(0L -> 8.0))
  }

  test("a null-valued event is not an observation: never fills, its bucket is a gap") {
    // engines disagree on null-field struct ordering (Spark lowest,
    // DuckDB highest), so a null value reaching the within-bucket max
    // would break oracle parity at ts ties — and a null can't be a
    // forward-fillable value anyway. It still anchors the grid span.
    val df = Seq((1L, 5L, Some(1.0)), (1L, 17L, None), // null at ts=17 ties nothing
      (1L, 25L, Some(3.0))).toDF("k", "ts", "v")
    val out = GapFill.forwardFill(df, "k", "ts", "v", step = 10L)
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out == Map(
      0L -> (1.0, false),
      1L -> (1.0, true), // the null-valued event's bucket: gap, filled from below
      2L -> (3.0, false)))
    // tie case: null value at the same ts as a real one must lose in
    // both engines — the real value wins the bucket
    val tie = Seq((1L, 7L, Some(2.0)), (1L, 7L, None)).toDF("k", "ts", "v")
    val tieOut = GapFill.forwardFill(tie, "k", "ts", "v", step = 10L)
      .collect().map(r => (r.getDouble(2), r.getBoolean(3))).toSeq
    assert(tieOut == Seq((2.0, false)))
  }

  test("a corrupt sentinel timestamp fails the span guard with a usable message") {
    // one epoch-0 row for a key living in 2026 would otherwise explode
    // ~half a million filler buckets through sequence()
    val df = Seq((1L, 0L, 1.0), (1L, 1767225600000000L, 2.0)).toDF("k", "ts", "v")
    val e = intercept[Exception] {
      GapFill.forwardFill(df, "k", "ts", "v", step = 3600000000L,
        maxBucketsPerKey = 1L << 16).collect()
    }
    assert(e.getMessage.contains("grid steps"), e.getMessage)
    // the guard is a knob, not a wall: the default admits this span
    // (~491k hourly buckets over 56 years)
    assert(GapFill.forwardFill(df, "k", "ts", "v",
      step = 3600000000L).count() > 490000)
  }
}
