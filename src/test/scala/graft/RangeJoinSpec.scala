package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Y-2: bucket-decomposed point-in-interval join. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(points: Seq[Long], ivs: Seq[(String, Long, Long)], width: Long) =
    RangeJoin.pointInInterval(
        points.toDF("p"), "p",
        ivs.toDF("name", "lo", "hi"), "lo", "hi", width)
      .select($"p", $"name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("bounds are inclusive-lo, exclusive-hi") {
    val out = run(Seq(9L, 10L, 19L, 20L), Seq(("i", 10L, 20L)), width = 7L)
    assert(out == Set((10L, "i"), (19L, "i")))
  }

  test("overlapping intervals each match; pairs appear exactly once") {
    val rows = RangeJoin.pointInInterval(
        Seq(15L).toDF("p"), "p",
        Seq(("a", 0L, 100L), ("b", 10L, 20L), ("c", 16L, 30L)).toDF("name", "lo", "hi"),
        "lo", "hi", width = 3L)
      .select($"name").collect().map(_.getString(0)).toList.sorted
    assert(rows == List("a", "b")) // no dup even though "a" spans 34 buckets
  }

  test("negative coordinates bucket correctly (floor, not truncate)") {
    val out = run(Seq(-15L, -10L, -1L, 0L), Seq(("n", -12L, 0L)), width = 10L)
    assert(out == Set((-10L, "n"), (-1L, "n")))
  }

  test("pointInInterval rejects shared column names up front") {
    // both sides keep all columns through the bucket join; a shared
    // name would make the exact re-check predicate ambiguous
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(
        Seq(1L).toDF("p"), "p",
        Seq(("a", 0L, 10L)).toDF("p", "lo", "hi"), "lo", "hi", 10L)
    }
    assert(e.getMessage.contains("p"))
  }

  test("empty and degenerate intervals match nothing") {
    assert(run(Seq(5L), Seq(("e", 5L, 5L), ("r", 6L, 4L)), width = 2L).isEmpty)
  }

  test("equals the naive inequality join on random data") {
    val rnd = new scala.util.Random(11)
    val pts = (1 to 300).map(_ => rnd.nextLong() % 1000)
    val ivs = (1 to 40).map { i =>
      val lo = rnd.nextLong() % 800
      (s"iv$i", lo, lo + rnd.nextInt(300))
    }
    val got = run(pts, ivs, width = 37L)
    val want = (for {
      p <- pts; (n, lo, hi) <- ivs; if p >= lo && p < hi
    } yield (p, n)).toSet
    assert(got == want)
  }

  test("a sentinel interval fails loudly instead of exploding") {
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(
        Seq(5L).toDF("p"), "p",
        Seq(("inf", 0L, Long.MaxValue)).toDF("name", "lo", "hi"),
        "lo", "hi", width = 10L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.toString +: messages(x.getCause))
    assert(messages(e).exists(_.contains("widen the bucket")), e.toString)
  }

  test("bandJoin equals the naive |diff|<=delta join, each pair exactly once") {
    val rnd = new scala.util.Random(23)
    val left = (1 to 200).map(i => (rnd.nextInt(4).toLong, i.toLong, rnd.nextLong() % 500))
    val right = (1 to 200).map(i => (rnd.nextInt(4).toLong, (1000 + i).toLong, rnd.nextLong() % 500))
    val delta = 37L
    val got = RangeJoin.bandJoin(
        left.toDF("k", "id", "t"), right.toDF("k", "id", "t"), Seq("k"), "t", delta)
      .select($"id", $"id_r").collect().map(r => (r.getLong(0), r.getLong(1))).toList
    val want = (for {
      (lk, li, lt) <- left; (rk, ri, rt) <- right
      if lk == rk && math.abs(lt - rt) <= delta
    } yield (li, ri)).toList
    assert(got.sorted == want.sorted) // list compare: duplicates would fail
  }

  test("bandJoin boundary is inclusive at exactly delta") {
    val l = Seq((1L, 10L, 0L)).toDF("k", "id", "t")
    val r = Seq((1L, 20L, 5L), (1L, 21L, 6L), (1L, 22L, -5L)).toDF("k", "id", "t")
    val got = RangeJoin.bandJoin(l, r, Seq("k"), "t", 5L)
      .select($"id_r").collect().map(_.getLong(0)).toSet
    assert(got == Set(20L, 22L))
  }

  test("intervalOverlap equals the naive overlap join, each pair exactly once") {
    val rnd = new scala.util.Random(29)
    def mk(base: Long) = (1 to 120).map { i =>
      val lo = rnd.nextLong() % 400
      (base + i, lo, lo + 1 + rnd.nextInt(120))
    }
    val a = mk(0); val b = mk(10000)
    val got = RangeJoin.intervalOverlap(
        a.toDF("id", "lo", "hi"), b.toDF("id", "lo", "hi"), Seq.empty,
        "lo", "hi", width = 43L)
      .select($"id", $"id_r").collect().map(r => (r.getLong(0), r.getLong(1))).toList
    val want = (for {
      (ai, alo, ahi) <- a; (bi, blo, bhi) <- b
      if alo < bhi && blo < ahi
    } yield (ai, bi)).toList
    assert(got.sorted == want.sorted)
  }

  test("intervalOverlap: touching intervals do not overlap; empty dropped") {
    val a = Seq((1L, 0L, 10L)).toDF("id", "lo", "hi")
    val b = Seq((2L, 10L, 20L), (3L, 9L, 11L), (4L, 5L, 5L)).toDF("id", "lo", "hi")
    val got = RangeJoin.intervalOverlap(a, b, Seq.empty, "lo", "hi", 7L)
      .select($"id_r").collect().map(_.getLong(0)).toSet
    assert(got == Set(3L))
  }

  test("plan is an equi-join — no BroadcastNestedLoop or cartesian") {
    def assertEqui(df: org.apache.spark.sql.DataFrame): Unit = {
      df.collect() // settle AQE so the final physical plan is inspectable
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    }
    assertEqui(RangeJoin.pointInInterval(
      spark.range(1000).select($"id".as("p")), "p",
      Seq(("i", 10L, 500L)).toDF("name", "lo", "hi"), "lo", "hi", 50L))
    val ev = spark.range(1000).select(($"id" % 7).as("k"), $"id".as("id"), ($"id" * 13 % 997).as("t"))
    assertEqui(RangeJoin.bandJoin(ev, ev, Seq("k"), "t", 20L))
    val iv = spark.range(500).select($"id", ($"id" * 11 % 800).as("lo"), ($"id" * 11 % 800 + 30).as("hi"))
    assertEqui(RangeJoin.intervalOverlap(iv, iv, Seq.empty, "lo", "hi", 25L))
  }

  test("_r-suffix collisions are rejected up front, not as downstream ambiguity") {
    // left already carrying x_r, or right carrying both x and x_r,
    // would silently emit duplicate attribute names and fail with
    // AMBIGUOUS_REFERENCE far from the call site
    val l = Seq((1L, 2L, 3L)).toDF("k", "t", "t_r")
    val r = Seq((1L, 2L)).toDF("k", "t")
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.bandJoin(l, r, Seq("k"), "t", 5L)
    }
    assert(e1.getMessage.contains("_r"), e1.getMessage)
    val rDup = Seq((1L, 2L, 9L)).toDF("lo", "hi", "lo_r")
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(Seq((1L, 2L)).toDF("lo", "hi"), rDup,
        Seq.empty, "lo", "hi", 5L)
    }
    assert(e2.getMessage.contains("_r-suffixed"), e2.getMessage)
  }

  test("an unbounded-below sentinel fails with a usable message, not ARITHMETIC_OVERFLOW") {
    // lo near Long.MinValue overflows x - pmod before the span guard
    // could run; the floor-div guard names the problem instead
    val points = Seq(5L).toDF("p")
    val iv = Seq((Long.MinValue + 1, 100L)).toDF("lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "p", iv, "lo", "hi", 50L).collect()
    }
    assert(e.getMessage.contains("sentinel"), e.getMessage)
  }
}
