package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** P-1/P-2/C-1/K-1: dataset-curation operators. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit is deterministic, exhaustive, and repartition-stable") {
    val df = spark.range(2000).select($"id".cast("string").as("k"))
    val a = Curation.hashSplit(df, "k").select($"k", $"bucket", $"split")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val b = Curation.hashSplit(df.repartition(13), "k").select($"k", $"bucket", $"split")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(a == b)
    assert(a.forall { case (_, bk, sp) =>
      bk >= 0 && bk < 1000 &&
        sp == (if (bk < 800) "train" else if (bk < 900) "val" else "test") })
    // md5 is uniform: each split lands within loose bounds of its share
    val n = a.groupBy(_._3).view.mapValues(_.size).toMap
    assert(n("train") > 1400 && n("val") > 120 && n("test") > 120)
    // NULL keys: deterministic quarantine to "test" (null bucket) —
    // never a crash, never a silent landing inside the training split
    val withNull = Curation.hashSplit(
        Seq(Some("k1"), None).toDF("k"), "k")
      .select($"k", $"split").collect()
      .map(r => Option(r.getString(0)) -> r.getString(1)).toMap
    assert(withNull(None) == "test")
  }

  test("stratifiedSample takes exactly k per stratum, deterministically") {
    val df = (1 to 500).map(i => (s"g${i % 7}", i.toLong)).toDF("g", "k")
    val s1 = Curation.stratifiedSample(df, Seq("g"), "k", 10)
      .select($"g", $"k").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val s2 = Curation.stratifiedSample(df.repartition(9), Seq("g"), "k", 10)
      .select($"g", $"k").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(s1 == s2)
    assert(s1.groupBy(_._1).forall(_._2.size == 10))
  }

  test("stratifiedSample: a null stratum is a real group, small strata kept whole") {
    val df = ((1 to 40).map(i => (Option(s"g${i % 2}"), i.toLong)) ++
      (41 to 60).map(i => (None: Option[String], i.toLong)) ++
      Seq((Option("tiny"), 999L)))
      .toDF("g", "k")
    val out = Curation.stratifiedSample(df, Seq("g"), "k", 5)
      .select($"g", $"k").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1)))
    // null stratum survives the (null-safe) edge join and yields its k
    assert(out.count(_._1.isEmpty) == 5)
    // a stratum smaller than k keeps everything it has
    assert(out.count(_._1.contains("tiny")) == 1)
    assert(out.count(_._1.contains("g0")) == 5 && out.count(_._1.contains("g1")) == 5)
  }

  test("stratifiedSample: NULL keys rank first and survive the bucket prefilter") {
    // null hashes sort first in the rank window, so null-key rows can
    // hold ranks <= k — the bucket prefilter must keep them (their
    // bucket is null; a bare __b <= edge comparison would drop them,
    // silently diverging from the plain-window form)
    val df = ((1 to 3).map(i => (Option.empty[String], "g", 1000 + i)) ++
      (1 to 10).map(i => (Option(s"k$i"), "g", i))).toDF("k", "g", "payload")
    val out = Curation.stratifiedSample(df, Seq("g"), "k", 5)
      .select($"payload").as[Int].collect().toSet
    // plain-window truth: rank by (hash asc NULLS FIRST, key asc)
    val plain = df.withColumn("__h",
        graft.functions.Hashing.hash64($"k".cast("string")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g")
          .orderBy($"__h".asc, $"k".asc)))
      .filter($"rk" <= 5).select($"payload").as[Int].collect().toSet
    assert(out == plain, s"prefiltered $out != plain-window $plain")
    assert(Set(1001, 1002, 1003).subsetOf(out),
      "all null-key rows rank before any hashed key")
  }

  test("balanceSources: a NULL source is a real group, never silently dropped") {
    // the null group is the SMALLEST source: it sets the target AND
    // must survive whole — the old using-join let it set the min and
    // then dropped its rows (the worst of both)
    val rows = (1 to 3).map(i => (s"n$i", Option.empty[String], 10L)) ++
      (1 to 100).map(i => (s"b$i", Option("big"), 10L))
    val df = rows.toDF("doc_id", "source", "tok")
    val kept = Curation.balanceSources(df, "source", "doc_id", $"tok")
      .select($"doc_id", $"source", $"target").collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2)))
    assert(kept.count(_._2.isEmpty) == 3,
      s"null-source rows must survive whole: $kept")
    assert(kept.forall(_._3 == 30L))
  }

  test("temperatureMix: a NULL source is a real group, never silently dropped") {
    val df = ((1 to 3).map(i => (s"n$i", Option.empty[String])) ++
      (1 to 100).map(i => (s"b$i", Option("big")))).toDF("id", "src")
    val out = Curation.temperatureMix(df, "src", "id")
      .select($"id", $"src").collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    assert(out.count(_._2.isEmpty) == 3,
      "null-source group is the smallest: threshold = scale, kept whole")
  }

  test("lengthOutliers examines NULL-group rows instead of dropping them") {
    val df = Seq((Option("a"), 10), (Option("a"), 100), (None, 5), (None, 50))
      .toDF("src", "len")
    val out = Curation.lengthOutliers(df, "src", "len", 50)
    assert(out.count() == 4, "every input row gets a flag")
    val nulls = out.filter($"src".isNull)
      .select($"len", $"is_outlier").as[(Int, Boolean)].collect().toSet
    // null group's 50th percentile (inclusive-rank) of {5, 50} is 5
    assert(nulls == Set((5, false), (50, true)))
  }

  test("chunkStarts kernel bitwise-equals the declarative filtered sequence") {
    // n spanning: 0 (the greatest(n-1,0) floor), 1, below/at/above one
    // chunk, stride-boundary values, large
    val ns = (Seq(0, 1, 2, 23, 24, 25, 31, 32, 33, 47, 48, 49, 100, 1000)
      ++ (0 to 200 by 7)).toDF("n")
    for ((chunkSize, stride) <- Seq((32, 24), (6, 4), (5, 5), (8, 1))) {
      val bad = ns.select(
          graft.plans.TokenExprs.chunkStarts($"n", chunkSize, stride).as("nat"),
          filter(sequence(lit(0), greatest($"n" - 1, lit(0)), lit(stride)),
            s => s === 0 || s + (chunkSize - stride) < $"n").as("dec"))
        .filter(!($"nat" <=> $"dec")).count()
      assert(bad == 0, s"chunkStarts($chunkSize, $stride) diverged from twin")
    }
  }

  test("chunkDocuments: NULL text yields no chunks, not a phantom row") {
    val df = Seq((1L, Option("a b c")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = Curation.chunkDocuments(df, "doc_id", "text", 6, 4)
    assert(out.select($"doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("packSequential rejects a non-positive budget") {
    val df = Seq(("s", 1L, 10)).toDF("part", "ord", "tok")
    val e = intercept[IllegalArgumentException] {
      Curation.packSequential(df, "part", "ord", "tok", budget = 0L)
    }
    assert(e.getMessage.contains("budget"))
  }

  test("weightedSample keeps rows with probability weight/denom, deterministically") {
    val df = spark.range(5000).select($"id".cast("string").as("k"),
      (($"id" % 100) + 1).cast("int").as("w"))
    val a = Curation.weightedSample(df, "k", $"w", denom = 100)
      .select($"k").as[String].collect().toSet
    val b = Curation.weightedSample(df.repartition(11), "k", $"w", denom = 100)
      .select($"k").as[String].collect().toSet
    assert(a == b)
    // mean weight is ~50.5/100 → expect ~2525 survivors; md5 uniformity
    // keeps the realized rate within a loose band
    assert(a.size > 2200 && a.size < 2850)
    // weight 0 never survives, weight >= denom always does
    val edge = Seq(("x", 0), ("y", 100), ("z", 100)).toDF("k", "w")
    val kept = Curation.weightedSample(edge, "k", $"w", denom = 100)
      .select($"k").as[String].collect().toSet
    assert(kept == Set("y", "z"))
  }

  test("balanceSources keeps the smallest source whole and downsamples the rest") {
    // source "small" totals 100 tokens; "big" totals 10000
    val rows = (1 to 10).map(i => (s"s$i", "small", 10L)) ++
      (1 to 1000).map(i => (s"b$i", "big", 10L))
    val df = rows.toDF("doc_id", "source", "tok")
    val kept = Curation.balanceSources(df, "source", "doc_id", $"tok")
      .select($"doc_id", $"source", $"src_total", $"target")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // target = min source total; hash % 100 < 100 always → small kept whole
    assert(kept.forall(_._4 == 100L))
    assert(kept.count(_._2 == "small") == 10)
    // big keeps ~1% (hash % 10000 < 100) — loose band around 10 of 1000
    val nBig = kept.count(_._2 == "big")
    assert(nBig > 0 && nBig < 60, s"big kept $nBig")
    // deterministic under repartition
    val again = Curation.balanceSources(df.repartition(7), "source", "doc_id", $"tok")
      .select($"doc_id").as[String].collect().toSet
    assert(again == kept.map(_._1).toSet)
  }

  test("percentileDisc is the exact inclusive-rank discrete percentile") {
    // group g: values 1..10 once each → p90 = smallest v with cdf >= 0.9 → 9
    // group h: heavy ties — 99×5 and 1×100 → p90 = 5, p100 = 100
    val df = ((1 to 10).map(v => ("g", v)) ++
      Seq.fill(99)(("h", 5)) ++ Seq(("h", 100))).toDF("grp", "v")
    def thr(p: Int) = Curation.percentileDisc(df, "grp", "v", p)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(thr(90) == Map("g" -> 9L, "h" -> 5L))
    assert(thr(100) == Map("g" -> 10L, "h" -> 100L))
    assert(thr(1) == Map("g" -> 1L, "h" -> 5L))
  }

  test("lengthOutliers flags exactly the rows above their group threshold") {
    val df = ((1 to 9).map(v => (s"d$v", "g", 10)) :+ (("dBig", "g", 500)))
      .toDF("doc_id", "grp", "v")
    val out = Curation.lengthOutliers(df, "grp", "v", 90)
      .collect().map(r => r.getAs[String]("doc_id") -> r.getAs[Boolean]("is_outlier"))
      .toMap
    // p90 of (10×9, 500): cdf(10)=9/10 >= 0.9 → threshold 10; only dBig above
    assert(out == ((1 to 9).map(v => s"d$v" -> false) :+ ("dBig" -> true)).toMap)
  }

  test("percentileDisc ignores NULL values; an all-NULL group survives lengthOutliers unflagged") {
    // NULL values would otherwise shift the threshold below the true
    // percentile AND diverge between engines (Spark windows sort NULLS
    // FIRST ascending, DuckDB NULLS LAST)
    val df = Seq(("a", "g", Some(10)), ("b", "g", None),
      ("c", "g", Some(20)), ("d", "g", Some(30)),
      ("e", "h", None)) // group h: all values NULL — no threshold
      .toDF("doc_id", "grp", "v")
    val th = Curation.percentileDisc(df, "grp", "v", 50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // p50 over (10, 20, 30) ignoring the NULL: 20, not 10
    assert(th == Map("g" -> 20L), s"NULL shifted the percentile: $th")
    val out = Curation.lengthOutliers(df, "grp", "v", 50)
      .collect().map(r => r.getAs[String]("doc_id") ->
        Option(r.getAs[java.lang.Boolean]("is_outlier"))).toMap
    // all five rows survive; null-valued rows and the thresholdless
    // group carry a NULL flag, never a silent drop
    assert(out.keySet == Set("a", "b", "c", "d", "e"), s"rows vanished: $out")
    assert(out("d").contains(true) && out("a").contains(false)
      && out("b").isEmpty && out("e").isEmpty, s"flags: $out")
  }

  test("balanceSources fails loudly on a source with no positive mass") {
    // a zero-total source would otherwise set target=0 and silently
    // EMPTY the whole corpus (or DIVIDE_BY_ZERO under ANSI)
    val df = Seq((1L, "big", 10L), (2L, "big", 10L), (3L, "empty", 0L))
      .toDF("doc_id", "source", "w")
    val e = intercept[Exception] {
      Curation.balanceSources(df, "source", "doc_id", col("w")).collect()
    }
    assert(e.getMessage.contains("positive weight mass"), e.getMessage)
  }

  test("hashSplit rejects degenerate shape parameters loudly") {
    val df = Seq((1L, "x")).toDF("id", "k")
    intercept[IllegalArgumentException] {
      Curation.hashSplit(df, "k", buckets = 0)
    }
    val e = intercept[IllegalArgumentException] {
      // buckets=100 with the default 800/900 thresholds would silently
      // label EVERY row train — test contamination, not an error
      Curation.hashSplit(df, "k", buckets = 100)
    }
    assert(e.getMessage.contains("thresholds"), e.getMessage)
  }

  test("decontaminate flags exactly the docs sharing a k-gram") {
    val test = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a lazy dog saw the quick brown fox leave"), // shares 2 trigrams
      (2L, "completely different words entirely here"),
      (3L, "quick brown fox") // short doc, shares 1 trigram
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, test, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }

  test("decontaminateBloom is output-identical to exact, even at heavy fp rates") {
    val test = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a lazy dog saw the quick brown fox leave"),
      (2L, "completely different words entirely here"),
      (3L, "quick brown fox")
    ).toDF("doc_id", "text")
    // undersized sketch (expectedGrams = 1) forces a high false-positive
    // rate: extra grams pass the probe, but the exact join must kill
    // every one of them — the contract is bit-identical output
    for (eg <- Seq(1L, 1L << 16)) {
      val out = Curation.decontaminateBloom(train, test, "doc_id", "text",
          k = 3, expectedGrams = eg)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(1L -> 2L, 3L -> 1L), s"expectedGrams=$eg")
    }
  }

  test("temperatureMix keeps the smallest source whole, others at sqrt rate") {
    // 900/400/100 rows: thresholds sqrt(1/9)=1/3, sqrt(1/4)=1/2, 1
    val df = ((1 to 900).map(i => (s"a$i", "big")) ++
      (1 to 400).map(i => (s"b$i", "mid")) ++
      (1 to 100).map(i => (s"c$i", "small"))).toDF("id", "src")
    val out = Curation.temperatureMix(df, "src", "id")
      .select($"id", $"src", $"keep_threshold")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc("small") == 100) // threshold = scale → everything kept
    assert(out.filter(_._2 == "big").forall(_._3 == 333333L))
    assert(out.filter(_._2 == "mid").forall(_._3 == 500000L))
    // md5 is uniform: kept counts land near n_s * sqrt(min/n_s)
    assert(math.abs(bySrc("big") - 300) < 60 && math.abs(bySrc("mid") - 200) < 50)
    // deterministic under repartition
    val out2 = Curation.temperatureMix(df.repartition(11), "src", "id")
      .select($"id").collect().map(_.getString(0)).toSet
    assert(out2 == out.map(_._1).toSet)
  }

  test("chunkDocuments windows tokens with stride, no redundant tail chunk") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 toks: starts 0,4 (8 dropped: 8+? no — see below)
      (2L, "a b c"),                                  // short doc: one chunk
      (3L, (1 to 13).map(i => s"t$i").mkString(" "))  // starts 0,4,8: 8+2<13
    ).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(df, "doc_id", "text", chunkSize = 6, stride = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    // doc 1 (10 toks): s=0 → w1..w6; s=4 → w5..w10; s=8 redundant (8+2 >= 10)
    // doc 3 (13 toks): s=0,4,8 full-ish; s=12 redundant (12+2 >= 13)
    assert(out == Set(
      (1L, 0, 6, "w1 w2 w3 w4 w5 w6"),
      (1L, 1, 6, "w5 w6 w7 w8 w9 w10"),
      (2L, 0, 3, "a b c"),
      (3L, 0, 6, "t1 t2 t3 t4 t5 t6"),
      (3L, 1, 6, "t5 t6 t7 t8 t9 t10"),
      (3L, 2, 5, "t9 t10 t11 t12 t13")))
  }

  test("packSequential fills bins by running budget, allowing straddle") {
    val df = Seq(("s", 1L, 300), ("s", 2L, 300), ("s", 3L, 300), ("s", 4L, 500),
      ("t", 9L, 100)).toDF("part", "ord", "tok")
    val out = Curation.packSequential(df, "part", "ord", "tok", budget = 500L)
      .select($"ord", $"cum_before", $"bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc2 starts at 300 (bin 0, straddles), doc3 at 600 (bin 1), doc4 at 900 (bin 1)
    assert(out == Set((1L, 0L, 0L), (2L, 300L, 0L), (3L, 600L, 1L),
      (4L, 900L, 1L), (9L, 0L, 0L)))
  }

  test("epochShuffle: reproducible within an epoch, decorrelated across epochs") {
    val docs = (1 to 500).map(_.toLong).toDF("id")
    def order(epoch: Int): Seq[Long] =
      Curation.epochShuffle(docs, "id", epoch)
        .orderBy($"shuffle_key", $"id").select($"id").as[Long].collect().toSeq
    val e1 = order(1)
    assert(e1 == order(1), "same epoch must replay the identical order")
    val e2 = order(2)
    assert(e1.toSet == e2.toSet && e1 != e2,
      "different epochs must permute the same rows differently")
    // uniform-ish: the first-epoch head is not just the id order
    assert(e1.take(50) != (1L to 50L).toSeq)
  }

  test("globalOrdinals equals the single-window global rank at any partition count") {
    val rnd = new scala.util.Random(61)
    val rows = (1 to 700).map(i => (i.toLong, rnd.nextLong()))
    val df = rows.toDF("id", "k").repartition(13)
    val want = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _), ord) => id -> ord.toLong }.toMap
    for (parts <- Seq("3", "8")) {
      val got = withSqlConf("spark.sql.shuffle.partitions", parts) {
        Curation.globalOrdinals(df, Seq("k", "id"))
          .select($"id", $"ordinal").as[(Long, Long)].collect().toMap
      }
      assert(got == want, s"ordinals diverge from the global rank at $parts partitions")
    }
  }

  private def withSqlConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.get(key)
    try { spark.conf.set(key, value); body }
    finally spark.conf.set(key, prev)
  }
}
