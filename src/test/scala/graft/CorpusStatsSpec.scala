package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusStats

/** T-7/T-8: corpus-level statistics (TF-IDF keywords, boilerplate). */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfTopK ranks rare-but-frequent terms first, ties on token") {
    // "zebra" appears 3x in doc 1 only (tf=3, df=1); "common" is in all
    // docs; "alpha"/"beta" tie on (tf=1, df=1) within doc 2
    val docs = Seq(
      (1L, "zebra zebra zebra common filler"),
      (2L, "alpha beta common filler filler"),
      (3L, "common common filler gamma gamma")
    ).toDF("doc_id", "text")
    val out = CorpusStats.tfidfTopK(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(5)) -> r.getString(1)).toMap
    assert(out((1L, 1)) == "zebra")
    // doc 2: alpha and beta both score 1*S*3/1; alphabetic tiebreak
    assert(out((2L, 1)) == "alpha" && out((2L, 2)) == "beta")
    assert(out((3L, 1)) == "gamma")
  }

  test("tfidfTopK score is tf*scale*N/df in fixed-order IEEE doubles") {
    // doubles, not integer DIV: at the 100 TB design point the integer
    // product tf*scale*nDocs exceeds 2^63 and ANSI kills the query on
    // one garbage doc; the fixed-order double chain is bit-identical
    // cross-engine at any magnitude (each op correctly rounded)
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val rows = CorpusStats.tfidfTopK(docs, "doc_id", "text", k = 3, scale = 10L)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // N=2 docs; a: tf=2 df=1 → 2*10*2/1=40; b in doc1: tf=1 df=2 → 10
    assert(rows((1L, "a")) == ((2L, 1L, 40.0)))
    assert(rows((1L, "b")) == ((1L, 2L, 10.0)))
    assert(rows((2L, "c")) == ((1L, 1L, 20.0)))
  }

  test("boilerplateRatio counts grams shared by >= minDf docs") {
    // the 5-token template yields 3 trigrams shared by docs 1-3;
    // doc 4 is disjoint
    val docs = Seq(
      (1L, "terms of service apply here extra one"),
      (2L, "terms of service apply here extra two"),
      (3L, "terms of service apply here"),
      (4L, "completely different words only found once")
    ).toDF("doc_id", "text")
    val out = CorpusStats.boilerplateRatio(docs, "doc_id", "text", k = 3, minDf = 3L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // docs 1/2: 5 trigrams each, 3 shared (the template ones)
    assert(out(1L) == ((5L, 3L, 0.6)))
    assert(out(2L) == ((5L, 3L, 0.6)))
    assert(out(3L) == ((3L, 3L, 1.0)))
    assert(out(4L) == ((4L, 0L, 0.0)))
  }

  test("pickJoin and unkText kernels bitwise-equal their declarative chains") {
    // corpus-derived token arrays with synthetic position sets covering:
    // empty picks, all picks, head/tail-only, null toks (pickJoin's
    // array_join-skips-null edge), empty oov, all-oov
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", split(coalesce($"text", lit("")), " ").as("toks"))
      .withColumn("n", size($"toks"))
      .withColumn("pos_all", sequence(lit(0), $"n" - 1))
      .withColumn("pos_none", array().cast("array<int>"))
      .withColumn("pos_evens", filter($"pos_all", p => p % 2 === 0))
      .withColumn("pos_head", slice($"pos_all", 1, 3))
    for (posCol <- Seq("pos_all", "pos_none", "pos_evens", "pos_head")) {
      val badPick = docs.select(
          graft.plans.TokenExprs.pickJoin($"toks", col(posCol)).as("nat"),
          array_join(transform(col(posCol),
            p => element_at($"toks", p + 1)), " ").as("dec"))
        .filter(!($"nat" <=> $"dec")).count()
      assert(badPick == 0, s"pickJoin diverged from twin on $posCol")
      val badUnk = docs.select(
          graft.plans.TokenExprs.unkText($"toks", col(posCol)).as("nat"),
          array_join(transform(array_sort(concat(
            transform(array_except($"pos_all", col(posCol)),
              p => struct(p.as("pos"), element_at($"toks", p + 1).as("t"))),
            transform(col(posCol),
              p => struct(p.as("pos"), lit("<unk>").as("t"))))),
            x => x("t")), " ").as("dec"))
        .filter(!($"nat" <=> $"dec")).count()
      assert(badUnk == 0, s"unkText diverged from twin on $posCol")
    }
    // pickJoin null edges: null pos -> null; null toks + non-null pos ->
    // "" (the declarative element_at nulls are all skipped by array_join)
    val nullEdges = Seq((Seq("a", "b"), Seq(0)), (null, Seq(0)), (Seq("a"), null))
      .toDF("toks", "pos")
      .select(graft.plans.TokenExprs.pickJoin($"toks", $"pos".cast("array<int>")).as("nat"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(nullEdges.toSeq == Seq("a", "", null))
  }

  test("removeSharedSpans scrubs covered tokens, keeps unique tail in order") {
    // docs 1-3 share a 5-token template: trigram starts 0..2 are shared
    // by 3 docs, covering token positions 0..4 exactly — the unique
    // suffixes survive untouched (boundary trigrams are df=1)
    val docs = Seq(
      (1L, "the quick brown fox jumps over lazy dogs"),
      (2L, "the quick brown fox jumps into the river"),
      (3L, "the quick brown fox jumps"),
      (4L, "completely different words only found once")
    ).toDF("doc_id", "text")
    val out = CorpusStats.removeSharedSpans(docs, "doc_id", "text", k = 3, minDf = 3L)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)))
      .toMap
    assert(out(1L) == ((8, 3, "over lazy dogs")))
    assert(out(2L) == ((8, 3, "into the river")))
    assert(out(3L) == ((5, 0, "")))
    assert(out(4L) == ((6, 6, "completely different words only found once")))
  }

  test("removeSharedSpans scrubs short docs whose whole text is shared") {
    val docs = Seq(
      (1L, "hi there"), (2L, "hi there"), (3L, "hi there"),
      (4L, "bye now")
    ).toDF("doc_id", "text")
    val out = CorpusStats.removeSharedSpans(docs, "doc_id", "text", k = 3, minDf = 3L)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getString(3))).toMap
    assert(out(1L) == ((0, "")) && out(3L) == ((0, "")))
    assert(out(4L) == ((2, "bye now")))
  }

  test("removeSharedSpans equals a brute-force single-node recompute") {
    val k = 3; val minDf = 3
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (1 to 120).map { i =>
      val n = 1 + rnd.nextInt(10)
      (i.toLong, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def gramsOf(text: String): Seq[(Int, String)] = {
      val toks = text.split(" ", -1)
      if (toks.length >= k)
        (0 to toks.length - k).map(i => i -> toks.slice(i, i + k).mkString(" "))
      else Seq(0 -> text)
    }
    val df = docs.flatMap { case (id, t) => gramsOf(t).map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val shared = df.collect { case (g, n) if n >= minDf => g }.toSet
    val want = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val covered = gramsOf(t).collect {
        case (p, g) if shared(g) => p until (p + k)
      }.flatten.toSet
      val kept = toks.zipWithIndex.collect { case (tk, i) if !covered(i) => tk }
      (id, toks.length, kept.length, kept.mkString(" "))
    }.toSet
    val got = CorpusStats.removeSharedSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", k, minDf.toLong)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(got == want)
  }

  test("heavyHitters equals the exact groupBy cutoff and is partitioning-independent") {
    // skewed stream: "hot" ~20%, "warm" ~5%, tail of singletons
    val docs = (1 to 400).map { i =>
      val toks = Seq("hot") ++ (if (i % 4 == 0) Seq("warm") else Seq()) ++
        Seq(s"tail$i", s"rare${i % 97}")
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    def exact(threshold: Int) = {
      val toks = docs.select(explode(split($"text", " ")).as("token"))
      val total = toks.count()
      toks.groupBy($"token").count()
        .filter($"count" * threshold > total)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    def mg(df: org.apache.spark.sql.DataFrame, threshold: Int) =
      CorpusStats.heavyHitters(df, "text", threshold)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    for (threshold <- Seq(3, 10, 50)) {
      val want = exact(threshold)
      assert(mg(docs, threshold) == want, s"threshold=$threshold")
      // the MG candidate set depends on partition boundaries; the exact
      // recount must erase that
      assert(mg(docs.repartition(13), threshold) == want,
        s"threshold=$threshold repartitioned")
    }
    // sanity: the skewed head is actually found at a tight threshold
    assert(exact(10).map(_._1).contains("hot"))
  }

  test("boilerplateRatio is repartition-stable") {
    val docs = (1 to 200).map(i => (i.toLong,
      if (i % 3 == 0) "shared boilerplate header text plus unique " + i
      else s"unique words for document number $i only")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.boilerplateRatio(df, "doc_id", "text", k = 3, minDf = 5L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(docs) == run(docs.repartition(17)))
  }

  test("bigramFluency averages corpus bigram counts, integer-exact") {
    // bigrams: "aa bb" ×3 (docs 1,1,2), "bb aa" ×1, "cc dd" ×1
    val docs = Seq(
      (1L, "aa bb aa bb"), // bigrams: aa bb, bb aa, aa bb → (3+1+3) DIV 3 = 2
      (2L, "aa bb"),       // (3) DIV 1 = 3
      (3L, "cc dd"),       // (1) DIV 1 = 1
      (4L, "ee"))          // short-doc fallback: whole text, count 1
      .toDF("doc_id", "text")
    val out = CorpusStats.bigramFluency(docs, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Int, Long)].collect().toSeq
    assert(out == Seq((1L, 3, 2L), (2L, 1, 3L), (3L, 1, 1L), (4L, 1, 1L)))
  }

  test("oovScrub keeps the high-df head, rewrites the tail to <unk>") {
    // "aa" in 4/4 docs, "bb" in 2/4, "cc"/"dd"/"ee" in 1/4 each
    val docs = Seq(
      (1L, "aa bb cc"),
      (2L, "aa bb"),
      (3L, "aa dd"),
      (4L, "ee aa")).toDF("doc_id", "text")
    val out = CorpusStats.oovScrub(docs, "doc_id", "text", num = 1, den = 2)
      .orderBy($"doc_id").as[(Long, Int, Int, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3, 1, "aa bb <unk>"),
      (2L, 2, 0, "aa bb"),
      (3L, 2, 1, "aa <unk>"),
      (4L, 2, 1, "<unk> aa")))
  }

  test("oovScrub equals a brute-force recompute on a random corpus, null-total") {
    val rnd = new scala.util.Random(67)
    val vocab = Vector("v1", "v2", "v3", "v4", "v5", "v6", "v7", "v8")
    val corpus = (1 to 80).map { i =>
      val n = 1 + rnd.nextInt(7)
      (i.toLong, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } :+ (99L, null.asInstanceOf[String])
    val texts = corpus.map { case (id, t) => (id, Option(t).getOrElse("")) }
    val dfc = texts.flatMap { case (id, t) => t.split(" ", -1).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val nd = corpus.size
    val want = texts.map { case (id, t) =>
      val toks = t.split(" ", -1).toVector
      val marked = toks.map(tok => if (dfc(tok) * 2 >= nd) tok else "<unk>")
      (id, toks.size, marked.count(_ == "<unk>"), marked.mkString(" "))
    }.toSet
    val got = CorpusStats.oovScrub(corpus.toDF("doc_id", "text"),
        "doc_id", "text", num = 1, den = 2)
      .as[(Long, Int, Int, String)].collect().toSet
    assert(got == want)
  }

  test("linearModelScore: multiplicity, bias-only docs, negative → drop") {
    val docs = Seq(
      (1L, "good good bad filler"),   // 2*3 + 1*(-5) = 1  → keep
      (2L, "bad bad good"),           // 2*(-5) + 3 = -7   → drop
      (3L, "unseen tokens only"),     // no hits → bias     → keep
      (4L, null.asInstanceOf[String]) // null text → [""] no hits → bias
    ).toDF("doc_id", "text")
    val model = Seq(("good", 3L), ("bad", -5L)).toDF("tok", "w")
    val got = CorpusStats.linearModelScore(
        docs, "doc_id", "text", model, "tok", "w", bias = 0L)
      .as[(Long, Int, Int, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((4, 3, 1L, "keep")))
    assert(got(2L) == ((3, 3, -7L, "drop")))
    assert(got(3L) == ((3, 0, 0L, "keep")))
    assert(got(4L) == ((1, 0, 0L, "keep")))
    // a nonzero bias shifts every score, hit or not
    val biased = CorpusStats.linearModelScore(
        docs, "doc_id", "text", model, "tok", "w", bias = -2L)
      .as[(Long, Int, Int, Long, String)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    assert(biased(1L) == ((-1L, "drop")) && biased(3L) == ((-2L, "drop")))
  }

  test("linearModelScore with bigram features matches shingle semantics") {
    val docs = Seq(
      (1L, "new york city"),     // bigrams: "new york", "york city"
      (2L, "york new"),          // bigram:  "york new" — order matters
      (3L, "solo")               // shorter than n: whole text, one feature
    ).toDF("doc_id", "text")
    val model = Seq(("new york", 10L), ("solo", 2L)).toDF("f", "w")
    val got = CorpusStats.linearModelScore(
        docs, "doc_id", "text", model, "f", "w", bias = 0L, featureN = 2)
      .as[(Long, Int, Int, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2, 1, 10L)), s"bigram positions + one hit: $got")
    assert(got(2L) == ((1, 0, 0L)), s"reversed bigram must not match: $got")
    assert(got(3L) == ((1, 1, 2L)), s"short doc scores its whole text: $got")
  }

  test("linearModelScore equals a brute-force recompute on a random corpus") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector("w1", "w2", "w3", "w4", "w5", "w6")
    val weights = Map("w1" -> 4L, "w2" -> -3L, "w4" -> 1L, "w6" -> -7L)
    val corpus = (1 to 60).map { i =>
      val n = 1 + rnd.nextInt(8)
      (i.toLong, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val want = corpus.map { case (id, t) =>
      val toks = t.split(" ", -1).toVector
      val hits = toks.flatMap(weights.get)
      (id, toks.size, hits.size, hits.sum + 5L,
        if (hits.sum + 5L >= 0) "keep" else "drop")
    }.toSet
    val got = CorpusStats.linearModelScore(corpus.toDF("doc_id", "text"),
        "doc_id", "text", weights.toSeq.toDF("tok", "w"),
        "tok", "w", bias = 5L)
      .as[(Long, Int, Int, Long, String)].collect().toSet
    assert(got == want)
  }
}
