package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.operators.{Dedup, SimilaritySearch}

/** Adversarial fuzzing for the non-text kernels, in the
  * AdversarialTextSpec mold (that push found two real bugs in the text
  * kernels): each target is driven over generated nasty inputs and
  * compared bitwise against an INDEPENDENT form — the declarative twin
  * where one exists (PQ), a from-scratch driver-side reference
  * otherwise (winnowing window minima, span-grid dedup, z-order
  * interleave). Divergences here are silent corpus corruption at scale:
  * none of these paths is exercised by nasty inputs in the synthetic
  * ASCII-ish testdata.
  */
class AdversarialKernelSpec extends SparkSpec {
  import spark.implicits._

  // ── PQ encode: native kernel vs declarative twin on nasty vectors ──

  test("pq encode: native equals declarative on NaN/Inf/null/short/tied vectors") {
    // dim 8, m 2, subDim 4; k=3 with codewords 0 and 1 IDENTICAL so
    // every vector ties between them — both forms must keep the FIRST
    // index. Codeword 2 is far away except from ±Inf inputs.
    val cw = Array(1.0, -2.0, 0.5, 3.0)
    val far = Array(1e9, 1e9, 1e9, 1e9)
    val codebook: Array[Array[Array[Double]]] =
      Array(Array(cw, cw, far), Array(far, cw.map(-_), cw.map(-_)))
    val el: Gen[Option[Double]] = Gen.frequency(
      6 -> Gen.choose(-10.0, 10.0).map(Some(_)),
      1 -> Gen.const(Some(Double.NaN)),
      1 -> Gen.const(Some(Double.PositiveInfinity)),
      1 -> Gen.const(Some(Double.NegativeInfinity)),
      1 -> Gen.const(Some(-0.0)),
      1 -> Gen.const(None))
    val vec: Gen[Seq[Option[Double]]] = Gen.frequency(
      6 -> Gen.listOfN(8, el),          // full dim
      1 -> Gen.listOfN(5, el),          // second subspace incomplete
      1 -> Gen.listOfN(2, el),          // first subspace incomplete
      1 -> Gen.const(Seq.empty[Option[Double]]))
    val rows = Fuzz.draw(Gen.listOfN(400, vec)) ++
      Seq(Seq.fill(8)(Some(Double.NaN)),   // all-NaN: both keep index 0
        cw.map(x => Some(x)).toSeq ++ cw.map(x => Some(-x)).toSeq) // exact hits
    val df = rows.map(Tuple1(_)).toDF("vec")
    for (asFloat <- Seq(false, true)) {
      val v = if (asFloat) transform(col("vec"), _.cast("float")) else col("vec")
      val bad = df.select(v.as("vec"))
        .select(col("vec"),
          graft.plans.VecExprs.pqEncode(col("vec"), codebook).as("nat"),
          SimilaritySearch.pqEncode(col("vec"), codebook).as("dec"))
        .filter(!(col("nat") <=> col("dec"))).collect()
      assert(bad.isEmpty,
        s"float=$asFloat seed=${Fuzz.seed} native != declarative on: " +
          bad.take(5).mkString("; "))
    }
  }

  test("pq decode: reconstruction of every code concatenates the exact codewords") {
    val codebook: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 2.0), Array(-3.0, 0.5)),
      Array(Array(0.0, -0.0), Array(9.5, -7.25)))
    val codes = for (a <- 0 to 1; b <- 0 to 1) yield Seq(a, b)
    val got = codes.map(Tuple1(_)).toDF("code")
      .select(col("code"),
        SimilaritySearch.pqDecode(col("code"), codebook).as("v"))
      .as[(Seq[Int], Seq[Double])].collect().toMap
    for (Seq(a, b) <- codes)
      assert(got(Seq(a, b)) == (codebook(0)(a) ++ codebook(1)(b)).toSeq)
  }

  // ── winnowing: Spark window minima vs a driver-side reference ──

  /** From-scratch winnowing over one document's positional gram-hash
    * stream: min of every w-window, windows truncated at the left
    * edge only for the first kept position; a stream shorter than w
    * contributes its global min. Mirrors the SIGMOD'03 definition, not
    * the Spark code. */
  private def refWinnow(hs: Seq[Long], w: Int): Set[Long] =
    if (hs.isEmpty) Set.empty
    else (math.min(w, hs.length) - 1 until hs.length)
      .map(pos => hs.slice(math.max(0, pos - w + 1), pos + 1).min).toSet

  test("winnowing fingerprints: Spark equals driver reference on nasty streams") {
    val k = 2
    // token vocab deliberately tiny → massive duplicate-gram tie mass
    // inside windows; plus unicode, empty-token runs, and short docs
    val tok = Gen.oneOf("a", "b", "c", "汉", "😀", "x'y")
    val doc: Gen[String] = Gen.frequency(
      6 -> Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, tok).map(_.mkString(" "))),
      1 -> Gen.const(""),
      1 -> Gen.const("  a  b  "),
      1 -> Gen.const(" "))
    val texts = Fuzz.draw(Gen.listOfN(120, doc)) ++ Seq(null, "a", "a b")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    // the gram stream is the SAME already-fuzzed shingle kernel the
    // operator uses — collected once so the reference isolates the
    // window/selection logic
    val streams = docs.select(col("id"),
        posexplode(graft.plans.ShingleHashes64.column60(col("text"), k))
          .as(Seq("pos", "gh")))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3).toSeq }
    for (w <- Seq(1, 2, 4, 9)) {
      // NB `streams` is a Map: flatMap-ing it STRAIGHT into (id, fp)
      // pairs would rebuild a Map and keep only ONE fingerprint per id
      // (this exact bug made the correct operator look like it emitted
      // hundreds of phantom extras for two rounds) — widen to Seq first.
      val expected = streams.toSeq.flatMap { case (id, hs) =>
        refWinnow(hs, w).toSeq.map(id -> _)
      }.toSet
      val got = Dedup.winnowedFingerprints(docs, "id", "text", k, w)
        .as[(Long, Long)].collect().toSet
      if (got != expected) {
        val path = Fuzz.persist("winnow-failing-corpus", texts)
        fail(s"w=$w seed=${Fuzz.seed} corpus=$path: " +
          s"${(got diff expected).take(3)} extra, ${(expected diff got).take(3)} missing " +
          s"(${(got diff expected).size}/${(expected diff got).size} total)")
      }
    }
  }

  // ── span-grid dedup: Spark vs a driver-side reference ──

  /** From-scratch C4-style span dedup: split-on-single-space (empty
    * tokens kept, trailing empties kept — Spark split semantics), grid
    * into spanTokens-chunks, first occurrence of each distinct span
    * text wins by (id, span_idx), reassemble winners in span order. */
  private def refSpanDedup(docs: Seq[(Long, String)],
                           st: Int): Set[(Long, Int, Int, String)] = {
    def toks(t: String): Seq[String] =
      Option(t).getOrElse("").split(" ", -1).toSeq
    val grid = docs.flatMap { case (id, t) =>
      val tk = toks(t)
      (0 to math.max(tk.length - 1, 0) by st)
        .map(s => (id, s / st, tk.slice(s, s + st).mkString(" ")))
    }
    val winners = grid.groupBy(_._3).values
      .map(_.minBy(r => (r._1, r._2))).toSeq
    val keptByDoc = winners.groupBy(_._1)
      .map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3) }
    docs.map { case (id, t) =>
      val nSpans = (toks(t).length + st - 1) / st
      val kept = keptByDoc.getOrElse(id, Seq.empty)
      (id, nSpans, kept.length, kept.mkString(" "))
    }.toSet
  }

  test("span dedup: Spark equals driver reference on nasty corpora") {
    val st = 3
    val frag = Gen.oneOf("p q r", "汉 字 文", "😀 b 😀", "s  t", "u v w x y z")
    val doc: Gen[String] = Gen.frequency(
      5 -> Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, frag).map(_.mkString(" "))),
      1 -> Gen.const(""),
      1 -> Gen.const("p q r"),       // exactly one grid span
      1 -> Gen.const("p q r p q r"), // exact multiple of st, self-repeat
      1 -> Gen.const("   "))
    val texts = Fuzz.draw(Gen.listOfN(150, doc)) ++ Seq(null, "p q r p q r p")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = Dedup.spanDedup(docs.toDF("id", "text"), "id", "text", st)
      .as[(Long, Int, Int, String)].collect().toSet
    if (got != refSpanDedup(docs, st)) {
      val path = Fuzz.persist("spandedup-failing-corpus", texts)
      fail(s"seed=${Fuzz.seed} corpus=$path: " +
        s"${(got diff refSpanDedup(docs, st)).take(3)} extra; " +
        s"${(refSpanDedup(docs, st) diff got).take(3)} missing")
    }
  }

  // ── z-order interleave: column vs a driver-side reference ──

  private def refZ(x: Long, y: Long, bits: Int): Long = {
    val m = (1L << bits) - 1
    val xs = x & m; val ys = y & m
    (0 until bits).foldLeft(0L)((acc, b) =>
      acc | (((xs >> b) & 1L) << (2 * b)) | (((ys >> b) & 1L) << (2 * b + 1)))
  }

  test("z-order interleave: column equals driver reference on boundary values") {
    val v: Gen[Long] = Gen.frequency(
      4 -> Gen.choose(-(1L << 40), 1L << 40),
      1 -> Gen.oneOf(Long.MinValue, -1L, 0L, 1L, Long.MaxValue))
    val pairs = Fuzz.draw(Gen.listOfN(300, Gen.zip(v, v))) ++
      Seq((Long.MinValue, Long.MaxValue), (-1L, -1L), (0L, 0L))
    val df = pairs.toDF("x", "y")
    for (bits <- Seq(1, 5, 31)) {
      val bad = df.select(col("x"), col("y"),
          graft.sources.Layout.zValue(col("x"), col("y"), bits).as("z"))
        .as[(Long, Long, Long)].collect()
        .filter { case (x, y, z) => z != refZ(x, y, bits) }
      assert(bad.isEmpty,
        s"bits=$bits seed=${Fuzz.seed} diverges on: ${bad.take(5).mkString("; ")}")
    }
  }
}
