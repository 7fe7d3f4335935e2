package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Dedup

/** TEMP bisect: stage-by-stage comparison of the winnowing plan against
  * a driver-side truth computed WITHOUT Spark (independent md5 60-bit
  * reimplementation), on a deterministic nasty corpus. */
class WinnowBisectSpec extends SparkSpec {
  import spark.implicits._

  // independent driver-side reimplementation of ShingleHashes64 (k=2, no mod)
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L; var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }
  private def gramStream(text: String, k: Int): Seq[Long] = {
    if (text == null) return Seq.empty
    val toks = text.split(" ", -1)
    if (toks.length >= k)
      (0 to toks.length - k).map(i => hash60(toks.slice(i, i + k).mkString(" ")))
    else Seq(hash60(text))
  }

  private val k = 2
  private def corpus(): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(7)
    val toks = Seq("a", "b", "c", "汉", "😀", "x'y")
    def mkDoc(): String = rnd.nextInt(9) match {
      case 0 => ""
      case 1 => "  a  b  "
      case 2 => " "
      case _ => Seq.fill(rnd.nextInt(15))(toks(rnd.nextInt(toks.size))).mkString(" ")
    }
    (Seq.fill(120)(mkDoc()) ++ Seq(null, "a", "a b")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
  }

  test("bisect stages") {
    val docs0 = corpus()
    val truth: Map[Long, Seq[Long]] =
      docs0.map { case (id, t) => id -> gramStream(t, k) }.toMap
    val truthRows: Set[(Long, Int, Long)] =
      truth.toSeq.flatMap { case (id, hs) =>
        hs.zipWithIndex.map { case (h, p) => (id, p, h) } }.toSet

    val docs = docs0.toDF("id", "text")
    val grams = docs.select(col("id"),
      posexplode(graft.plans.ShingleHashes64.column60(col("text"), k))
        .as(Seq("pos", "gh")))

    // Stage A: kernel + posexplode, plain collect
    val a = grams.as[(Long, Int, Long)].collect().toSet
    info(s"A diff extra=${(a diff truthRows).take(5)} missing=${(truthRows diff a).take(5)}")

    // Stage B: + count window
    val perDoc = Window.partitionBy(col("id"))
    val b = grams.withColumn("__n", count(lit(1)).over(perDoc))
      .as[(Long, Int, Long, Long)].collect()
    val bRows = b.map(r => (r._1, r._2, r._3)).toSet
    val bBadN = b.filter(r => r._4 != truth(r._1).length)
    info(s"B diff extra=${(bRows diff truthRows).take(5)} missing=${(truthRows diff bRows).take(5)} badN=${bBadN.take(5).toSeq}")

    // Stage C: + sliding min (w=1 → fp must equal gh)
    val w = 1
    val sliding = perDoc.orderBy(col("pos").asc).rowsBetween(-(w - 1), 0)
    val c = grams.withColumn("__n", count(lit(1)).over(perDoc))
      .withColumn("fp", min(col("gh")).over(sliding))
      .as[(Long, Int, Long, Long, Long)].collect()
    val cBad = c.filter(r => r._5 != r._3)
    info(s"C rows where fp != gh at w=1: ${cBad.take(5).toSeq} (count=${cBad.length})")
    val cRows = c.map(r => (r._1, r._2, r._3)).toSet
    info(s"C diff extra=${(cRows diff truthRows).take(5)} missing=${(truthRows diff cRows).take(5)}")

    // Stage D: full operator
    val d = Dedup.winnowedFingerprints(docs, "id", "text", k, w)
      .as[(Long, Long)].collect().toSet
    val expectedD = truth.toSeq.flatMap { case (id, hs) => hs.toSet.map((h: Long) => id -> h) }.toSet
    info(s"D diff extra=${(d diff expectedD).take(8)} missing=${(expectedD diff d).take(8)}")

    // Repeat D a few times to probe nondeterminism
    for (it <- 1 to 3) {
      val di = Dedup.winnowedFingerprints(docs, "id", "text", k, w)
        .as[(Long, Long)].collect().toSet
      info(s"D iter $it extra=${(di diff expectedD).size} missing=${(expectedD diff di).size}")
    }
    assert(true)
  }
}
