package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** TEMP debug: find a doc whose winnowing w=1 output diverges from a
  * direct collect of the same gram stream, and print both streams. */
class WinnowDebugSpec extends SparkSpec {
  import spark.implicits._

  test("debug winnow divergence") {
    val k = 2
    val rnd = new scala.util.Random(7)
    val toks = Seq("a", "b", "c", "汉", "😀", "x'y")
    def mkDoc(): String = rnd.nextInt(9) match {
      case 0 => ""
      case 1 => "  a  b  "
      case 2 => " "
      case _ => Seq.fill(rnd.nextInt(15))(toks(rnd.nextInt(toks.size))).mkString(" ")
    }
    var found = false
    var iter = 0
    while (!found && iter < 20) {
      iter += 1
      val texts = Seq.fill(120)(mkDoc()) ++ Seq(null, "a", "a b")
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val streams = docs.select(col("id"),
          posexplode(graft.plans.ShingleHashes64.column60(col("text"), k))
            .as(Seq("pos", "gh")))
        .as[(Long, Int, Long)].collect()
        .groupBy(_._1).map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3).toSeq }
      val expected = streams.flatMap { case (id, hs) => hs.toSet.map((h: Long) => id -> h) }.toSet
      val got = Dedup.winnowedFingerprints(docs, "id", "text", k, 1)
        .as[(Long, Long)].collect().toSet
      val extra = got diff expected
      val missing = expected diff got
      if (extra.nonEmpty || missing.nonEmpty) {
        found = true
        val badIds = (extra ++ missing).map(_._1)
        for (id <- badIds) {
          val txt = texts(id.toInt)
          info(s"id=$id text=${if (txt == null) "NULL" else "[" + txt + "]"} codeUnits=${if (txt == null) "" else txt.map(_.toInt).mkString(",")}")
          info(s"  collected stream: ${streams.getOrElse(id, Seq.empty).mkString(",")}")
          val direct = docs.filter(col("id") === id)
            .select(posexplode(graft.plans.ShingleHashes64.column60(col("text"), k)).as(Seq("pos", "gh")))
            .as[(Int, Long)].collect().toSeq
          info(s"  re-collected direct: ${direct.mkString(",")}")
          val viaWin = Dedup.winnowedFingerprints(docs.filter(col("id") === id), "id", "text", k, 1)
            .as[(Long, Long)].collect().toSeq
          info(s"  via winnow single-doc: ${viaWin.mkString(",")}")
          val viaWinFull = got.filter(_._1 == id).map(_._2)
          info(s"  via winnow full-corpus: ${viaWinFull.mkString(",")}")
        }
        info(s"extra=${extra.take(5)} missing=${missing.take(5)}")
      }
    }
    assert(found, "no divergence found in 20 iters")
  }
}
