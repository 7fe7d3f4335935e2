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

  test("tfidfTopK score is the exact integer tf*scale*N DIV df") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val rows = CorpusStats.tfidfTopK(docs, "doc_id", "text", k = 3, scale = 10L)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // N=2 docs; a: tf=2 df=1 → 2*10*2/1=40; b in doc1: tf=1 df=2 → 10
    assert(rows((1L, "a")) == ((2L, 1L, 40L)))
    assert(rows((1L, "b")) == ((1L, 2L, 10L)))
    assert(rows((2L, "c")) == ((1L, 1L, 20L)))
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

  test("boilerplateRatio is repartition-stable") {
    val docs = (1 to 200).map(i => (i.toLong,
      if (i % 3 == 0) "shared boilerplate header text plus unique " + i
      else s"unique words for document number $i only")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.boilerplateRatio(df, "doc_id", "text", k = 3, minDf = 5L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(docs) == run(docs.repartition(17)))
  }
}
