package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def score(f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column)
                   (a: String, b: String): Int =
    Seq((a, b)).toDF("a", "b").select(f($"a", $"b")).as[Int].head()

  test("ratio: identity=100, truncated levenshtein similarity, empty cases") {
    assert(score(Similarity.ratio)("ACME", "ACME") == 100)
    assert(score(Similarity.ratio)("ABC", "ABD") == 66) // floor(100*(1-1/3))
    assert(score(Similarity.ratio)("", "") == 100)
    assert(score(Similarity.ratio)("", "XYZ") == 0)
  }

  test("token_sort: word order insensitive") {
    assert(score(Similarity.tokenSortRatio)("ACME WIDGETS", "WIDGETS ACME") == 100)
    assert(score(Similarity.ratio)("ACME WIDGETS", "WIDGETS ACME") < 100)
  }

  test("token_set: subset tokens score 100") {
    assert(score(Similarity.tokenSetRatio)("ACME WIDGETS", "ACME WIDGETS PROPRIETARY LIMITED") == 100)
    assert(score(Similarity.tokenSortRatio)("ACME WIDGETS", "ACME WIDGETS PROPRIETARY LIMITED") < 100)
  }

  test("keyword score: Jaccard*100 truncated on keyword sets") {
    // keywords: {ACME, WIDGET} vs {ACME, BOLT}: 1/3 → 33
    assert(score(Similarity.keywordScore)("Acme Widget", "Acme Bolt") == 33)
    assert(score(Similarity.keywordScore)("The Co", "Acme Bolt") == 0) // empty left set
  }

  test("properties on corpus: bounds 0..100 and symmetry") {
    val names = spark.read.parquet(s"$sf/part.parquet").select($"p_name")
    val pairs = names.select($"p_name".as("a"))
      .crossJoin(names.select($"p_name".as("b")).limit(20))
    val checked = pairs.select(
      Similarity.ratio($"a", $"b").as("r_ab"), Similarity.ratio($"b", $"a").as("r_ba"),
      Similarity.tokenSetRatio($"a", $"b").as("s_ab"), Similarity.tokenSetRatio($"b", $"a").as("s_ba"))
    assert(checked.filter($"r_ab" =!= $"r_ba" || $"s_ab" =!= $"s_ba").count() == 0)
    assert(checked.filter($"r_ab" < 0 || $"r_ab" > 100 || $"s_ab" < 0 || $"s_ab" > 100).count() == 0)
  }
}
