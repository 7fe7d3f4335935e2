package graft

import org.apache.spark.sql.functions._
import graft.functions.Names

/** Goldens replicate the reference chain by hand
  * (scripts/entity_matching.py:74-97) — pattern ORDER is load-bearing. */
class NamesSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("x").select(Names.normalizeName($"x")).as[String].head()

  test("normalize: abbreviations expand after noise strip") {
    assert(norm("Acme Pty Ltd") == "ACME PROPRIETARY LIMITED")
    assert(norm("Acme Pty. Ltd.") == "ACME PROPRIETARY LIMITED")
    assert(norm("Beta Co") == "BETA COMPANY")
  }

  test("normalize: articles, business noise, parens, pipe/dash tails") {
    assert(norm("The Acme Group Pty Ltd (Australia) | Home") == "ACME PROPRIETARY LIMITED")
    assert(norm("Zeta Holdings - Contact Us") == "ZETA")
    assert(norm("Kappa [est 1999] Enterprises") == "KAPPA")
  }

  test("normalize: HTML entities and &/+ become AND") {
    assert(norm("Salt &amp; Pepper") == "SALT AND PEPPER")
    assert(norm("Salt & Pepper") == "SALT AND PEPPER")
    assert(norm("Salt + Pepper") == "SALT AND PEPPER")
  }

  test("normalize: null/blank → empty; idempotent on a corpus") {
    assert(norm("") == "")
    assert(norm("   ") == "")
    val names = spark.read.parquet(s"$sf/customer.parquet").select($"c_name".as("x"))
      .unionByName(spark.read.parquet(s"$sf/part.parquet").select($"p_name".as("x")))
    val diff = names
      .select(Names.normalizeName($"x").as("n1"))
      .select($"n1", Names.normalizeName($"n1").as("n2"))
      .filter($"n1" =!= $"n2").count()
    assert(diff == 0, "normalize must be idempotent")
  }

  test("keywords: stopwords and short words dropped, sorted distinct") {
    val kw = Seq("Acme Widget Co Pty Ltd of The Widget").toDF("x")
      .select(Names.keywords($"x")).as[String].head()
    assert(kw == "ACME WIDGET")
  }

  test("title extraction: legal-suffix pattern wins, digits-only rejected") {
    def ex(s: String): String =
      Seq(s).toDF("x").select(Names.extractFromTitle($"x")).as[String].head()
    assert(ex("Acme Pty Ltd - Best Widgets in Australia") == "Acme Pty Ltd")
    assert(ex("123-456") == "123-456") // fallback to original
  }

  test("validity: anchored-at-start semantics") {
    def valid(s: String): Boolean =
      Seq(s).toDF("x").select(Names.isValidCompanyName($"x")).as[Boolean].head()
    assert(!valid("12-34"))
    assert(!valid("RSS Feed Daily"))
    assert(!valid("Wedding Flowers Co"))
    assert(valid("Acme Wedding Services")) // WEDDING mid-string is fine
    assert(valid("Acme Pty Ltd"))
    assert(!valid("ab"))
  }
}
