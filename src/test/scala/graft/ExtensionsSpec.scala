package graft

import graft.plans.GraftExtensions

class ExtensionsSpec extends SparkSpec {

  test("custom expressions callable from spark.sql") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  graft_fuzzy_score(
        |    'ACME WIDGETS', 'ACME WIDGETS PROPRIETARY LIMITED',
        |    'ACME WIDGETS', 'ACME WIDGETS PROPRIETARY LIMITED',
        |    array('ACME','WIDGETS'), array('ACME','LIMITED','PROPRIETARY','WIDGETS'),
        |    array('ACME','WIDGETS'), array('ACME','WIDGETS')) AS s,
        |  graft_minhash(array(17L, 5L, 9L), 4) AS sig""".stripMargin).head()
    assert(row.getInt(0) == 100) // token-set subset ⇒ 100
    val sig = row.getSeq[Long](1)
    assert(sig.length == 4)
    // slot 0: min over h of ((1*999983 % M31)*h + 0) % M31 — h=5 smallest
    assert(sig.head == 999983L * 5)
  }

  test("name/hash/vector expressions callable from spark.sql") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  graft_normalize_name('The Acme Group Pty Ltd | Home') AS norm,
        |  graft_keywords('Acme Widget Co of The Widget') AS kw,
        |  graft_extract_title('Acme Pty Ltd - Best Widgets') AS title,
        |  graft_valid_name('RSS Feed') AS v,
        |  graft_ratio('ACME', 'ACMA') AS r,
        |  graft_jaccard_long(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  size(graft_shingle_hashes('a b c d', 3)) AS nsh,
        |  size(graft_lsh_buckets(array(1.0F, -2.0F), 4, 3)) AS nb""".stripMargin).head()
    assert(row.getString(0) == "ACME PROPRIETARY LIMITED")
    assert(row.getSeq[String](1) == Seq("ACME", "WIDGET"))
    assert(row.getString(2) == "Acme Pty Ltd")
    assert(!row.getBoolean(3))
    assert(row.getInt(4) == 75)
    assert(row.getInt(5) == 50)
    assert(row.getInt(6) == 2)
    assert(row.getInt(7) == 3)
  }

  test("floor argument controls qualification") {
    GraftExtensions.register(spark)
    // score floor 90: a ~66 ratio pair with no token/keyword overlap → 0
    val s = spark.sql(
      """SELECT graft_fuzzy_score('ABC','ABD','ABC','ABD',
        |  array('ABC'), array('ABD'), array('ABC'), array('ABD'), 90) AS s""".stripMargin)
      .head().getInt(0)
    assert(s == 0)
  }
}
