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
