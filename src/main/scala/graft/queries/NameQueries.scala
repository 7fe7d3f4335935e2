package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Names
import graft.model.Tables

/** F-5..F-8, F-12, F-13 bound to testdata (FIXTURES.md §B): part/customer
  * names stand in for company names; "dirty" web-page titles are
  * constructed deterministically IN-QUERY from the same SQL snippet on
  * both engines, so every noise pattern / abbreviation / entity rule of
  * the normalization chain is exercised under the oracle hash-compare.
  */
object NameQueries {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Dirty web-title construction — identical SQL text runs in Spark
    * (via expr) and DuckDB; exercises parens, articles, '&', pipe-tails,
    * dash-tails, HTML entities, brackets, PTY LTD / CO abbreviations. */
  private val titleSql: String =
    """CASE CAST(p_partkey % 5 AS INT)
      | WHEN 0 THEN concat(upper(p_name), ' Pty Ltd (Australia)')
      | WHEN 1 THEN concat('The ', p_name, ' Group & Co | Online Shop')
      | WHEN 2 THEN concat(p_name, ' &quot;Holdings&quot; - Contact Us')
      | WHEN 3 THEN concat(p_name, '&#8217;s Shop &middot; Catalog')
      | ELSE concat(p_name, ' &amp; Sons [est 1999]')
      |END""".stripMargin

  /** Name mix including reference-invalid shapes (digits-only, RSS/news,
    * WEDDING-prefixed — anchored-at-start semantics, F-5). */
  private val nameMixSql: String =
    """CASE CAST(p_partkey % 6 AS INT)
      | WHEN 3 THEN '12-34'
      | WHEN 4 THEN 'RSS Feed Daily'
      | WHEN 5 THEN concat('Wedding ', p_name)
      | ELSE concat(p_name, ' Pty Ltd')
      |END""".stripMargin

  val queries: Map[String, Q] = Map(
    "f6_normalize_name" -> ((s, d) =>
      t(s, d, "part")
        .withColumn("title", expr(titleSql))
        .select(col("p_partkey"), col("title"),
          Names.normalizeName(col("title")).as("normalized"))
        .orderBy(col("p_partkey"))),

    "f7_keywords" -> ((s, d) =>
      t(s, d, "part")
        .withColumn("title", expr(titleSql))
        .select(col("p_partkey"), Names.keywords(col("title")).as("kw"))
        .orderBy(col("p_partkey"))),

    "f8_title_extract" -> ((s, d) =>
      t(s, d, "part")
        .withColumn("title", expr(titleSql))
        .select(col("p_partkey"), col("title"),
          Names.extractFromTitle(col("title")).as("extracted"))
        .orderBy(col("p_partkey"))),

    "f5_valid_name" -> ((s, d) =>
      t(s, d, "part")
        .withColumn("name", expr(nameMixSql))
        .select(col("p_partkey"), col("name"),
          Names.isValidCompanyName(col("name")).as("is_valid"))
        .orderBy(col("p_partkey"))),

    // F-12: concat_ws skips nulls; null if all parts null (reference scripts/extract_abr.py:132-134)
    "f12_addr_concat" -> ((s, d) =>
      t(s, d, "customer")
        .withColumn("state", nullif(col("c_mktsegment"), lit("FURNITURE")))
        .withColumn("post", when(col("c_custkey") % 5 === 0, lit(null).cast("string"))
          .otherwise(col("c_nationkey").cast("string")))
        .select(col("c_custkey"),
          nullif(concat_ws(", ", col("state"), col("post")), lit("")).as("address"))
        .orderBy(col("c_custkey"))),

    // F-13 + S-5 date semantics: explicit-format parse + coalesce fallback
    "f13_coalesce_date" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("primary_s",
          when(col("o_orderkey") % 3 === 0, lit(null).cast("string"))
            .otherwise(date_format(col("o_orderdate"), "yyyyMMdd")))
        .withColumn("fallback_s", date_format(col("o_orderdate"), "yyyyMMdd"))
        .select(col("o_orderkey"),
          coalesce(to_date(col("primary_s"), "yyyyMMdd"),
            to_date(col("fallback_s"), "yyyyMMdd")).as("start_date"),
          when(col("primary_s").isNull, lit("gst")).otherwise(lit("abn")).as("date_source"))
        .orderBy(col("o_orderkey")))
  )

  val oracles: Map[String, String] = Map(
    "f6_normalize_name" ->
      s"""SELECT p_partkey, $titleSql AS title, ${Names.sql.normalize(titleSql)} AS normalized
         |FROM part ORDER BY p_partkey""".stripMargin,
    "f7_keywords" ->
      s"""SELECT p_partkey, ${Names.sql.keywords(titleSql)} AS kw
         |FROM part ORDER BY p_partkey""".stripMargin,
    "f8_title_extract" ->
      s"""SELECT p_partkey, title, ${Names.sql.extractFromTitle("title")} AS extracted
         |FROM (SELECT p_partkey, $titleSql AS title FROM part) ORDER BY p_partkey""".stripMargin,
    "f5_valid_name" ->
      s"""SELECT p_partkey, name, ${Names.sql.isValid("name")} AS is_valid
         |FROM (SELECT p_partkey, $nameMixSql AS name FROM part) ORDER BY p_partkey""".stripMargin,
    "f12_addr_concat" ->
      """SELECT c_custkey,
        |  nullif(concat_ws(', ', nullif(c_mktsegment, 'FURNITURE'),
        |    CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE CAST(c_nationkey AS VARCHAR) END), '') AS address
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f13_coalesce_date" ->
      """SELECT o_orderkey,
        |  coalesce(CAST(strptime(primary_s, '%Y%m%d') AS DATE),
        |           CAST(strptime(fallback_s, '%Y%m%d') AS DATE)) AS start_date,
        |  CASE WHEN primary_s IS NULL THEN 'gst' ELSE 'abn' END AS date_source
        |FROM (SELECT o_orderkey,
        |        CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE strftime(o_orderdate, '%Y%m%d') END AS primary_s,
        |        strftime(o_orderdate, '%Y%m%d') AS fallback_s
        |      FROM orders) ORDER BY o_orderkey""".stripMargin
  )
}
