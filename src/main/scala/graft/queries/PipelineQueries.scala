package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Names, Similarity}
import graft.model.Tables
import graft.pipeline.Pipeline

/** U-1/U-2: the full t1'→t3'→t4' pipeline composed end-to-end on
  * testdata stand-ins. Staging-table construction uses ONE set of SQL
  * snippets applied via selectExpr on the Spark side and inlined in the
  * DuckDB oracle, so both engines stage identical inputs; the candidate
  * mix deliberately exercises every cleaning rule (extraction fallback,
  * validity rejection, blank rejection, entity/noise normalization).
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame
  private val cutoff = 80

  /** staging_abr stand-in from customer (§1.2). */
  private val abrCols = Seq(
    "CAST(c_custkey AS STRING) AS abn",
    "c_name AS entity_name",
    "c_mktsegment AS entity_type",
    "CASE WHEN c_acctbal >= 0 THEN 'Active' ELSE 'Cancelled' END AS entity_status",
    "nullif(concat_ws(', ', CAST(c_nationkey AS STRING), lpad(CAST(c_nationkey * 37 AS STRING), 4, '0')), '') AS address",
    "lpad(CAST(c_nationkey * 37 AS STRING), 4, '0') AS postcode",
    "CAST(c_nationkey AS STRING) AS state",
    "CAST(NULL AS DATE) AS start_date")

  /** staging_commoncrawl stand-in: every 7th customer as a web title in
    * five shapes — legal-suffix extractable, fallback-to-title, invalid
    * (RSS-prefixed), blank (dropped by F-4), and entity/noise-laden. */
  private val ccCols = Seq(
    "c_custkey AS cc_id",
    "concat('https://www.c', CAST(c_custkey AS STRING), '.com.au') AS website_url",
    """CASE CAST(c_custkey % 5 AS INT)
      | WHEN 0 THEN concat(c_name, ' Pty Ltd | Home')
      | WHEN 1 THEN concat('The ', c_name, ' Group')
      | WHEN 2 THEN concat('RSS ', c_name)
      | WHEN 3 THEN '  '
      | ELSE concat(c_name, ' & Associates (AU)')
      |END AS company_name""".stripMargin,
    """CASE CAST(c_custkey % 3 AS INT)
      | WHEN 0 THEN 'Technology' WHEN 1 THEN 'Mining' ELSE NULL
      |END AS industry""".stripMargin)

  private def abrDf(s: SparkSession, d: String): DataFrame =
    Tables.spread(Tables.load(s, d, "customer").selectExpr(abrCols: _*)
      .orderBy(col("abn")).limit(10000))

  private def ccDf(s: SparkSession, d: String): DataFrame =
    // spread below the (pushed-down) cleaning predicates: the
    // single-row-group scan would otherwise evaluate them on one task
    Tables.spread(Tables.load(s, d, "customer").filter(col("c_custkey") % 7 === 0)
      .selectExpr(ccCols: _*))

  /** Unpersist and forget the unified-table memo (see
    * [[DedupQueries.releaseMemos]] for when and why). */
  def releaseMemos(): Unit = {
    memo.values.foreach(_.unpersist(false)); memo.clear()
  }

  /** Unified table memoized per sfDir — it feeds both U-1 and U-2. */
  private val memo = scala.collection.concurrent.TrieMap[String, DataFrame]()
  private def unified(s: SparkSession, d: String): DataFrame =
    memo.getOrElseUpdate(s.hashCode + "|" + d,
      Pipeline.buildUnified(abrDf(s, d), ccDf(s, d), "cc_id", cutoff)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Stop-token frequency for the blocked pipeline variant —
    * blockedJoin's default 1000, the deployment configuration SCALE.md
    * measured (cap=50 starves 60% of left rows at x100 where numeric
    * name tokens have ~100 replica occurrences; cap=1000 accepts
    * 9445/10000 with the residual gap cap-invariant to 20000).
    * j1_blocked_join keeps 50 to exercise the tight-cap skew-control
    * regime; this entry declares the one a 100 TB run uses. */
  private val blockFreq = 1000L

  val queries: Map[String, Q] = Map(
    // AT SCALE, USE u1_blocked_pipeline: this exact-broadcast-product
    // declaration is the correctness-tier reference-parity twin; past
    // the broadcastability envelope the product is the scale-killer
    // (measured 512.7 s at x100 vs the blocked path's 7.0 s).
    "u1_unified_pipeline" -> ((s, d) => unified(s, d).orderBy(col("abn"))),
    // The scale path a 100 TB deployment runs (see Pipeline.buildUnified
    // scaladoc): same staging, cleaning, assembly and keep-first as u1,
    // with the exact broadcast product replaced by token blocking. Its
    // oracle replicates the blocking, so correctness is gated on the
    // blocked semantics themselves; the recall bound vs u1 is the
    // documented shared-rare-keyword condition (PipelineSpec pins the
    // subset/confidence-dominance invariants against u1).
    "u1_blocked_pipeline" -> ((s, d) =>
      memo.getOrElseUpdate("blocked|" + s.hashCode + "|" + d,
        Pipeline.buildUnified(abrDf(s, d), ccDf(s, d), "cc_id", cutoff,
            blockTokenFreq = Some(blockFreq))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        .orderBy(col("abn"))),
    "u2_quality_report" -> ((s, d) => Pipeline.qualityReport(unified(s, d)))
  )

  // ───── oracle SQL ─────

  private val abrSrc = s"SELECT ${abrCols.mkString(",\n  ")} FROM customer"
  private val ccSrc =
    s"SELECT ${ccCols.mkString(",\n  ")} FROM customer WHERE c_custkey % 7 = 0"

  private def prepCte(alias: String, src: String, p: String, minNorm: Int): String =
    s"""$alias AS (
       |  SELECT ${p}_key, ${p}_name, ${p}_norm,
       |    ${Similarity.sql.tokenSortJoin(s"${p}_norm")} AS ${p}_sorted,
       |    ${Similarity.sql.tokenSet(s"${p}_norm")} AS ${p}_set,
       |    ${Names.sql.keywordsList(s"${p}_name")} AS ${p}_kw
       |  FROM (SELECT ${p}_key, ${p}_name, ${Names.sql.normalize(s"${p}_name")} AS ${p}_norm
       |        FROM ($src)) WHERE length(${p}_norm) >= $minNorm)""".stripMargin

  /** Blocked-pair source mirroring [[graft.operators.MatchJoin.blockedJoin]]
    * (same CTE shape as MatchQueries' j1_blocked oracle): DISTINCT pairs
    * sharing a keyword token whose right-side frequency <= blockFreq. */
  private val blockedPairsSrc: String =
    s"""(SELECT DISTINCT l.left_key, l.left_name, l.left_norm, l.left_sorted, l.left_set, l.left_kw,
       |   r.right_key, r.right_name, r.right_norm, r.right_sorted, r.right_set, r.right_kw
       | FROM (SELECT lp.*, unnest(left_kw) AS tok FROM lp) l
       | JOIN (SELECT rp.*, unnest(right_kw) AS tok FROM rp) r USING (tok)
       | JOIN (SELECT tok FROM (SELECT unnest(right_kw) AS tok FROM rp)
       |       GROUP BY tok HAVING count(*) <= $blockFreq) ok USING (tok))""".stripMargin

  private def unifiedSqlFrom(pairsFrom: String): String = {
    val floorF = cutoff - 20
    val cleaned =
      s"""SELECT cc_id, website_url, industry, extracted FROM (
         |  SELECT *, ${Names.sql.extractFromTitle("company_name")} AS extracted
         |  FROM cc
         |  WHERE company_name IS NOT NULL AND length(trim(company_name)) >= 3)
         |WHERE ${Names.sql.isValid("extracted")}
         |  AND length(${Names.sql.normalize("extracted")}) >= 3""".stripMargin
    s"""WITH abr AS (SELECT * FROM ($abrSrc) ORDER BY abn LIMIT 10000),
       |cc AS ($ccSrc),
       |cleaned AS ($cleaned),
       |${prepCte("lp", "SELECT abn AS left_key, entity_name AS left_name FROM abr", "left", 1)},
       |${prepCte("rp", "SELECT cc_id AS right_key, extracted AS right_name FROM cleaned", "right", 3)},
       |scored AS (SELECT left_key, right_key,
       |  ${Similarity.sql.ratio("left_sorted", "right_sorted")} AS s_sort,
       |  ${Similarity.sql.tokenSetRatioFromSets("left_set", "right_set")} AS s_set,
       |  ${Similarity.sql.ratio("left_norm", "right_norm")} AS s_ratio,
       |  ${Similarity.sql.keywordScoreFromLists("left_kw", "right_kw")} AS s_kw
       |  FROM $pairsFrom),
       |best AS (SELECT left_key, right_key,
       |  CAST(coalesce(greatest(
       |    CASE WHEN s_sort >= $floorF THEN s_sort END,
       |    CASE WHEN s_set >= $floorF THEN s_set END,
       |    CASE WHEN s_ratio >= $floorF THEN s_ratio END,
       |    CASE WHEN s_kw >= 30 THEN s_kw END), 0) AS INT) AS score FROM scored),
       |ranked AS (SELECT *, row_number() OVER (
       |  PARTITION BY left_key ORDER BY score DESC, right_key ASC) AS rn FROM best),
       |matches AS (SELECT left_key, right_key, score AS merged_confidence
       |  FROM ranked WHERE rn = 1 AND score >= $cutoff)
       |SELECT abr.abn, abr.entity_name, abr.entity_type, abr.entity_status,
       |  abr.address, abr.postcode, abr.state, abr.start_date,
       |  cleaned.website_url, cleaned.extracted AS company_name, cleaned.industry,
       |  matches.merged_confidence
       |FROM matches
       |JOIN abr ON matches.left_key = abr.abn
       |JOIN cleaned ON matches.right_key = cleaned.cc_id""".stripMargin
  }

  private lazy val unifiedSql: String = unifiedSqlFrom("lp CROSS JOIN rp")
  private lazy val unifiedBlockedSql: String = unifiedSqlFrom(blockedPairsSrc)

  val oracles: Map[String, String] = Map(
    "u1_unified_pipeline" ->
      s"""SELECT * FROM ($unifiedSql) ORDER BY abn""".stripMargin,
    "u1_blocked_pipeline" ->
      s"""SELECT * FROM ($unifiedBlockedSql) ORDER BY abn""".stripMargin,
    "u2_quality_report" ->
      s"""SELECT count(*) AS total,
         |  count(CASE WHEN website_url IS NULL THEN 1 END) AS null_website,
         |  count(CASE WHEN industry IS NULL THEN 1 END) AS null_industry,
         |  count(CASE WHEN merged_confidence < 90 THEN 1 END) AS low_confidence,
         |  count(CASE WHEN merged_confidence = 100 THEN 1 END) AS perfect
         |FROM ($unifiedSql)""".stripMargin
  )
}
