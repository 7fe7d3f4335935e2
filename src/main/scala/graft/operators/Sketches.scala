package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deterministic, cross-engine-reproducible approximate aggregates.
  *
  * The engine-internal sketches (Spark's HLL++ `approx_count_distinct`,
  * GK `percentile_approx`) give no cross-engine parity: their internals
  * differ per implementation, so two correct engines produce different
  * estimates. For an auditable pipeline (and for this repo's DuckDB
  * hash-gate) we instead use:
  *
  *  - '''KMV (bottom-k minimum values) distinct-count estimate''' over a
  *    60-bit md5 hash: both engines hash identically
  *    (`conv(substr(md5(x),1,15),16,10)` == DuckDB
  *    `('0x'||substr(md5(x),1,15))::BIGINT`), so the bottom-k set — and
  *    therefore the estimate `(k-1) * 2^60 / h_k` — is bit-identical.
  *    Estimator: Bar-Yossef et al., "Counting distinct elements in a
  *    data stream" (RANDOM 2002); standard error ~ 1/sqrt(k).
  *  - '''exact median''' via `percentile(col, 0.5)` (linear-interpolation
  *    rule matches DuckDB `median` bitwise for even/odd counts).
  *
  * Scale shape: the KMV inner plan is `distinct → TakeOrdered(k)`.
  * The map side partially deduplicates (hash-aggregate) before the
  * exchange, so the shuffle carries O(n_distinct) longs — never the raw
  * rows — and the top-k is a per-partition heap merge, not a global
  * sort. At 100 TB with very high key cardinality, pre-filter
  * `h < cap` with a conservative cap (e.g. from a prior round's
  * estimate × 4) to bound the exchange further; correctness is
  * unaffected as long as cap keeps ≥ k hashes alive.
  */
object Sketches {

  /** 60-bit md5-derived hash of a key column (same value in DuckDB —
    * first 7.5 digest bytes, always positive, < 2^60). ONE recipe:
    * delegates to [[Hashing.hash64]] after the string cast, so a
    * change to the digest slicing happens in exactly one place on
    * each engine (the oracle builders below use
    * [[Hashing.sql.hash64]] the same way). */
  def hash60(c: Column): Column = Hashing.hash64(c.cast("string"))

  private val TWO_POW_60 = 1152921504606846976.0 // exact in double

  /** The KMV estimator over an aggregated (hk, c) sketch summary — ONE
    * definition per engine (the hash60 "ONE recipe" rule; the SQL twin
    * is [[sqlKmvEst]]): fewer than k distinct hashes means the sketch
    * saw every key, so the count IS the answer; otherwise
    * (k-1) * 2^60 is an exact double (k small) and the single division
    * is IEEE-754-identical across engines. */
  private def kmvEst(k: Int): Column =
    when(col("c") < k, col("c").cast("double"))
      .otherwise(lit((k - 1).toDouble * TWO_POW_60) / col("hk"))

  /** DuckDB twin of [[kmvEst]] over (`cnt`, `hk`) SQL expressions. */
  private def sqlKmvEst(k: Int, cnt: String, hk: String): String =
    s"CASE WHEN $cnt < $k THEN CAST($cnt AS DOUBLE) ELSE ${(k - 1).toDouble} * $TWO_POW_60 / $hk END"

  /** One-row DataFrame `(est: double)` — KMV distinct-count estimate of
    * `keyCol` with sketch size k. Duplicates collapse before the top-k
    * (same key → same hash), so the multiset input is handled exactly
    * as the estimator requires. */
  def kmvDistinctEstimate(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    // k = 1 would make the (k-1)·2^60/hk numerator zero — a confidently
    // wrong estimate of 0.0 for any non-empty input, not an error
    require(k >= 2, "KMV sketch size k must be >= 2")
    df.select(hash60(col(keyCol)).as("h"))
      // COUNT(DISTINCT x) semantics: null keys don't count — and a null
      // hash would sort FIRST in Spark but LAST in DuckDB, silently
      // stealing a bottom-k slot on one side only
      .filter(col("h").isNotNull)
      .distinct()
      .orderBy(col("h"))
      .limit(k)
      .agg(max(col("h")).as("hk"), count(lit(1)).as("c"))
      // estimator semantics: see kmvEst
      .select(kmvEst(k).as("est"))
  }

  /** Per-GROUP KMV distinct-count estimates: one `(group, est)` row per
    * group. Same estimator as [[kmvDistinctEstimate]]; the bottom-k per
    * group comes from a rank window that Spark 4 rewrites with a
    * WindowGroupLimit partial — each map task keeps only its k smallest
    * hashes per group BEFORE the exchange, so the shuffle carries
    * O(groups × k × partitions) longs, never a group's full distinct
    * set, and no group ever funnels its whole key space through one
    * sort (PlanSpec pins the partial). The grouped form every
    * per-source / per-day cardinality dashboard needs at corpus scale. */
  def kmvGroupedDistinctEstimate(df: DataFrame, groupCol: String,
                                 keyCol: String, k: Int): DataFrame = {
    require(k >= 2, "KMV sketch size k must be >= 2") // see kmvDistinctEstimate
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h").asc)
    df.select(col(groupCol), hash60(col(keyCol)).as("h"))
      .filter(col("h").isNotNull) // see kmvDistinctEstimate
      .distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(col(groupCol))
      .agg(max(col("h")).as("hk"), count(lit(1)).as("c"))
      .select(col(groupCol), kmvEst(k).as("est"))
  }

  /** DuckDB twin of [[kmvGroupedDistinctEstimate]]. */
  def kmvGroupedOracleSql(table: String, groupCol: String,
                          keyCol: String, k: Int): String =
    s"""SELECT $groupCol, ${sqlKmvEst(k, "cnt", "hk")} AS est FROM (
       |  SELECT $groupCol, max(h) AS hk, count(*) AS cnt FROM (
       |    SELECT $groupCol, h, row_number() OVER (PARTITION BY $groupCol ORDER BY h ASC) AS rk FROM (
       |      SELECT DISTINCT $groupCol, ${Hashing.sql.hash64(s"CAST($keyCol AS VARCHAR)")} AS h
       |      FROM $table WHERE $keyCol IS NOT NULL))
       |  WHERE rk <= $k GROUP BY $groupCol)""".stripMargin

  /** KMV set algebra: estimate |A|, |B|, |A∪B| and |A∩B| from bottom-k
    * sketches of two key sets — overlap measured WITHOUT joining the
    * full sets. The union sketch is the bottom-k of the two sketches'
    * union (a property unique to minimum-value sketches); the Jaccard
    * fraction is the share of union-sketch members present in both
    * side sketches, and |A∩B| ≈ J × |A∪B|est (Beyer et al., SIGMOD
    * 2007). Everything is integer hashes + one exact double divide/
    * multiply, so the estimate chain is bitwise cross-engine (x7).
    *
    * Why in a training pipeline: contamination triage. An exact
    * decontamination join (c1/c4) over 100 TB is a real job; this
    * answers "is the overlap ~0.01% or ~10%?" from two
    * O(n_distinct)-shuffle sketch builds, cheap enough to run per
    * ingest batch against every benchmark suite.
    *
    * @param a,b single-column frames of keys (duplicates collapse)
    * @return one row: (est_a, est_b, est_union, est_inter)
    */
  def kmvOverlapEstimate(a: DataFrame, b: DataFrame, keyCol: String,
                         k: Int): DataFrame = {
    require(k >= 2, "KMV sketch size k must be >= 2") // see kmvDistinctEstimate
    def sketch(df: DataFrame): DataFrame =
      df.select(hash60(col(keyCol)).as("h"))
        .filter(col("h").isNotNull) // see kmvDistinctEstimate
        .distinct()
        .orderBy(col("h")).limit(k)
    overlapFromSketches(sketch(a), sketch(b), k)
  }

  /** [[kmvOverlapEstimate]] when the two key sets arrive as ONE stream
    * with a side flag — the one-scan form for sides carved out of the
    * same corpus (x7: held-out vs training grams partition `documents`,
    * so the two-frame form reads and tokenizes the corpus text TWICE;
    * at 100 TB the second scan is a full extra I/O pass).
    *
    * Bit-identical to `kmvOverlapEstimate(df.filter(sideA),
    * df.filter(!sideA))` by construction: per-side DISTINCT membership
    * becomes one `groupBy(h)` carrying two membership flags (map-side
    * partial aggregation bounds the exchange to O(n_distinct) rows —
    * the same volume the two per-side distincts shuffled combined),
    * and each side's sketch is the bottom-k of its flagged hashes —
    * the identical set the per-side distinct produced. The two sketch
    * branches share one canonical aggregate subtree, so Spark plans a
    * single exchange and reuses it (one corpus pass, one shuffle).
    * Null keys hash to null and are filtered exactly as before; rows
    * with a null side flag belong to NEITHER side (a flag derived from
    * a non-null column is never null — callers partitioning a corpus
    * pass a total predicate).
    *
    * @param sideA boolean column: true = the key belongs to set A,
    *              false = set B. */
  def kmvOverlapEstimateSided(df: DataFrame, keyCol: String, sideA: Column,
                              k: Int): DataFrame = {
    require(k >= 2, "KMV sketch size k must be >= 2") // see kmvDistinctEstimate
    // The grouped-KMV shape (x6): distinct (side, h), then the per-side
    // bottom-k from a rank window Spark 4 rewrites with a
    // WindowGroupLimit PARTIAL — each map task keeps only its k
    // smallest hashes per side BEFORE the window exchange, so both
    // sketches come out of ONE execution with one O(n_distinct)
    // distinct-exchange plus one O(sides × k × partitions)-row window
    // exchange. (Per-side filter branches over a shared flagged
    // aggregate do NOT work: column pruning specializes each branch's
    // aggregate to its own flag, the subtrees stop being canonically
    // equal, exchange reuse misses, and the corpus is scanned and
    // shuffled twice — measured 2× cpu and 2× shuffle bytes.)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__a")).orderBy(col("h").asc)
    val both = Materialize.once(df
      .select(hash60(col(keyCol)).as("h"), sideA.as("__a"))
      .filter(col("h").isNotNull) // see kmvDistinctEstimate
      .distinct()
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("__a"), col("h")))
    overlapFromSketches(
      both.filter(col("__a")).select(col("h")),
      both.filter(!col("__a")).select(col("h")), k)
  }

  /** Shared estimator tail of the two overlap forms (sketches in,
    * one (est_a, est_b, est_union, est_inter) row out). */
  private def overlapFromSketches(skA: DataFrame, skB: DataFrame,
                                  k: Int): DataFrame = {
    def est(sk: DataFrame, name: String): DataFrame =
      sk.agg(max(col("h")).as("hk"), count(lit(1)).as("c"))
        .select(kmvEst(k).as(name))
    // Materialize.once, not persist: each sketch feeds multiple
    // subtrees (estimate + semi-joins + union), but a df.persist entry
    // on these call-local frames would pin the CacheManager for the
    // session's life (the winnowingOverlap idiom). Each is ≤ k rows.
    val sa = Materialize.once(skA)
    val sb = Materialize.once(skB)
    val su = Materialize.once(
      sa.union(sb).distinct().orderBy(col("h")).limit(k))
    val inBoth = su.join(sa, Seq("h"), "left_semi").join(sb, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    val uCnt = su.agg(count(lit(1)).as("n_union"))
    est(sa, "est_a").crossJoin(est(sb, "est_b")).crossJoin(est(su, "est_union"))
      .crossJoin(broadcast(inBoth)).crossJoin(broadcast(uCnt))
      .select(col("est_a"), col("est_b"), col("est_union"),
        // empty union sketch → overlap 0, not 0/0 = NaN
        when(col("n_union") === 0, lit(0.0))
          .otherwise((col("n_both").cast("double") / col("n_union").cast("double")) *
            col("est_union")).as("est_inter"))
  }

  /** DuckDB twin of [[kmvOverlapEstimate]] — `aSql`/`bSql` are queries
    * yielding one `key` column. */
  def kmvOverlapOracleSql(aSql: String, bSql: String, k: Int): String = {
    def h(src: String) =
      s"SELECT DISTINCT ${Hashing.sql.hash64("CAST(key AS VARCHAR)")} AS h FROM ($src) WHERE key IS NOT NULL"
    def est(sk: String, name: String) =
      s"SELECT ${sqlKmvEst(k, "count(*)", "max(h)")} AS $name FROM $sk"
    s"""WITH sa AS (SELECT h FROM (${h(aSql)}) ORDER BY h LIMIT $k),
       |sb AS (SELECT h FROM (${h(bSql)}) ORDER BY h LIMIT $k),
       |su AS (SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)
       |       ORDER BY h LIMIT $k),
       |nb AS (SELECT count(*) AS n_both FROM su
       |       WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)),
       |nu AS (SELECT count(*) AS n_union FROM su)
       |SELECT ea.est_a, eb.est_b, eu.est_union,
       |  CASE WHEN nu.n_union = 0 THEN 0.0::DOUBLE
       |       ELSE (nb.n_both::DOUBLE / nu.n_union::DOUBLE) * eu.est_union END AS est_inter
       |FROM (${est("sa", "est_a")}) ea, (${est("sb", "est_b")}) eb,
       |     (${est("su", "est_union")}) eu, nb, nu""".stripMargin
  }

  /** DuckDB twin of [[kmvDistinctEstimate]], for oracle SQL assembly. */
  def kmvOracleSql(table: String, keyCol: String, k: Int): String =
    s"""SELECT ${sqlKmvEst(k, "count(*)", "max(h)")} AS est FROM (
       |  SELECT h FROM (
       |    SELECT DISTINCT ${Hashing.sql.hash64(s"CAST($keyCol AS VARCHAR)")} AS h
       |    FROM $table WHERE $keyCol IS NOT NULL)
       |  ORDER BY h LIMIT $k)""".stripMargin
}
