package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.{Sketches, Skew}

/** Skew-handling operators under the oracle gate: the salted forms must
  * produce EXACTLY the rows of their unsalted equivalents (which is what
  * the DuckDB oracle runs). Value determinism: the salted re-merge
  * reorders FP addition, so the summed measure is integral-valued
  * (l_quantity) — integer-valued doubles below 2^53 sum exactly in any
  * order. Counts are exact by nature.
  */
object ScaleQueries {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** The clone-skewed key/value relation the x1/x2/x5 skew cures are
    * declared (and scale-measured) over, derived deterministically from
    * lineitem — which [[graft.tools.ScaleGen]] replicates with strided
    * orderkeys, so the relation GROWS with the scale multiplier while
    * its skew shape is invariant:
    *
    *  - `k`:  'hot' for 75% of rows at every scale (orderkey % 4 ≠ 0 —
    *          one key ≫ any reducer's fair share, the funnel shape),
    *          'k<suppkey>' for the ~|supplier| tail keys.
    *  - `v`:  distinct-valued per row within the hot key (strided
    *          orderkey ⊗ linenumber) — the payload a full-row salt CAN
    *          spread (x1/x2's shape). Bounded ≤ 2^23 so sums stay
    *          ANSI-safe through x1000 (6e8 rows × 8.4e6 ≈ 5e15 < 2^63).
    *  - `dv`: l_quantity mod 8 — eight distinct values, so the hot
    *          key's mass is EXACT CLONES (clone mass ≈ 0.75·|lineitem|,
    *          ≥ 10^6 rows per (k, dv) group at x100): the shape a
    *          full-row salt CANNOT split and x5's dedup-first cure
    *          exists for.
    *
    * Every column is integral and SQL-expressible, so the DuckDB oracle
    * runs the identical derivation (see [[skewFactsSql]]).
    * `private[graft]`: the ScaleRun skew-contrast block measures the
    * naive shapes over the SAME relation the declared queries run on. */
  private[graft] def skewFacts(li: DataFrame): DataFrame =
    li.select(
      when(col("l_orderkey") % 4 =!= 0, lit("hot"))
        .otherwise(concat(lit("k"), col("l_suppkey"))).as("k"),
      ((col("l_orderkey") % 1048576L) * 8 + col("l_linenumber")).as("v"),
      (col("l_quantity").cast("bigint") % 8).as("dv"))

  /** [[skewFacts]] as DuckDB SQL (l_quantity is integral-valued, so the
    * bigint cast is exact in both engines). */
  private val skewFactsSql: String =
    """SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 'hot'
      |            ELSE 'k' || CAST(l_suppkey AS VARCHAR) END AS k,
      |       (l_orderkey % 1048576) * 8 + l_linenumber AS v,
      |       CAST(l_quantity AS BIGINT) % 8 AS dv
      |FROM lineitem""".stripMargin

  val queries: Map[String, Q] = Map(
    // Two-stage salted aggregation (hot-key split): one key owns 75%
    // of the input but its rows are distinct-valued, so the full-row
    // salt spreads them over 16 buckets. Same result as the plain
    // groupBy the oracle runs (v is integral — exact in any order).
    "x1_salted_agg" -> ((s, d) =>
      Skew.saltedSumCount(
          skewFacts(t(s, d, "lineitem")).select(col("k"), col("v")),
          "k", "v", saltBuckets = 16)
        .orderBy(col("k"))),

    // Clone-mass skew cure (the shape x1's salt CANNOT mitigate): the
    // hot key's mass is exact clones of eight (k, dv) rows, so a
    // full-row salt funnels each clone group through ONE (key, salt)
    // reducer. The declared cure dedups first — the map-side partial
    // collapse bounds reducer fan-in to one row per (distinct value,
    // map partition) — then runs the salted merge on distinct weighted
    // rows. Oracle = the plain group-sum (exact: dv is integral).
    "x5_clone_skew_agg" -> ((s, d) =>
      Skew.cloneSaltedSumCount(
          skewFacts(t(s, d, "lineitem")).select(col("k"), col("dv")),
          "k", "dv", saltBuckets = 16)
        .orderBy(col("k"))),

    // Approximate aggregates — the sketches any 100 TB analytics layer
    // leans on — via DETERMINISTIC cross-engine constructions (see
    // operators/Sketches): KMV bottom-k distinct estimates over 60-bit
    // md5 (bit-identical in DuckDB, err ~1/sqrt(k)) + exact
    // interpolated median. Engine-internal HLL++/GK sketches remain
    // available (Spark built-ins) and are bounds-tested in
    // SkewBucketSpec, but the oracled query uses the auditable form.
    "x3_approx_stats" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val orders = Sketches.kmvDistinctEstimate(li, "l_orderkey", 256)
        .withColumnRenamed("est", "kmv_orders")
      val parts = Sketches.kmvDistinctEstimate(li, "l_partkey", 256)
        .withColumnRenamed("est", "kmv_parts")
      val exact = li.agg(
        expr("percentile(l_extendedprice, 0.5)").as("median_price"),
        count(lit(1)).as("n"))
      // three 1-row aggregates: the cross joins are trivially broadcast
      orders.crossJoin(parts).crossJoin(exact)
    }),

    // Z-order clustering stats: per-z-bucket row counts and per-bucket
    // (x, y) bounding boxes over orders — the Morton-curve locality
    // measure behind Layout.writeZOrdered (each z-bucket = a compact
    // 2-D rectangle, so clustered files carry tight min/max stats on
    // BOTH dimensions; SkewBucketSpec measures the actual written layout).
    // Pure integer shift/mask arithmetic → exact DuckDB oracle.
    "x4_zorder_stats" -> ((s, d) => {
      val o = t(s, d, "orders")
        .withColumn("x", pmod(col("o_custkey"), lit(1024)).cast("bigint"))
        .withColumn("y", pmod(datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("bigint"), lit(1024)))
      o.withColumn("z", graft.sources.Layout.zValue(col("x"), col("y"), 10))
        .groupBy(expr("z DIV 1024").as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy(col("zbucket"))
    }),

    // Per-group KMV distinct estimates — the grouped cardinality
    // dashboard (distinct orders per return flag) with the bottom-k
    // located by a WindowGroupLimit partial, never a full per-group sort
    "x6_grouped_kmv" -> ((s, d) =>
      Sketches.kmvGroupedDistinctEstimate(
          t(s, d, "lineitem"), "l_returnflag", "l_orderkey", 128)
        .orderBy(col("l_returnflag"))),

    // KMV set algebra: estimated gram overlap between the held-out set
    // and the training corpus (contamination TRIAGE — is it 0.01% or
    // 10%? — from two sketch builds, no corpus×heldout join; c1/c4 do
    // the exact removal when triage says it matters). The sided
    // one-scan form: held-out vs training partition the SAME corpus,
    // so the side rides the gram stream as a flag and the text is read
    // and tokenized once (the two-frame form scanned documents twice —
    // a full extra I/O pass at 100 TB); sketches, and therefore every
    // estimate, are bit-identical to the two-frame form (SkewBucketSpec
    // pins it).
    "x7_kmv_overlap" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val grams = docs.select((col("doc_id") % 97 === 0).as("is_held_out"),
        explode(graft.functions.Hashing.shingles(col("text"), 3)).as("key"))
      Sketches.kmvOverlapEstimateSided(grams, "key", col("is_held_out"), 256)
    }),

    // Salted fact×dim join (dimension replicated per salt, fact salted
    // by full row — the hot key's distinct v values spread it): same
    // rows as the plain equi-join + aggregation. The dimension stays
    // |supplier|+1 rows at every scale (ScaleGen grows only the fact) —
    // the realistic shape where AQE may still broadcast; the scale
    // contrast cells (ScaleRun) disable broadcast to measure the
    // shuffle-join funnel this operator exists for.
    "x2_salted_join" -> ((s, d) => {
      val fact = skewFacts(t(s, d, "lineitem")).select(col("k"), col("v"))
      Skew.saltedJoin(fact, skewDim(s, d), "k", saltBuckets = 8)
        .groupBy(col("dim_name"))
        .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
        .orderBy(col("dim_name"))
    })
  )

  /** x2's dimension side: one row per tail key plus the hot key —
    * |supplier|+1 rows at EVERY scale (ScaleGen grows only the fact). */
  private[graft] def skewDim(s: SparkSession, d: String): DataFrame =
    t(s, d, "supplier")
      .select(concat(lit("k"), col("s_suppkey")).as("k"))
      .unionByName(s.range(1).select(lit("hot").as("k")))
      .withColumn("dim_name", concat(lit("name_"), col("k")))

  val oracles: Map[String, String] = Map(
    // CAST(sum(..) AS BIGINT): DuckDB sums BIGINT into HUGEINT
    // (decimal128); Spark's sum(bigint) stays bigint — align the
    // physical type (values are < 2^53, the cast is exact)
    "x1_salted_agg" ->
      s"""SELECT k, CAST(sum(v) AS BIGINT) AS sum_v, count(*) AS n
         |FROM ($skewFactsSql) GROUP BY 1 ORDER BY k""".stripMargin,
    "x5_clone_skew_agg" ->
      s"""SELECT k, CAST(sum(dv) AS BIGINT) AS sum_dv, count(*) AS n
         |FROM ($skewFactsSql) GROUP BY 1 ORDER BY k""".stripMargin,
    "x2_salted_join" ->
      s"""WITH f AS ($skewFactsSql),
         |dim AS (SELECT 'k' || CAST(s_suppkey AS VARCHAR) AS k FROM supplier
         |        UNION ALL SELECT 'hot')
         |SELECT 'name_' || dim.k AS dim_name,
         |       CAST(sum(f.v) AS BIGINT) AS sum_v, count(*) AS n
         |FROM f JOIN dim ON f.k = dim.k
         |GROUP BY 1 ORDER BY dim_name""".stripMargin,
    "x4_zorder_stats" -> {
      val z = graft.sources.Layout.sqlZValue("x", "y", 10)
      s"""WITH b AS (SELECT o_custkey % 1024 AS x,
         |  CAST(datediff('day', TIMESTAMP '1970-01-01', o_orderdate) AS BIGINT) % 1024 AS y
         |  FROM orders),
         |zt AS (SELECT x, y, $z AS z FROM b)
         |SELECT z // 1024 AS zbucket, count(*) AS n,
         |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
         |FROM zt GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "x6_grouped_kmv" ->
      s"""SELECT l_returnflag, est
         |FROM (${Sketches.kmvGroupedOracleSql("lineitem", "l_returnflag", "l_orderkey", 128)})
         |ORDER BY l_returnflag""".stripMargin,
    "x7_kmv_overlap" -> {
      def grams(filter: String) =
        s"""SELECT unnest(${graft.functions.Hashing.sql.shingles("text", 3)}) AS key
           |FROM documents WHERE $filter""".stripMargin
      Sketches.kmvOverlapOracleSql(
        grams("doc_id % 97 = 0"), grams("doc_id % 97 <> 0"), 256)
    },
    "x3_approx_stats" ->
      s"""SELECT o.est AS kmv_orders, p.est AS kmv_parts, s.median_price, s.n
         |FROM (${Sketches.kmvOracleSql("lineitem", "l_orderkey", 256)}) o
         |CROSS JOIN (${Sketches.kmvOracleSql("lineitem", "l_partkey", 256)}) p
         |CROSS JOIN (SELECT median(l_extendedprice) AS median_price, count(*) AS n
         |            FROM lineitem) s""".stripMargin
  )
}
