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

  val queries: Map[String, Q] = Map(
    // Two-stage salted aggregation (hot-key split): same result as the
    // plain groupBy the oracle runs.
    "x1_salted_agg" -> ((s, d) =>
      Skew.saltedSumCount(
          t(s, d, "lineitem").select(col("l_returnflag"), col("l_quantity")),
          "l_returnflag", "l_quantity", saltBuckets = 16)
        .orderBy(col("l_returnflag"))),

    // Clone-mass skew cure (the shape x1's salt CANNOT mitigate):
    // a narrow projection of lineitem is almost entirely exact clones
    // (~150 distinct (l_linestatus, l_quantity) rows out of the whole
    // table), so a full-row salt would funnel each clone group through
    // one (key, salt) reducer. The declared cure dedups first — the
    // map-side partial collapse bounds reducer fan-in — then runs the
    // salted merge on distinct weighted rows. Oracle = the plain
    // group-sum (exact: l_quantity is integral-valued).
    "x5_clone_skew_agg" -> ((s, d) =>
      Skew.cloneSaltedSumCount(
          t(s, d, "lineitem").select(col("l_linestatus"), col("l_quantity")),
          "l_linestatus", "l_quantity", saltBuckets = 16)
        .orderBy(col("l_linestatus"))),

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
    // the exact removal when triage says it matters)
    "x7_kmv_overlap" -> ((s, d) => {
      val docs = t(s, d, "documents")
      def grams(df: org.apache.spark.sql.DataFrame) =
        df.select(explode(graft.functions.Hashing.shingles(col("text"), 3)).as("key"))
      Sketches.kmvOverlapEstimate(
        grams(docs.filter(col("doc_id") % 97 === 0)),
        grams(docs.filter(col("doc_id") % 97 =!= 0)), "key", 256)
    }),

    // Salted fact×dim join (dimension replicated per salt, fact salted):
    // same rows as the plain equi-join + aggregation.
    "x2_salted_join" -> ((s, d) => {
      val fact = t(s, d, "lineitem")
        .select(col("l_suppkey").as("suppkey"), col("l_quantity"))
      val dim = t(s, d, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_name"))
      Skew.saltedJoin(fact, dim, "suppkey", saltBuckets = 8)
        .groupBy(col("s_name"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("s_name"))
    })
  )

  val oracles: Map[String, String] = Map(
    "x1_salted_agg" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_l_quantity, count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "x5_clone_skew_agg" ->
      """SELECT l_linestatus, sum(l_quantity) AS sum_l_quantity, count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_linestatus""".stripMargin,
    "x2_salted_join" ->
      """SELECT s_name, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY s_name""".stripMargin,
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
