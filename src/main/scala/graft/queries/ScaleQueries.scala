package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.Skew

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

    // Approximate aggregates — the sketches any 100 TB analytics layer
    // leans on (HLL++ distinct counts, GK-sketch percentiles): one scan,
    // partial+final aggregation, fixed-size state per partition.
    // Declared WITHOUT an oracle (sketch internals differ per engine —
    // DuckDB's approx_count_distinct uses a different HLL construction,
    // so hash-parity is undefined by design); the spec bounds the
    // estimates against exact values instead.
    "x3_approx_stats" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_median_price"),
        count(lit(1)).as("n"))),

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
    "x2_salted_join" ->
      """SELECT s_name, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY s_name""".stripMargin
  )
}
