package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.{AsOfJoin, RangeJoin}

/** Temporal/interval join operators bound to testdata: backward as-of
  * join (Y-1) and point-in-interval range join (Y-2). Both DuckDB
  * oracles use the engine's NATIVE formulation (ASOF JOIN, inequality
  * join) while the Spark side runs the scale-path rewrite (union-merge
  * window / bucket decomposition) — the hash compare proves the rewrite
  * is semantics-preserving, which is the whole point.
  *
  * Timestamp parity: `Tables.loadEventsUs` normalizes events.ts to
  * epoch-MICROS bigint whatever the parquet shipped (TIMESTAMP(NANOS)
  * bigint under nanosAsLong, or TIMESTAMP(MICROS)/NTZ); every emitted
  * time is epoch micros (`epoch_ns(ts) // 1000` in DuckDB — floor, not
  * round, so pre-1970 sub-microsecond nanos agree). Money parity: sums
  * go through `CAST(round(v*100) AS BIGINT)` cents so aggregation is
  * integer-exact in both engines.
  */
object TemporalQueries {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)
  private def ev(s: SparkSession, d: String) = Tables.loadEventsUs(s, d)

  val queries: Map[String, Q] = Map(
    // Y-1: for every view event, the user's most recent prior (<=)
    // purchase — pre-aggregated per (user, ts) so the right timeline is
    // unique, then union-merge as-of join, one shuffle on user_id
    "y1_asof_join" -> ((s, d) => {
      val events = ev(s, d)
      val views = events.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = events.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(count(lit(1)).as("purch_n"),
          sum(round(col("value") * 100).cast("long")).as("purch_value_e2"))
      AsOfJoin.backward(views, purchases, Seq("user_id"), "ts", asofTsAs = "purch_ts")
        .select(col("event_id"), col("user_id"),
          col("ts").as("view_us"),
          col("purch_ts").as("purch_us"),
          col("purch_n"), col("purch_value_e2"))
        .orderBy(col("event_id"))
    }),

    // Y-3: the forward mirror — each view's NEXT purchase at-or-after
    "y3_asof_forward" -> ((s, d) => {
      val events = ev(s, d)
      val views = events.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = events.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(count(lit(1)).as("purch_n"))
      AsOfJoin.forward(views, purchases, Seq("user_id"), "ts", asofTsAs = "purch_ts")
        .select(col("event_id"),
          col("purch_ts").as("purch_us"), col("purch_n"))
        .orderBy(col("event_id"))
    }),

    // Y-2: orders priced inside overlapping nation-keyed bands —
    // bucket-decomposed equi-join (no BroadcastNestedLoop), aggregated
    // per band; cents-scaled longs end to end
    "y2_range_join" -> ((s, d) => {
      val points = t(s, d, "orders")
        .select(round(col("o_totalprice") * 100).cast("long").as("price_e2"))
      val intervals = t(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"),
          (col("n_nationkey").cast("long") * 700000L).as("lo_e2"),
          (col("n_nationkey").cast("long") * 700000L + 2000000L).as("hi_e2"))
      RangeJoin.pointInInterval(points, "price_e2", intervals, "lo_e2", "hi_e2",
          width = 500000L)
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"), sum(col("price_e2")).as("sum_price_e2"))
        .orderBy(col("n_nationkey"))
    }),

    // Y-4: band (tolerance) self-join — same-user event pairs within one
    // hour, via the ±1-bucket decomposition (equi-join on (user, bucket),
    // never a nested-loop time join); the DuckDB oracle runs the native
    // inequality join. Aggregated per user so the output stays bounded
    // while the pair stream is what's verified.
    "y4_band_join" -> ((s, d) => {
      val deltaUs = 3600L * 1000000L
      val e = ev(s, d)
        .select(col("user_id"), col("event_id"), col("ts").as("t_us"))
      RangeJoin.bandJoin(e, e, Seq("user_id"), "t_us", deltaUs)
        .filter(col("event_id") < col("event_id_r"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(abs(col("t_us") - col("t_us_r"))).as("sum_gap_us"),
          max(abs(col("t_us") - col("t_us_r"))).as("max_gap_us"))
        .orderBy(col("user_id"))
    }),

    // Y-5: interval-overlap self-join — concurrent user sessions
    // (30-min-gap sessionization, active window padded by the gap), via
    // bucket decomposition with the emit-once anchor trick (a pair
    // survives only in the bucket of greatest(lo_a, lo_b) — no DISTINCT
    // over the pair stream). Oracle = native inequality overlap join
    // over the identical session CTE.
    "y5_interval_overlap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val gapUs = 30L * 60L * 1000000L
      // the pad IS the session gap (the oracle hard-codes 1800000000 for
      // both); one binding makes the coupling structural — editing the
      // gap without the pad would silently break the no-self-overlap
      // property the decomposition relies on
      val padUs = gapUs
      val sessions = ev(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_seq",
          sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts")).as("lo_us"),
          (max(col("ts")) + lit(padUs)).as("hi_us"))
      RangeJoin.intervalOverlap(sessions, sessions, Seq.empty,
          "lo_us", "hi_us", width = padUs)
        .filter(col("user_id") < col("user_id_r"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_overlaps"),
          countDistinct(col("user_id_r")).as("n_users"))
        .orderBy(col("user_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "y1_asof_join" ->
      """WITH v AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tus
        |      FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, epoch_ns(ts) // 1000 AS tus, count(*) AS purch_n,
        |        CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS purch_value_e2
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT v.event_id, v.user_id, v.tus AS view_us,
        |  p.tus AS purch_us, p.purch_n, p.purch_value_e2
        |FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.tus >= p.tus
        |ORDER BY v.event_id""".stripMargin,
    "y3_asof_forward" ->
      """WITH v AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tus
        |      FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, epoch_ns(ts) // 1000 AS tus, count(*) AS purch_n
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT v.event_id, p.tus AS purch_us, p.purch_n
        |FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.tus <= p.tus
        |ORDER BY v.event_id""".stripMargin,
    "y2_range_join" ->
      """WITH p AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS price_e2 FROM orders),
        |i AS (SELECT n_nationkey, n_name, CAST(n_nationkey AS BIGINT) * 700000 AS lo_e2,
        |        CAST(n_nationkey AS BIGINT) * 700000 + 2000000 AS hi_e2 FROM nation)
        |SELECT n_nationkey, n_name, count(*) AS n_orders,
        |  CAST(sum(price_e2) AS BIGINT) AS sum_price_e2
        |FROM i JOIN p ON price_e2 >= lo_e2 AND price_e2 < hi_e2
        |GROUP BY 1, 2 ORDER BY n_nationkey""".stripMargin,
    "y4_band_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS t_us FROM events)
        |SELECT a.user_id, count(*) AS n_pairs,
        |  CAST(sum(abs(a.t_us - b.t_us)) AS BIGINT) AS sum_gap_us,
        |  CAST(max(abs(a.t_us - b.t_us)) AS BIGINT) AS max_gap_us
        |FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(a.t_us - b.t_us) <= 3600000000
        |GROUP BY 1 ORDER BY a.user_id""".stripMargin,
    "y5_interval_overlap" ->
      """WITH seg AS (
        |  SELECT user_id, event_id, tus,
        |    CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus ASC, event_id ASC) IS NULL
        |      OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus ASC, event_id ASC) > 1800000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus FROM events)),
        |numbered AS (
        |  SELECT user_id, tus,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY tus ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM seg),
        |iv AS (
        |  SELECT user_id, session_seq, min(tus) AS lo_us,
        |    max(tus) + 1800000000 AS hi_us
        |  FROM numbered GROUP BY 1, 2)
        |SELECT a.user_id, count(*) AS n_overlaps,
        |  CAST(count(DISTINCT b.user_id) AS BIGINT) AS n_users
        |FROM iv a JOIN iv b ON a.user_id < b.user_id
        |  AND a.lo_us < b.hi_us AND b.lo_us < a.hi_us
        |GROUP BY 1 ORDER BY a.user_id""".stripMargin
  )
}
