package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** S-7 (JSON resource discovery) + event-time processing over the
  * events stream table.
  *
  * NB: `events.parquet` has shipped both TIMESTAMP(NANOS) (read as
  * bigint nanos under `spark.sql.legacy.parquet.nanosAsLong`) and
  * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). `Tables.loadEventsUs`
  * normalizes `ts` to epoch-MICROS bigint at ingestion — the engine's
  * declared time RESOLUTION — so all comparisons, gaps, orderings, and
  * range frames here are integer micros, and every oracle expresses
  * the SAME truncated-micros domain (`epoch_ns(ts) // 1000`, floor):
  * an oracle comparing raw nanos would diverge the moment a feed
  * ships sub-microsecond precision.
  *
  * One deliberate exemption to the literal `epoch_ns // 1000` form:
  * w1's hour-bucket oracle uses `epoch_us(date_trunc('hour', ts))`.
  * That is floor-equivalent, not an escape from the domain — hour
  * truncation PRECEDES the conversion, and an hour boundary is always
  * a whole microsecond, so no sub-microsecond residue can exist at
  * the point `epoch_us` rounds. The invariant therefore holds for all
  * 13 temporal oracles: every ts enters comparison space as
  * floor-to-micros.
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)
  private def ev(s: SparkSession, d: String) = Tables.loadEventsUs(s, d)

  /** epoch-micros bigint → timestamp. */
  private def tsCol = timestamp_micros(col("ts"))

  val queries: Map[String, Q] = Map(
    // S-7: JSON field extraction + filter + ordered projection
    // (reference CKAN discovery: from_json + filter + orderBy,
    // scripts/extract_abr.py:33-54)
    "s7_json_discovery" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .filter(col("k").isNotNull && col("k") % 10 === 0 && col("event_type") === "click")
        .select(col("event_id"), col("k"))
        .orderBy(col("event_id"))),

    // W-1: event-time tumbling-hour aggregation (the batch shape of the
    // streaming windowed agg; output keyed by epoch-micros bucket).
    // The value sum goes through integer 1e-2 units (the w8/y1 cents
    // convention): round(sum(double), 2) is addition-order-dependent,
    // and at 10^8+ events per bucket the partial-aggregation order
    // (AQE, partition count, DuckDB's parallel sum) moves the FP error
    // across the rounding boundary — cents-longs sum exactly in any
    // order, and one final long/100.0 division is deterministic.
    "w1_event_window" -> ((s, d) =>
      ev(s, d)
        .withColumn("bucket_us", unix_micros(date_trunc("HOUR", tsCol)))
        .withColumn("v_e2", round(col("value") * 100).cast("long"))
        .groupBy(col("bucket_us"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(col("v_e2")) / 100.0).as("sum_value"))
        .orderBy(col("bucket_us"), col("event_type"))),

    // W-6: hopping (sliding) event-time window — 1-hour windows every
    // 15 min, each event lands in 4 overlapping windows; the batch
    // shape of `window(ts, len, slide)` streaming aggregation. Exact
    // micros arithmetic for the window starts; the oracle enumerates
    // the 4 covering starts per event with integer generate_series.
    "w6_hopping_window" -> ((s, d) =>
      ev(s, d)
        .withColumn("v_e2", round(col("value") * 100).cast("long"))
        .groupBy(window(tsCol, "1 hour", "15 minutes"),
          col("event_type"))
        // cents-longs, order-independent (the w1 reasoning)
        .agg(count(lit(1)).as("n"),
          (sum(col("v_e2")) / 100.0).as("sum_value"))
        .select(unix_micros(col("window.start")).as("win_start_us"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("win_start_us"), col("event_type"))),

    // W-7: ordered conversion funnel — users reaching view → click →
    // purchase where each stage's FIRST occurrence must be at/after the
    // previous stage's. The sequential dependency (stage n+1's cutoff is
    // stage n's min) is expressed as three UNORDERED per-user window
    // minima over ONE partitioning: the event stream hash-shuffles on
    // user_id exactly once (PlanSpec pins it) — a join/re-aggregate
    // formulation re-reads and re-exchanges the 100 TB stream per stage.
    "w7_funnel" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
      ev(s, d).select(col("user_id"), col("ts"), col("event_type"))
        .withColumn("t_view",
          min(when(col("event_type") === "view", col("ts"))).over(byUser))
        .withColumn("t_click",
          min(when(col("event_type") === "click" && col("ts") >= col("t_view"),
            col("ts"))).over(byUser))
        .withColumn("t_purchase",
          min(when(col("event_type") === "purchase" && col("ts") >= col("t_click"),
            col("ts"))).over(byUser))
        .groupBy(col("user_id"))
        .agg(first(col("t_view")).as("t_view"), first(col("t_click")).as("t_click"),
          first(col("t_purchase")).as("t_purchase"))
        .agg(count(col("t_view")).as("n_view"),
          count(col("t_click")).as("n_click"),
          count(col("t_purchase")).as("n_purchase"))
    }),

    // W-8: trailing-hour moving aggregates via a RANGE frame over the
    // raw micros timeline (event-time sliding window per row, not
    // w6's fixed hop grid). Integer 1e-2 value units keep the moving
    // sum exact under any frame-evaluation order — DuckDB computes
    // sliding aggregates with a segment tree, so a double sum would
    // differ in the last ulp.
    "w8_moving_avg" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hourUs = 3600L * 1000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc)
        .rangeBetween(-hourUs, 0)
      ev(s, d)
        .withColumn("v_e2", round(col("value") * 100).cast("long"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_e2_1h", sum(col("v_e2")).over(w))
        .select(col("user_id"), col("event_id"),
          col("ts").as("ts_us"), col("n_1h"), col("sum_e2_1h"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    }),

    // W-5: time-series regularization — hourly grid per user between
    // first and last observation, latest value forward-filled into gaps
    "w5_gapfill" -> ((s, d) =>
      graft.operators.GapFill.forwardFill(
          ev(s, d).select(col("user_id"), col("ts"), col("value")),
          "user_id", "ts", "value", step = 3600L * 1000000L)
        .orderBy(col("user_id"), col("bucket"))),

    // W-2: per-user ordered window — running event count + value rank
    "w2_user_running" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      ev(s, d)
        .withColumn("v_e2", round(col("value") * 100).cast("long"))
        .withColumn("seq", row_number().over(byUser))
        // cents-longs through the running sum (the w1/w8 reasoning):
        // a running double sum re-rounds per row and drifts with order
        .withColumn("running_value",
          sum(col("v_e2")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)) / 100.0)
        .filter(col("seq") <= 3)
        .select(col("user_id"), col("seq"), col("event_id"), col("running_value"))
        .orderBy(col("user_id"), col("seq"))
    }),

    // W-4: the same sessionization via Spark's NATIVE session_window
    // aggregation (merging windows, no manual lag/running-sum) — the
    // operator a streaming deployment would use; oracle replicates the
    // session-formation rule (new session iff gap >= 30 min, end =
    // last event + gap) in SQL
    "w4_session_window" -> ((s, d) =>
      ev(s, d)
        .withColumn("ets", tsCol)
        .groupBy(session_window(col("ets"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("start_us"),
          unix_micros(col("sw.end")).as("end_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("start_us"))),

    // W-3: gap-based sessionization (the batch/window twin of
    // streaming/EventStream's mapGroupsWithState sessionizer): a new
    // session starts after a >30 min silence; all time math on integer
    // micros.
    "w3_sessionize" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val gapUs = 30L * 60L * 1000000L
      ev(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_seq",
          sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("start_us"),
          max(col("ts")).as("end_us"))
        .orderBy(col("user_id"), col("session_seq"))
    })
  )

  val oracles: Map[String, String] = Map(
    "s7_json_discovery" ->
      """SELECT event_id, k FROM (
        |  SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k, event_type FROM events)
        |WHERE k IS NOT NULL AND k % 10 = 0 AND event_type = 'click'
        |ORDER BY event_id""".stripMargin,
    "w1_event_window" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us, event_type,
        |  count(*) AS n,
        |  sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket_us, event_type""".stripMargin,
    "w6_hopping_window" ->
      """WITH e AS (SELECT epoch_ns(ts) // 1000 AS t_us, event_type, value FROM events),
        |hops AS (SELECT event_type, value,
        |  unnest(generate_series((t_us // 900000000) * 900000000 - 2700000000,
        |                         (t_us // 900000000) * 900000000, 900000000)) AS win_start_us
        |  FROM e)
        |SELECT win_start_us, event_type, count(*) AS n,
        |  sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
        |FROM hops GROUP BY 1, 2 ORDER BY win_start_us, event_type""".stripMargin,
    "w7_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tus FROM events),
        |s1 AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN tus END) AS t_view
        |       FROM e GROUP BY 1),
        |s2 AS (SELECT e.user_id, any_value(s1.t_view) AS t_view,
        |         min(CASE WHEN e.event_type = 'click' AND e.tus >= s1.t_view THEN e.tus END) AS t_click
        |       FROM e JOIN s1 USING (user_id) GROUP BY 1),
        |s3 AS (SELECT e.user_id, any_value(s2.t_click) AS t_click, any_value(s2.t_view) AS t_view,
        |         min(CASE WHEN e.event_type = 'purchase' AND e.tus >= s2.t_click THEN e.tus END) AS t_purchase
        |       FROM e JOIN s2 USING (user_id) GROUP BY 1)
        |SELECT count(t_view) AS n_view, count(t_click) AS n_click,
        |  count(t_purchase) AS n_purchase FROM s3""".stripMargin,
    "w8_moving_avg" ->
      """SELECT user_id, event_id, tus AS ts_us,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sum_e2_1h
        |FROM (SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS tus FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "w5_gapfill" ->
      """WITH ev AS (SELECT user_id, us // 3600000000 AS bucket, us, value
        |            FROM (SELECT user_id, epoch_ns(ts) // 1000 AS us, value FROM events)),
        |obs AS (SELECT user_id, bucket,
        |          (max(CASE WHEN value IS NOT NULL THEN {'u': us, 'v': value} END)).v AS obs_value
        |        FROM ev GROUP BY 1, 2),
        |span AS (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx FROM ev GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(mn, mx)) AS bucket FROM span)
        |SELECT user_id, bucket,
        |  last_value(obs_value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  obs_value IS NULL AS is_gap
        |FROM grid LEFT JOIN obs USING (user_id, bucket)
        |ORDER BY user_id, bucket""".stripMargin,
    "w2_user_running" ->
      """SELECT user_id, CAST(seq AS INT) AS seq, event_id, running_value FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY tus ASC, event_id ASC) AS seq,
        |    sum(CAST(round(value * 100) AS BIGINT)) OVER (PARTITION BY user_id
        |      ORDER BY tus ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_value
        |  FROM (SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS tus FROM events))
        |WHERE seq <= 3 ORDER BY user_id, seq""".stripMargin,
    "w4_session_window" ->
      """SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us,
        |  count(*) AS n_events
        |FROM (
        |  SELECT user_id, us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM (
        |    SELECT user_id, event_id, us,
        |      CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC) IS NULL
        |        OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC) >= 1800000000
        |        THEN 1 ELSE 0 END AS is_new
        |    FROM (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events)))
        |GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin,
    "w3_sessionize" ->
      """SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  count(*) AS n_events, min(tus) AS start_us, max(tus) AS end_us
        |FROM (
        |  SELECT user_id, event_id, tus,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY tus ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM (
        |    SELECT user_id, event_id, tus,
        |      CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus ASC, event_id ASC) IS NULL
        |        OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus ASC, event_id ASC) > 1800000000
        |        THEN 1 ELSE 0 END AS is_new
        |    FROM (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus FROM events)))
        |GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin
  )
}
