package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Real-time processing surface beyond the reference's batch-incremental
  * model (§2.I): event-time windowed aggregation with watermarks and
  * custom sessionization state — the streaming shapes a 100 TB training
  * -data pipeline needs for live ingestion, expressed on Structured
  * Streaming so the SAME transformations run micro-batch or continuous.
  */
object EventStream {

  /** Watermarked tumbling-window aggregation over an event stream with
    * (ts: timestamp, event_type: string, value: double). Late events
    * beyond the watermark are dropped by the engine, bounding state.
    * The value sum goes through integer 1e-2 units (the batch twins'
    * w1/w8 cents convention): a raw double sum is addition-order-
    * dependent, and micro-batch arrival order is exactly the
    * nondeterminism that would make two runs of the same stream
    * disagree in the low bits. */
  def windowedAgg(events: DataFrame, watermark: String, window_ : String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .withColumn("v_e2", round(col("value") * 100).cast("long"))
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), (sum(col("v_e2")) / 100.0).as("sum_value"))

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  /** `totalE2`: integer 1e-2 value units — groupByKey hands the state
    * function rows in shuffle order, so a running double total would
    * drift with partitioning (the windowedAgg reasoning, in state). */
  case class SessionState(n: Long, totalE2: Long)
  case class SessionOut(user_id: Long, n_events: Long, total_value: Double, closed: Boolean)

  /** Per-user sessionization via mapGroupsWithState: accumulates counts
    * and value per user, emitting the running session row each batch
    * (the keep-first/seen-keys shape of SURVEY §2.I generalized).
    * `timeoutMs > 0` arms a processing-time timeout that closes idle
    * sessions and bounds state — for continuously-running deployments;
    * leave it 0 under `Trigger.AvailableNow` (armed timeouts keep the
    * bounded run scheduling wake-up batches forever). */
  def sessionize(events: Dataset[Event], timeoutMs: Long = 0L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](timeoutConf) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (timeoutMs > 0 && state.hasTimedOut) {
            val s = state.getOption.getOrElse(SessionState(0, 0L))
            state.remove()
            SessionOut(user, s.n, s.totalE2 / 100.0, closed = true)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0, 0L))
            var n = prev.n
            var totalE2 = prev.totalE2
            // SQL round semantics (half away from zero), NOT JVM
            // math.round (half toward +inf: math.round(-2.5) == -2) —
            // the batch twins and the w1/w8 oracles round each event
            // with SQL round(value*100), and negative half-cent values
            // must land on the same cent here. BigDecimal-from-toString
            // + HALF_UP is exactly Spark's Round eval for doubles.
            // Non-finite values fail LOUDLY with the value named: the
            // ANSI batch twin's round(value*100).cast("long") throws on
            // NaN/Infinity too, and math.round's old silent 0 /
            // Long.MaxValue would corrupt the session total; toLongExact
            // gives the same loud failure on cent overflow.
            rows.foreach { e =>
              n += 1
              val cents = e.value * 100
              if (cents.isNaN || cents.isInfinity)
                throw new ArithmeticException(
                  s"sessionize: non-finite event value ${e.value} for " +
                    s"user $user cannot round to cents (the ANSI batch " +
                    "twin rejects the same input)")
              totalE2 += BigDecimal(cents)
                .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
            }
            state.update(SessionState(n, totalE2))
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            SessionOut(user, n, totalE2 / 100.0, closed = false)
          }
      }
  }

  case class Keyed(key: String, seq: Long, payload: String)

  /** Streaming keep-first dedup on an arbitrary key — the streaming
    * form of the reference's `ON CONFLICT (abn) DO NOTHING` sink
    * (SURVEY §2 S-2/J-5): flatMapGroupsWithState keeps a seen-marker
    * per key and emits only each key's first arrival across ALL
    * micro-batches (dropDuplicates would re-admit a key once its state
    * ages out; this never does while state lives). Within a micro-batch
    * the groupByKey shuffle gives NO intra-group ordering, so "first"
    * needs an explicit arrival sequence: the lowest `seq` (Kafka
    * offset, ingest timestamp, file+row index) wins, deterministically.
    * State is one boolean per key — at 100 TB bound it with a key-space
    * partition or TTL policy. */
  def dedupKeepFirst(rows: Dataset[Keyed]): Dataset[Keyed] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, Keyed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[Keyed], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(it.minBy(_.seq))
          }
      }
  }

  /** Watermarked stream-stream interval join: pair each left event with
    * the right events of the same key whose timestamp falls in
    * `[left.ts - beforeSec, left.ts + afterSec]`. Watermarks on BOTH
    * sides plus the two-sided time bound are what let the engine evict
    * buffered rows — without them a stream-stream join's state grows
    * unboundedly; with them state is O(key-rate × window), the only
    * shape that survives an always-on 100 TB/day ingest. Right columns
    * (except the key) are emitted with an `r_` prefix. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   watermark: String, beforeSec: Long, afterSec: Long,
                   tsCol: String = "ts"): DataFrame = {
    val clash = right.columns.filterNot(_ == key).map("r_" + _).toSet
      .intersect(left.columns.toSet)
    require(clash.isEmpty, s"left columns collide with prefixed right columns: $clash")
    // mid-fold collision (the RangeJoin._r rule): renaming c -> r_c
    // while the right side already carries r_c silently duplicates the
    // name, and the later rename of the original r_c hits both copies
    val midair = right.columns.filterNot(_ == key)
      .filter(c => right.columns.contains("r_" + c)).toSet
    require(midair.isEmpty,
      s"right side carries both $midair and their r_-prefixed names — " +
        "rename one of each pair")
    val l = left.withWatermark(tsCol, watermark)
    val r0 = right.withWatermark(tsCol, watermark)
    val r = r0.columns.foldLeft(r0) { (df, c) =>
      if (c == key) df else df.withColumnRenamed(c, s"r_$c")
    }
    l.join(r,
      l(key) === r(key) &&
        col(s"r_$tsCol") >= col(tsCol) - expr(s"interval $beforeSec seconds") &&
        col(s"r_$tsCol") <= col(tsCol) + expr(s"interval $afterSec seconds"))
      .drop(r(key))
  }

  /** Drive a streaming query over whatever is in `inputDir` right now
    * into an in-memory table; returns after the data is processed. */
  def runToMemory(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
                  inputDir: String, queryName: String,
                  build: DataFrame => DataFrame, outputMode: OutputMode): Unit = {
    val q = build(spark.readStream.schema(schema).parquet(inputDir))
      .writeStream.format("memory").queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
