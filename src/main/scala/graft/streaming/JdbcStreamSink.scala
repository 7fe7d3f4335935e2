package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.JdbcUpsertSink

/** Streaming form of the reference's incremental load loop: micro-batches
  * land in the RDBMS through the insert-if-absent sink
  * ([[graft.sources.JdbcUpsertSink]], reference `ON CONFLICT (abn) DO
  * NOTHING` — scripts/extract_abr.py:57-66).
  *
  * Delivery semantics: Structured Streaming's foreachBatch is
  * at-least-once — a failed micro-batch replays. Insert-if-absent makes
  * the replay IDEMPOTENT per key, so the composition is effectively-once
  * for keyed rows without two-phase commit or sink-side transactions —
  * the same reason the reference can re-run its extract scripts safely.
  * Combine with [[EventStream.dedupKeepFirst]] upstream when
  * within-stream duplicate keys should be resolved deterministically
  * before they race at the database.
  */
object JdbcStreamSink {

  /** Start writing `stream` into `table` via batched insert-if-absent.
    * `stream` must be a streaming DataFrame containing `keyCol`. */
  def start(stream: DataFrame, url: String, table: String, keyCol: String,
            keySqlType: String = "VARCHAR(64)", batchSize: Int = 500,
            checkpointDir: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        JdbcUpsertSink.writeIfAbsent(batch, url, table, keyCol, keySqlType, batchSize)
      }
      .start()
}
