package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: project an irregular per-key event
  * stream onto a fixed-step grid and forward-fill the last observed
  * value into the gaps — what a feature pipeline does before joining
  * sensor/price/activity series at aligned timestamps.
  *
  * Scale shape: per key, one partial-aggregated pass buckets the
  * observations and one tiny aggregate finds the span; the grid is
  * `explode(sequence(min, max))` — generated, never stored — and the
  * fill is a single running window per key. Grid length per key is
  * span/step (caller-bounded); uniform across keys, so the key shuffle
  * has no skew amplification.
  */
object GapFill {

  /** @param tsCol   numeric timestamp column (e.g. epoch nanos)
    * @param step    grid step in `tsCol` units
    * @param maxBucketsPerKey span guard: one corrupt event (an epoch-0
    *                 sentinel, an un-normalized nanos value) would
    *                 otherwise stretch a key's grid to millions of
    *                 filler rows through `sequence` — fail with a
    *                 usable message instead (the
    *                 [[RangeJoin.pointInInterval]] guard, same class)
    * @return (keyCol, bucket, value, is_gap) — one row per key per
    *         grid step from the key's first to last observation;
    *         `value` carries the latest observation at-or-before the
    *         bucket (within a bucket, the greatest (ts, value) wins —
    *         deterministic even under timestamp ties), `is_gap` marks
    *         buckets with no observation of their own. A NULL-valued
    *         event is not an observation: it never becomes `value`
    *         (the within-bucket max ignores it — in both engines,
    *         which disagree on null-field struct ordering, so
    *         including it would break oracle parity at timestamp
    *         ties), and a bucket whose only events carry null values
    *         is a gap; it still anchors the key's grid span.
    */
  def forwardFill(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, step: Long,
                  maxBucketsPerKey: Long = 1L << 20): DataFrame = {
    require(step > 0, "step must be positive")
    // FLOOR division, not DIV's truncation-toward-zero: a pre-1970
    // timestamp (ts < 0) must land in the bucket below zero, matching
    // the DuckDB oracle's `//` and the repo's time-bucketing idiom —
    // shared with RangeJoin.withFloorDiv (Column arguments: no raw
    // identifier splicing into expr, no ANSI overflow on sentinel ts)
    val ev = RangeJoin.withFloorDiv(
      df.select(col(keyCol), col(tsCol).as("__ts"), col(valueCol).as("__v")),
      "bucket", col("__ts"), step)
    val obs = ev.groupBy(col(keyCol), col("bucket"))
      .agg(max(when(col("__v").isNotNull, struct(col("__ts"), col("__v"))))
        .getField("__v").as("obs_value"))
    val guardedMx = when(col("mx") - col("mn") >= maxBucketsPerKey,
        raise_error(concat(
          lit(s"key's observation span exceeds $maxBucketsPerKey grid steps " +
            s"at step $step (corrupt sentinel timestamp?) — widen the step " +
            "or clean the key: "), col(keyCol).cast("string")))
          .cast("long"))
      .otherwise(col("mx"))
    val grid = ev.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col(keyCol), explode(sequence(col("mn"), guardedMx)).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        last(col("obs_value"), ignoreNulls = true).over(w).as("value"),
        col("obs_value").isNull.as("is_gap"))
  }
}
