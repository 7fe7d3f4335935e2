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
    * @return (keyCol, bucket, value, is_gap) — one row per key per
    *         grid step from the key's first to last observation;
    *         `value` carries the latest observation at-or-before the
    *         bucket (within a bucket, the greatest (ts, value) wins —
    *         deterministic even under timestamp ties), `is_gap` marks
    *         buckets with no observation of their own
    */
  def forwardFill(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, step: Long): DataFrame = {
    require(step > 0, "step must be positive")
    // FLOOR division, not DIV's truncation-toward-zero: a pre-1970
    // timestamp (ts < 0) must land in the bucket below zero, matching
    // the DuckDB oracle's `//` and the repo's time-bucketing idiom
    // (Tables.epochMicros, RangeJoin.withFloorDiv) — bare DIV would
    // make the zero bucket double-width across the epoch boundary
    val ev = df.select(col(keyCol),
      expr(s"($tsCol - pmod($tsCol, ${step}L)) DIV ${step}L").as("bucket"),
      col(tsCol).as("__ts"), col(valueCol).as("__v"))
    val obs = ev.groupBy(col(keyCol), col("bucket"))
      .agg(max(struct(col("__ts"), col("__v"))).getField("__v").as("obs_value"))
    val grid = ev.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col(keyCol), explode(sequence(col("mn"), col("mx"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        last(col("obs_value"), ignoreNulls = true).over(w).as("value"),
        col("obs_value").isNull.as("is_gap"))
  }
}
