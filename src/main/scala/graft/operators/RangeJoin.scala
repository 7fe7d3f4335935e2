package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bucket decomposition.
  *
  * Joining points `p` to intervals `[lo, hi)` with a raw inequality
  * predicate gives Spark no equi-key, so the planner falls back to
  * BroadcastNestedLoopJoin — O(|P|·|I|) compares, a non-starter when
  * both sides are large. The standard fix (the same decomposition
  * Spark's own range-join research builds on): pick a bucket width W,
  * explode every interval onto the buckets it covers, map each point to
  * its single bucket, hash-join on the bucket id, and re-check the
  * exact predicate. Cost drops to O(|P| + |I|·(span/W)) join rows,
  * partitioned by bucket — shuffle-parallel and AQE-skew-handled like
  * any equi-join.
  *
  * Each qualifying (point, interval) pair appears EXACTLY once — the
  * point lives in one bucket and an interval's exploded bucket ids are
  * distinct — so no post-join dedup is needed.
  *
  * Bounds are inclusive-lo / exclusive-hi over LONG columns: callers
  * scale decimals/doubles to integers first (e.g. cents), which also
  * makes the bucket-edge arithmetic exact.
  */
object RangeJoin {

  /** @param points    fact side carrying `pointCol: long`
    * @param intervals dim side carrying `loCol`/`hiCol: long`, lo <= hi
    * @param width     bucket width; tune so a typical interval spans a
    *                  handful of buckets (span/W join-row blowup vs
    *                  per-bucket selectivity)
    */
  /** Exact floor division in long arithmetic: subtracting the
    * (non-negative) pmod lands exactly on the bucket edge, and integral
    * DIV of an exact multiple is exact for either truncation direction —
    * `floor(x / W)` in doubles would drift above 2^53. */
  private def withFloorDiv(df: DataFrame, out: String, x: Column, w: Long): DataFrame =
    df.withColumn("__fd", x - pmod(x, lit(w)))
      .withColumn(out, expr(s"__fd DIV $w"))
      .drop("__fd")

  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      width: Long, maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(width > 0, "bucket width must be positive")
    // [lo, hi) covers buckets floor(lo/W) .. floor((hi-1)/W); empty
    // intervals (hi <= lo) match nothing and are dropped up front
    val bounded = withFloorDiv(withFloorDiv(
      intervals.filter(col(hiCol) > col(loCol)),
      "__blo", col(loCol), width), "__bhi", col(hiCol) - 1, width)
    // a sentinel interval (hi = Long.MaxValue) would ask sequence() for
    // trillions of elements — fail with a usable message instead. The
    // guard lives INSIDE the sequence bound so column pruning cannot
    // optimize it away.
    val guardedHi = when(col("__bhi") - col("__blo") >= maxBucketsPerInterval,
        raise_error(concat(
          lit(s"interval spans more than $maxBucketsPerInterval buckets at " +
            s"width $width — widen the bucket or clamp the interval: lo="),
          col(loCol), lit(" hi="), col(hiCol))).cast("long"))
      .otherwise(col("__bhi"))
    val exploded = bounded
      .withColumn("__bucket", explode(sequence(col("__blo"), guardedHi)))
      .drop("__blo", "__bhi")
    withFloorDiv(points, "__bucket", col(pointCol), width)
      .join(exploded, "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
