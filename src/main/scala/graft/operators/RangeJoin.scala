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
  private[operators] def withFloorDiv(df: DataFrame, out: String, x: Column, w: Long): DataFrame =
    df.withColumn("__fd",
        // a value within w of Long.MinValue (an "unbounded below"
        // sentinel) would overflow x - pmod under ANSI mode with a
        // generic ARITHMETIC_OVERFLOW — same usable-message treatment
        // as the hi-side sentinel guard in the explode below
        when(x < lit(Long.MinValue + w), raise_error(concat(
          lit(s"bound within $w of Long.MinValue (unbounded-below " +
            "sentinel?) — clamp it to the data's real range: "),
          x.cast("string"))).cast("long"))
          .otherwise(x - pmod(x, lit(w))))
      .withColumn(out, expr(s"__fd DIV $w"))
      .drop("__fd")

  /** Shared interval→bucket explode: floor-div both bounds, drop empty
    * intervals, and guard the span so a sentinel interval
    * (hi = Long.MaxValue) fails with a usable message instead of
    * asking sequence() for trillions of elements. The guard lives
    * INSIDE the sequence bound so column pruning cannot optimize it
    * away. */
  private def explodeBuckets(df: DataFrame, lo: String, hi: String,
                             width: Long, maxBuckets: Long): DataFrame = {
    val bounded = withFloorDiv(withFloorDiv(
      df.filter(col(hi) > col(lo)),
      "__blo", col(lo), width), "__bhi", col(hi) - 1, width)
    val guardedHi = when(col("__bhi") - col("__blo") >= maxBuckets,
        raise_error(concat(
          lit(s"interval spans more than $maxBuckets buckets at " +
            s"width $width — widen the bucket or clamp the interval: lo="),
          col(lo), lit(" hi="), col(hi))).cast("long"))
      .otherwise(col("__bhi"))
    bounded
      .withColumn("__bucket", explode(sequence(col("__blo"), guardedHi)))
      .drop("__blo", "__bhi")
  }

  /** The `_r`-suffix layout can silently produce duplicate attribute
    * names (left already carries `x_r`, or right carries both `x` and
    * `x_r` — withColumnRenamed duplicates silently in that case),
    * surfacing as AMBIGUOUS_REFERENCE far from the call site. Reject
    * the layout up front like [[pointInInterval]]'s shared-name
    * require. */
  private def requireSuffixSafe(left: DataFrame, right: DataFrame,
                                keys: Seq[String]): Unit = {
    // mid-fold collision: renaming c -> c_r while the right side
    // already carries c_r makes withColumnRenamed silently duplicate
    // the name (and the later rename of the original c_r then hits
    // both copies)
    val midair = right.columns.filterNot(keys.contains)
      .filter(c => right.columns.contains(c + "_r")).toSet
    require(midair.isEmpty,
      s"right side carries both $midair and their _r-suffixed names — " +
        "rename one of each pair")
    val renamed = right.columns.map(c => if (keys.contains(c)) c else c + "_r")
    val dup = renamed.diff(renamed.distinct).toSet
    require(dup.isEmpty,
      s"right columns collide after the _r suffix: $dup — rename one of each pair")
    val clash = left.columns.toSet.intersect(renamed.toSet) -- keys
    require(clash.isEmpty,
      s"left columns $clash collide with the right side's _r-suffixed " +
        "names — rename one side")
  }

  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      width: Long, maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(width > 0, "bucket width must be positive")
    // both sides keep all their columns through the bucket join
    // (unlike bandJoin/intervalOverlap, which suffix the right side) —
    // a shared name would make the exact re-check predicate ambiguous
    // at runtime, or silently emit duplicate output columns
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points/intervals share column names $shared — rename one side")
    // [lo, hi) covers buckets floor(lo/W) .. floor((hi-1)/W); empty
    // intervals (hi <= lo) match nothing and are dropped up front
    val exploded = explodeBuckets(intervals, loCol, hiCol, width,
      maxBucketsPerInterval)
    withFloorDiv(points, "__bucket", col(pointCol), width)
      .join(exploded, "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Band (tolerance) join: pairs (l, r) with equal `keys` and
    * |l.ts − r.ts| <= delta, over LONG time columns.
    *
    * Same decomposition idea as [[pointInInterval]] with bucket width =
    * delta: a qualifying pair's buckets differ by at most one, so the
    * left side explodes onto {b−1, b, b+1}, the right side keeps its
    * single bucket, and the hash join runs on (keys, bucket). The three
    * exploded bucket ids are distinct, so each qualifying pair surfaces
    * EXACTLY once — no post-join dedup. Shuffle volume is 3·|L| + |R|
    * slim rows, partitioned by (keys, bucket) like any equi-join (AQE
    * skew-splits hot buckets).
    *
    * Column layout: left columns keep their names, right columns are
    * suffixed `_r` (callers project before joining to keep the shuffle
    * slim).
    */
  def bandJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, delta: Long): DataFrame = {
    require(delta > 0, "band width must be positive")
    requireSuffixSafe(left, right, keys)
    val l = withFloorDiv(left, "__b0", col(tsCol), delta)
      .withColumn("__bucket", explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val r0 = right.columns.foldLeft(right)((df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, c + "_r"))
    val r = withFloorDiv(r0, "__bucket", col(tsCol + "_r"), delta)
    l.join(r, keys :+ "__bucket")
      .filter(abs(col(tsCol) - col(tsCol + "_r")) <= delta)
      .drop("__bucket")
  }

  /** Interval-overlap join: pairs of intervals `[l.lo, l.hi)` ×
    * `[r.lo, r.hi)` with `l.lo < r.hi AND r.lo < l.hi` (and equal
    * `keys`, if any).
    *
    * Both sides explode onto the buckets their interval covers (width
    * W), the join runs on (keys, bucket), and the overlap predicate is
    * re-checked exactly. Emit-once without a DISTINCT: a pair is kept
    * only in the bucket containing `greatest(l.lo, r.lo)` — for an
    * overlapping pair that value lies inside BOTH intervals, so exactly
    * one exploded bucket on each side matches it.
    *
    * Right columns are suffixed `_r`. Intervals are inclusive-lo /
    * exclusive-hi LONGs; W tunes the span/W explode factor exactly as in
    * [[pointInInterval]].
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      loCol: String, hiCol: String, width: Long,
                      maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(width > 0, "bucket width must be positive")
    requireSuffixSafe(left, right, keys)
    def expand(df: DataFrame, lo: String, hi: String): DataFrame =
      explodeBuckets(df, lo, hi, width, maxBucketsPerInterval)
    val l = expand(left, loCol, hiCol)
    val r0 = right.columns.foldLeft(right)((df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, c + "_r"))
    val r = expand(r0, loCol + "_r", hiCol + "_r")
    withFloorDiv(
      l.join(r, keys :+ "__bucket")
        .filter(col(loCol) < col(hiCol + "_r") && col(loCol + "_r") < col(hiCol)),
      "__anchor", greatest(col(loCol), col(loCol + "_r")), width)
      .filter(col("__anchor") === col("__bucket"))
      .drop("__bucket", "__anchor")
  }
}
