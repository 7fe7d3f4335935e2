package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the payload of the most
  * recent right row with the same key and `rightTs <= leftTs`
  * (inclusive), or nulls when no such row exists.
  *
  * The temporal-enrichment operator every event pipeline needs (join a
  * click stream to the latest prior profile/price/state row); neither
  * the reference (point-in-time joins are absent from its scripts
  * directory) nor Spark has it natively.
  *
  * Implementation is the union-merge formulation, NOT an inequality
  * join: tag both sides, sort each key's timeline once, and fill
  * payloads forward with `last(_, ignoreNulls)` over a running row
  * frame. One shuffle on the key, O(n log n) per partition, no
  * candidate-pair blowup — an inequality theta-join would be a
  * BroadcastNestedLoop / cartesian in Spark and O(|L|·|R|) per key.
  * At 100 TB this is the same plan a SQL engine's ASOF JOIN physical
  * operator builds internally (sort-merge on (key, ts)); skewed keys
  * ride on AQE like any other single-shuffle sort.
  *
  * Requirements: `(keys, tsCol)` is unique on `right` (pre-aggregate
  * otherwise — ties on the right would make "the" latest row
  * ambiguous), and payload columns are non-null on right rows (the
  * null/non-null pattern is what forward-fill keys on; `fillMarker`
  * below removes the caveat for genuinely-nullable payloads).
  */
object AsOfJoin {

  /** Backward-inclusive as-of join.
    *
    * @param left     point-query side; all its columns survive
    * @param right    timeline side: `keys ++ tsCol ++ payload` columns
    * @param keys     equi-join key columns (present on both sides)
    * @param tsCol    ordering column name (present on both sides; any
    *                 orderable type — long nanos, timestamp, date)
    * @param asofTsAs output name for the matched right timestamp
    * @return left columns + asofTsAs + right payload columns, nulls
    *         where a left row precedes every right row of its key
    */
  /** @param tolerance max |leftTs - rightTs| (in the ts column's units,
    *                   numeric ts) for a match to count — a fill further
    *                   away reverts to nulls. None = unbounded. The
    *                   guard every production point-in-time join wants:
    *                   a year-stale profile row should NOT silently
    *                   enrich today's click. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, asofTsAs: String = "asof_ts",
               tolerance: Option[Long] = None): DataFrame =
    join(left, right, keys, tsCol, asofTsAs, forwardDir = false, tolerance)

  /** Forward-inclusive as-of join: the EARLIEST right row with
    * `rightTs >= leftTs` — the mirror image (next scheduled event,
    * following price tick). Same single-shuffle union-merge, timeline
    * walked in descending order. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              tsCol: String, asofTsAs: String = "asof_ts",
              tolerance: Option[Long] = None): DataFrame =
    join(left, right, keys, tsCol, asofTsAs, forwardDir = true, tolerance)

  private def join(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, asofTsAs: String, forwardDir: Boolean,
                   tolerance: Option[Long]): DataFrame = {
    val payload = right.columns.filterNot(keys.contains).filterNot(_ == tsCol).toSeq
    val leftCols = left.columns.filterNot(keys.contains).filterNot(_ == tsCol).toSeq
    val clash = leftCols.toSet.intersect(payload.toSet + asofTsAs)
    require(clash.isEmpty,
      s"left/right column collision would make the output ambiguous: $clash")
    // the marker name must also be fresh on the RIGHT side: a payload
    // column named asofTsAs would give the fill struct two fields of
    // one name (ambiguous __filled.<name> resolution), and asofTsAs
    // equal to tsCol or a key duplicates an output column name
    require(!payload.contains(asofTsAs) && asofTsAs != tsCol &&
        !keys.contains(asofTsAs),
      s"asofTsAs '$asofTsAs' collides with a right payload, key, or the " +
        "ts column — pass a fresh marker name")
    // the internal working names must be fresh too: a LEFT column named
    // __filled would be silently REPLACED by the fill struct's
    // withColumn and re-emitted under the user's name (silent
    // corruption, unlike __side/__fill whose collisions at least fail
    // loudly as duplicate attributes)
    val reserved = Set("__side", "__fill", "__filled")
    val reservedClash = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(reservedClash.isEmpty,
      s"column names $reservedClash are reserved by the as-of join's " +
        "internal layout — rename them")
    // SQL join semantics: a null key or null timestamp on the right can
    // never satisfy `l.key = r.key AND l.ts >= r.ts` — window
    // partitioning would otherwise group nulls together and "match" them
    val rightClean = (keys :+ tsCol).foldLeft(right)((df, c) => df.filter(col(c).isNotNull))

    // the marker column carries the right row's ts: non-null exactly on
    // right rows, so last(ignoreNulls) fills every payload from the
    // same (latest) right row even if a payload value is legitimately
    // null there (struct fill = atomic row fill)
    val rightTagged = rightClean.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__side"),
        struct(col(tsCol).as(asofTsAs) +: payload.map(col): _*).as("__fill")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftTagged = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__side"),
        lit(null).cast(rightTagged.schema("__fill").dataType).as("__fill")) ++
        leftCols.map(col): _*)

    // at equal ts the right row sorts first (side 0 < 1) → the bound is
    // inclusive in either direction; ties among left rows are harmless
    // (their __fill is null, so frame order between them cannot change
    // the fill). Backward walks the timeline ascending (latest earlier
    // right row wins); forward walks it descending (earliest later one).
    // Nulls-FIRST in both directions: a null-ts left row must see no
    // right rows in its frame (SQL comparison with null matches nothing).
    val tsOrder = if (forwardDir) col(tsCol).desc_nulls_first else col(tsCol).asc_nulls_first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightTagged.unionByName(leftTagged)
      .withColumn("__filled", last(col("__fill"), ignoreNulls = true).over(w))
    // tolerance: a match further than `tol` ts-units away reverts to
    // the no-match (all-null) fill, atomically at the struct level
    val bounded = tolerance.fold(filled) { tol =>
      val gap =
        if (forwardDir) col(s"__filled.$asofTsAs") - col(tsCol)
        else col(tsCol) - col(s"__filled.$asofTsAs")
      filled.withColumn("__filled",
        when(col("__filled").isNotNull && gap <= tol, col("__filled")))
    }
    bounded
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++ Seq(col(tsCol)) ++ leftCols.map(col) ++
          (asofTsAs +: payload).map(p => col(s"__filled.$p").as(p)): _*)
  }
}
