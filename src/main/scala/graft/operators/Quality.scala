package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A-1..A-5: the reference's t4 data-quality suite
  * (scripts/run_quality_checks.py) as reusable DataFrame operators —
  * production assertions turned into composable relational checks. All
  * are single-pass partial-aggregations (map-side combine), so each
  * check is one scan regardless of table size.
  */
object Quality {

  /** A-1: labeled row counts for a set of tables. */
  def rowCounts(tables: Seq[(String, DataFrame)]): DataFrame = {
    // an empty reduce throws an opaque UnsupportedOperationException —
    // callers assembling the list dynamically deserve a named error
    require(tables.nonEmpty, "rowCounts needs at least one table")
    tables.map { case (name, df) =>
      df.agg(count(lit(1)).as("n")).select(lit(name).as("tbl"), col("n"))
    }.reduce(_ unionByName _)
  }

  /** A-3: NULL count per critical column, one pass. */
  def nullCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("total"),
      cols.map(c => count(when(col(c).isNull, 1)).as(s"null_$c")): _*)

  /** A-2: arbitrary labeled conditional counts, one pass. */
  def conditionalCounts(df: DataFrame, conds: Seq[(String, Column)]): DataFrame =
    df.agg(count(lit(1)).as("total"),
      conds.map { case (name, c) => count(when(c, 1)).as(name) }: _*)

  /** A-4: value distribution of a column (e.g. merged_confidence). */
  def distribution(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("n")).orderBy(col(c))

  /** A-5: keys violating uniqueness. */
  def duplicateKeys(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).orderBy(col(key))
}
