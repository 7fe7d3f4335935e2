package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Per-bucket frequency cap for LSH candidate generation.
  *
  * Every banded candidate generator here (minhash bands, simhash
  * slices, sign-LSH buckets) turns co-bucketed ids into pairs with an
  * equi-self-join: n members in one (table, bucket) key produce O(n²)
  * pair rows through a SINGLE shuffle key. On a benign corpus n is
  * ~N/2^bits and the join is the cheap scale path; on a degenerate
  * corpus region (boilerplate mass, all-zero embeddings, spam clones)
  * one bucket can hold O(N) members and the self-join degrades toward
  * its own cross product — AQE's skew splitting rebalances the
  * post-shuffle partitions but cannot reduce the pair count itself.
  * (The reference's trgm index serves the same role of BOUNDED
  * candidate retrieval — `sql/schema.sql:52-71`.)
  *
  * The cap bounds that fan-out at the only place it can be bounded —
  * bucket membership BEFORE the join: keep the `cap` members with the
  * smallest deterministic hash, so a bucket contributes at most
  * cap² (symmetric pairing) or n×cap (query-side-uncapped) pair rows.
  *
  * Recall contract: the kept subset is ordered by
  * `hash64(bucketCols ‖ id)` — the order differs PER BUCKET (and hence
  * per LSH table), so a member evicted from a hot bucket in one table
  * is, with independent probability, kept in its bucket in another
  * table: OR-amplification (an extra table) compensates the recall the
  * cap costs. A pair is lost only when every shared bucket evicts one
  * of its endpoints. DedupSpec/VectorsSpec measure the capped-vs-
  * uncapped recall; with `cap >= max bucket size` the result is
  * identical to uncapped.
  *
  * Determinism: the hash order is a pure function of (bucket key, id),
  * so the selection is reproducible across runs, partitionings, and
  * engines — the DuckDB oracles replicate it exactly (row_number over
  * the same md5-derived hash64).
  *
  * Plan shape: `row_number <= cap` over the bucket window becomes a
  * WindowGroupLimit — map tasks keep only `cap` candidates per bucket
  * BEFORE the window shuffle, so even the capping pass never moves a
  * hot bucket's full membership to one task (PlanSpec pins it).
  */
object BucketCap {

  /** The deterministic per-bucket ordering key (exposed for oracle
    * construction): hash64 of the ':'-joined bucket columns and id. */
  def orderKey(bucketCols: Seq[Column], id: Column): Column =
    Hashing.hash64(concat_ws(":", (bucketCols :+ id).map(_.cast("string")): _*))

  /** Keep at most `cap` members per bucket — the `cap` smallest by
    * [[orderKey]], ties broken on id. All other columns pass through. */
  def capMembers(df: DataFrame, bucketCols: Seq[String], idCol: String,
                 cap: Int): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    val bcols = bucketCols.map(col)
    val w = Window.partitionBy(bcols: _*)
      .orderBy(orderKey(bcols, col(idCol)).asc, col(idCol).asc)
    df.withColumn("__bucket_rank", row_number().over(w))
      .filter(col("__bucket_rank") <= cap)
      .drop("__bucket_rank")
  }

  /** DuckDB twin of [[capMembers]]'s selection, as a SQL snippet
    * builder: wraps `src` (a query yielding the banded rows) so only
    * the `cap` smallest-hash members per bucket survive. */
  def sqlCapped(src: String, bucketCols: Seq[String], idCol: String,
                cap: Int): String = {
    // concat_ws both sides: Spark and DuckDB agree on separator
    // placement (and both skip NULL args, though no use site has them)
    val keyParts = (bucketCols :+ idCol)
      .map(c => s"CAST($c AS VARCHAR)").mkString(", ")
    val h = Hashing.sql.hash64(s"concat_ws(':', $keyParts)")
    s"""SELECT * EXCLUDE (__bucket_rank) FROM (
       |  SELECT *, row_number() OVER (PARTITION BY ${bucketCols.mkString(", ")}
       |    ORDER BY $h ASC, $idCol ASC) AS __bucket_rank
       |  FROM ($src)) WHERE __bucket_rank <= $cap""".stripMargin
  }
}
