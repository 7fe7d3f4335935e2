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

  /** Hyperplane-family offset for hot-bucket refinement signs: far
    * above any base banding family's absolute table index, so the
    * extension signs are fresh evidence the base bucket has not
    * already conditioned on. ONE constant shared by every refining
    * operator AND its DuckDB oracle twin.
    *
    * "Independent" is NOT guaranteed by the offset alone: a
    * hyperplane's components depend on its plane index ONLY modulo
    * 1997 ([[graft.functions.Vectors.hyperplaneComponent]] — 1997 is
    * the component modulus), so the extension planes at indexes
    * `(RefineFamilyOffset+t)·refineBits + j` recur against base
    * planes `t·bits + j` with period 1997. Every declared geometry is
    * far from a collision, but the public API admits configs that are
    * not (e.g. bits=64 with 26+ tables reaches the extension residue
    * class) — [[requireIndependentFamilies]] asserts disjointness at
    * each refine-capable call site instead of trusting the offset. */
  val RefineFamilyOffset = 65536

  /** Assert the base banding family and the refinement extension
    * family share NO hyperplane (plane indexes disjoint modulo 1997,
    * the component modulus). A collision would make extension signs a
    * deterministic function of the base bucket: hot buckets of
    * non-clone data would refuse to split, and the flat last-resort
    * cap would silently drop real pairs with no OR-amplification
    * rescue — the exact failure refinement exists to prevent. Cheap
    * (a few hundred Set inserts), called once per query build. */
  def requireIndependentFamilies(baseBits: Int, baseTables: Int,
                                 refineBits: Int, refineTables: Int): Unit = {
    val base = (for (t <- 0 until baseTables; j <- 0 until baseBits)
      yield ((t.toLong * baseBits + j) % 1997L)).toSet
    val ext = (for (t <- 0 until refineTables; j <- 0 until refineBits)
      yield (((RefineFamilyOffset.toLong + t) * refineBits + j) % 1997L)).toSet
    require((base & ext).isEmpty,
      s"refinement hyperplane family (refineBits=$refineBits, " +
        s"tables=$refineTables at offset $RefineFamilyOffset) overlaps " +
        s"the base family (bits=$baseBits, tables=$baseTables) modulo " +
        "1997 — extension signs would not be independent evidence; " +
        "change bits/tables or the refinement width")
  }

  /** Occupancy-conditional bucket refinement — the step BETWEEN the
    * geometry rule and the frequency cap.
    *
    * A flat cap is lossy exactly where the corpus is densest: a
    * bucket of m >> cap members keeps cap of them, and a true pair
    * survives only if one endpoint is kept in SOME shared bucket —
    * P(lost) ≈ (1−cap/m)^(2·tables), ~1 for the monster buckets
    * (measured at x100: cap=64 pair recall 0.794, the loss entirely
    * in the occupancy tail). Refinement instead applies the
    * scaled-bits idea LOCALLY: members of a bucket OVER the cap are
    * re-keyed by `xbCol` — extension sign bits from an independent
    * hyperplane family ([[RefineFamilyOffset]]) computed per table —
    * so the hot bucket splits into ~2^xbits sub-buckets. A true
    * near-dup pair agrees on the extension signs with high
    * probability PER TABLE, and the per-table families are
    * independent, so OR-amplification across tables recovers what a
    * single split loses. Buckets at or under the cap keep sub = −1:
    * refinement touches ONLY the tail the cap would otherwise drop.
    *
    * The hot-bucket list is aggregated map-side (count per bucket
    * key) and joined back UNHINTED: on skew-tail distributions the
    * over-cap set is tiny and AQE broadcasts it (the banded stream
    * never shuffles for the occupancy test), but its size is really
    * O(rows/cap) — an adversarial corpus where most buckets sit just
    * above cap would blow a FORCED broadcast through Spark's 8 GB
    * hard limit, where the unhinted plan degrades to a shuffle join
    * gracefully. The flat cap stays as the last
    * resort AFTER refinement (apply [[capMembers]] over
    * `bucketCols :+ "__sub"`): a bucket that refuses to split —
    * identical-vector clone mass agreeing on every extension sign —
    * is exactly the boilerplate case where dropping intra-clique
    * edges is intended (the asymmetric probe join keeps such cliques
    * CONNECTED for downstream clustering; DedupSpec pins it).
    */
  def splitHot(banded: DataFrame, bucketCols: Seq[String], xbCol: String,
               cap: Int): DataFrame = {
    val bcols = bucketCols.map(col)
    val hot = banded.groupBy(bcols: _*).agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") > cap)
      .select(bcols :+ lit(true).as("__hot"): _*)
    banded.join(hot, bucketCols, "left")
      .withColumn("__sub",
        when(col("__hot").isNotNull, col(xbCol)).otherwise(lit(-1L)))
      .drop("__hot", xbCol)
  }

  /** DuckDB twin of [[splitHot]]: wraps `src` (the banded rows, which
    * must already carry the extension column `xbCol`) so each row
    * gains `__sub` = xb inside over-cap buckets, −1 elsewhere. */
  def sqlSplitHot(src: String, bucketCols: Seq[String], xbCol: String,
                  cap: Int): String = {
    val on = bucketCols.map(c => s"s.$c = h.$c").mkString(" AND ")
    s"""SELECT s.* EXCLUDE ($xbCol),
       |  CASE WHEN h.__hot IS NOT NULL THEN s.$xbCol ELSE -1 END AS __sub
       |FROM ($src) s LEFT JOIN (
       |  SELECT ${bucketCols.mkString(", ")}, TRUE AS __hot
       |  FROM ($src) GROUP BY ${bucketCols.mkString(", ")}
       |  HAVING count(*) > $cap) h ON $on""".stripMargin
  }

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
