package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling operators for hot keys at scale (the brief's
  * "salting for skew"): a single pathological key (one giant customer,
  * one universal token) funnels its entire group through one reducer —
  * salting splits it across `saltBuckets` reducers and re-merges.
  */
object Skew {

  /** Two-stage salted aggregation: group by (key, salt) with partial
    * aggregates, then re-aggregate by key. The hot key's rows land in
    * `saltBuckets` reducers in stage 1; stage 2 only merges
    * `saltBuckets` pre-aggregated rows per key.
    *
    * Scope note: for sum/count specifically, Spark's map-side partial
    * HashAggregate already bounds reducer fan-in to one row per
    * (key, map partition) — this two-stage shape is the declared,
    * oracle-gated form of the salting PATTERN, which pays off for
    * aggregates without a partial merge (collect_list, exact distinct)
    * or when the hot key defeats map-side combine (a hash-aggregate
    * fallback to sort under memory pressure).
    *
    * The salt is a DETERMINISTIC hash of the full row — never
    * monotonically_increasing_id or rand, whose values change when a
    * map task is recomputed after a fetch failure: rows would migrate
    * between (key, salt) buckets mid-shuffle and be double-counted or
    * lost.
    *
    * KNOWN LIMITATION — clone-mass skew is NOT mitigated here:
    * identical duplicate rows hash to ONE salt (they cannot be told
    * apart by any deterministic row function), so a hot key whose mass
    * is exact clones — the dominant skew shape in a dedup-oriented
    * corpus — still funnels through a single (key, salt) reducer. The
    * retry-safe fix for that shape is [[cloneSaltedSumCount]]:
    * exact-dedup the clones first with a count column, then salt the
    * now-distinct weighted rows. Heterogeneous hot-key values spread
    * fine. Map-typed columns are rejected loudly at operator-build
    * time — `hash()` has no canonical order for map entries and
    * Spark's analyzer rejects it with a generic message far from this
    * call site. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    rejectMapColumns(df, "saltedSumCount")
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
    partial.groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"), sum(col("_pcnt")).as("n"))
  }

  /** The clone-mass cure [[saltedSumCount]]'s KNOWN LIMITATION points
    * at, as a declared operator: when the hot key's mass is EXACT
    * CLONES, no deterministic per-row salt can split it — so collapse
    * the clones BEFORE any key-shaped shuffle. Stage 0 groups by every
    * column with a count: Spark's map-side partial HashAggregate
    * collapses clones inside each input partition, so each reducer
    * receives at most one row per (distinct value, map partition) —
    * the clone mass crosses the wire as #partitions weighted rows, not
    * N payload rows. Stages 1-2 are [[saltedSumCount]]'s two-stage
    * merge over the now-distinct rows, weighted by the carried count
    * (sum(v·cnt), sum(cnt)) — and distinct rows DO spread across
    * salts, which is exactly what the clone rows could not do.
    *
    * Same determinism contract as [[saltedSumCount]]: the salt hashes
    * the full (now-distinct) row, never a random or monotonic id, so a
    * recomputed map task re-derives identical buckets. Exactness: the
    * weighted sum reorders FP addition, so gate it with an
    * integral-valued measure (the x5 query sums the integral `dv`
    * column of ScaleQueries.skewFacts) or a decimal column. */
  def cloneSaltedSumCount(df: DataFrame, key: String, valueCol: String,
                          saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    rejectMapColumns(df, "cloneSaltedSumCount")
    val weighted = df.groupBy(df.columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("_cnt"))
    val salted = weighted.withColumn("_salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol) * col("_cnt")).as("_psum"),
        sum(col("_cnt")).as("_pcnt"))
    partial.groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"), sum(col("_pcnt")).as("n"))
  }

  /** Salted join of a skewed fact side against a small dimension:
    * replicate each dimension row `saltBuckets` times (explode), salt
    * the fact side's key deterministically (the [[saltedSumCount]]
    * retry-safety rule), equi-join on (key, salt) — the hot key's rows
    * spread over `saltBuckets` reducers instead of one.
    *
    * No broadcast hint: salting only mitigates anything when the join
    * SHUFFLES the fact side by key (sort-merge / shuffle-hash — a
    * broadcast hash join never funnels a key through one reducer, so
    * a forced broadcast would make the whole salt apparatus a no-op
    * that merely multiplies the build side by `saltBuckets`). AQE
    * still broadcasts when the replicated dimension is small enough —
    * and then the salt costs only the explode — but the operator's
    * reason to exist is the case where it is not.
    *
    * Sizing `saltBuckets` (measured at x1000, SCALE.md "salt width is
    * a measured knob"): the curve is NON-MONOTONE. Too narrow leaves
    * giant per-bucket sorts AND gambles on partition assignment (8
    * buckets into 162 partitions: max task varied 143-222 s across
    * runs); too wide re-creates the pile-up by balls-in-bins collision
    * (128 buckets into 162 partitions measured WORSE than 32) while
    * multiplying the replicated dim and its GC. Keep the bucket count
    * comfortably below `spark.sql.shuffle.partitions` — the measured
    * optimum at 162 partitions was 32, i.e. roughly partitions/5. The
    * salt moves the straggler only: per-task sort spill is governed by
    * total fact bytes per task, not by the hot key. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    rejectMapColumns(fact, "saltedJoin")
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** The full-row salt hashes every column; `hash()` is undefined over
    * MapType (no canonical entry order), and Spark's own analyzer check
    * is RECURSIVE — a map nested inside a struct or array fails it too.
    * Mirror the recursion here so the rejection happens at
    * operator-build time with the operator's name, never as a deep
    * Catalyst error. */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => containsMap(f.dataType))
      case a: ArrayType => containsMap(a.elementType)
      case _ => false
    }
  }

  private def rejectMapColumns(df: DataFrame, op: String): Unit = {
    val maps = df.schema.fields.collect {
      case f if containsMap(f.dataType) => f.name
    }
    require(maps.isEmpty,
      s"$op salts by hashing ALL columns, and hash() is undefined over " +
        s"map-typed data (columns ${maps.mkString("[", ", ", "]")} contain " +
        "maps, possibly nested) — drop or serialize them (to_json / " +
        "map_entries+sort) before salting")
  }
}
