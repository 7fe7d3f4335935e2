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
    * `saltBuckets` pre-aggregated rows per key. Works for any algebraic
    * aggregate expressed as (partial, merge) column pairs. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
    partial.groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"), sum(col("_pcnt")).as("n"))
  }

  /** Salted join of a skewed fact side against a small dimension:
    * replicate each dimension row `saltBuckets` times (explode), salt
    * the fact side's key, equi-join on (key, salt) — the hot key's rows
    * spread over `saltBuckets` tasks instead of one. The dimension side
    * grows by the salt factor, so keep it broadcast-small. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(broadcast(replicatedDim), Seq(key, "_salt")).drop("_salt")
  }
}
