package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialize a small intermediate ONCE for multiple lazy consumers
  * (the pair-list pattern: a candidate join feeding both a semi-join
  * and a verify join — without materialization Catalyst recomputes the
  * join per consumer, measured 3× on every incremental dedup query).
  *
  * Master-aware because the fastest local mechanism is the wrong
  * cluster mechanism:
  *  - local master: eager `localCheckpoint` — blocks live in the one
  *    JVM that is also the driver, so "executor loss without driver
  *    loss" cannot happen and non-recomputability costs nothing;
  *    blocks release when the plan's RDD is GC'd.
  *  - cluster master: `persist(MEMORY_AND_DISK)` + a `count()` to
  *    force population — blocks are RECOMPUTABLE on executor loss
  *    (dynamic allocation, preemption) and evictable under memory
  *    pressure, at the price of keeping the lineage. Callers that
  *    hold the frame long-term should `unpersist()` after the last
  *    consumer runs; one-shot query paths can leave eviction to LRU.
  */
object Materialize {
  def once(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.isLocal) df.localCheckpoint(true)
    else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    }
}
