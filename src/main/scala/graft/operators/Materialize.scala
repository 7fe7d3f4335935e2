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
  *  - cluster master: RDD-level `persist(MEMORY_AND_DISK)` + a
  *    `count()` to force population — blocks are RECOMPUTABLE on
  *    executor loss (dynamic allocation, preemption), evictable under
  *    memory pressure, and RELEASED by the ContextCleaner when the
  *    plan becomes unreachable on the driver. `DataFrame.persist`
  *    would be wrong here: it registers the plan in the SQL
  *    CacheManager, which holds a strong reference until an explicit
  *    `unpersist()` that no lazy-consumer call site can issue — a
  *    perpetual-ingest driver would pin one cached pair list per
  *    micro-batch, forever. The RDD round-trip costs a row
  *    encode/decode, fine for the narrow pair lists this serves.
  */
object Materialize {
  def once(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.isLocal) df.localCheckpoint(true)
    else clusterMaterialize(df)

  /** Lazy variant of [[once]]: marks the frame for one-shot
    * materialization at its FIRST action instead of running a job now —
    * for loop bodies whose very next step is itself an action (the
    * star-contraction round counts the frame immediately), where an
    * eager call would pay one extra job per iteration. Same
    * master-awareness: local gets `localCheckpoint(false)`; a cluster
    * gets a recomputable `persist(MEMORY_AND_DISK)` that populates on
    * first touch and survives executor loss. */
  def lazily(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.isLocal) df.localCheckpoint(false)
    else clusterLazily(df)

  /** The cluster branch of [[lazily]] — exposed for its spec (tests
    * run on a local master, same as [[clusterMaterialize]]). */
  private[graft] def clusterLazily(df: DataFrame): DataFrame = {
    val rows = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    df.sparkSession.createDataFrame(rows, df.schema)
  }

  /** The cluster branch of [[once]], callable directly by its spec
    * (tests run on a local master, where [[once]] would take the
    * localCheckpoint fast path). */
  private[graft] def clusterMaterialize(df: DataFrame): DataFrame = {
    val rows = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    rows.count()
    df.sparkSession.createDataFrame(rows, df.schema)
  }
}
