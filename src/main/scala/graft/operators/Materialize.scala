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
    * first touch and survives executor loss.
    *
    * ITERATIVE callers (a loop whose round N+1 is built on round N's
    * frame) should use [[lazilyReleasable]]/[[onceReleasable]] instead:
    * on a cluster, each round's persisted RDD is held live by the next
    * round's lineage, so without an explicit release storage grows
    * O(rounds × frame) — evictable under pressure but never freed. */
  def lazily(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.isLocal) df.localCheckpoint(false)
    else clusterLazily(df)

  /** A materialized frame plus an explicit storage release — the
    * iterative-loop contract. `release()` drops the round's cached
    * blocks (no-op on the local fast path, whose `localCheckpoint`
    * truncates lineage so prior rounds free themselves on GC); the
    * released frame stays RECOMPUTABLE — unpersist removes blocks, not
    * lineage — so executor-loss recovery replays the chain back to the
    * last truncation point. Call it only once every consumer of this
    * round's frame has run. */
  final class Handle private[Materialize] (
      val df: DataFrame,
      private[graft] val backing: Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]) {
    def release(): Unit = backing.foreach(_.unpersist(blocking = false))
  }

  /** [[lazily]] with a [[Handle]] for iterative loops: release round
    * N's storage once round N+1 is populated and compared, so a deep
    * contraction keeps O(1) rounds cached instead of O(rounds).
    *
    * `truncateLineage`: on a cluster whose deployment armed
    * `sparkContext.setCheckpointDir`, ALSO reliable-checkpoint this
    * round's RDD (lazy — rides the caller's materializing action, then
    * one copy job from the cached blocks), resetting both lineage depth
    * and the recovery-replay chain. Ask for it every N rounds from deep
    * loops, not every round — it writes the full frame to the
    * checkpoint dir. Silently a plain persist when no checkpoint dir is
    * set: release() already bounds storage, and demanding a dir would
    * break every deployment without one; only the replay chain stays
    * O(rounds since last truncation). */
  def lazilyReleasable(df: DataFrame, truncateLineage: Boolean = false): Handle =
    if (df.sparkSession.sparkContext.isLocal)
      new Handle(df.localCheckpoint(false), None)
    else clusterLazilyReleasable(df, truncateLineage)

  /** Eager twin of [[lazilyReleasable]] — for loop bodies whose next
    * step is NOT a full action over the frame (an `isEmpty` probe can
    * stop at the first non-empty partition, which must not be what
    * populates the round). */
  def onceReleasable(df: DataFrame, truncateLineage: Boolean = false): Handle =
    if (df.sparkSession.sparkContext.isLocal)
      new Handle(df.localCheckpoint(true), None)
    else {
      val h = clusterLazilyReleasable(df, truncateLineage)
      h.df.count()
      h
    }

  /** The cluster branch of [[lazily]] — exposed for its spec (tests
    * run on a local master, same as [[clusterMaterialize]]). */
  private[graft] def clusterLazily(df: DataFrame): DataFrame = {
    val rows = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    df.sparkSession.createDataFrame(rows, df.schema)
  }

  /** The cluster branch of [[lazilyReleasable]], exposed for its spec. */
  private[graft] def clusterLazilyReleasable(
      df: DataFrame, truncateLineage: Boolean): Handle = {
    val sc = df.sparkSession.sparkContext
    val rows = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    // checkpoint() must be called before any job touches the RDD; the
    // write itself happens after the caller's first action, served from
    // the blocks that action just populated
    if (truncateLineage && sc.getCheckpointDir.isDefined) rows.checkpoint()
    new Handle(df.sparkSession.createDataFrame(rows, df.schema), Some(rows))
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
