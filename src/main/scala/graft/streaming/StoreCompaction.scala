package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import graft.sources.StoreManifest

/** Shared read/fold machinery for the `batch_id=` incremental stores
  * (sig, span, gram, fingerprint) — one implementation of the
  * manifest-vs-legacy resolution rules:
  *
  *  - READ: a managed store resolves through its newest manifest
  *    version (atomic old-or-new across compactions, duplicate-free by
  *    construction); an unmanaged pile root-scans as before.
  *  - FOLD: the snapshot goes to a FRESH directory
  *    (`batch_id=min(-(uptoBatch+1), min(resolved ids)-1)` — fresh by
  *    construction even when a fold is RETRIED at an already-folded
  *    horizon; negative so it sorts before every live batch and can
  *    never alias a replayable id), the manifest swap publishes
  *    it atomically, and only then are the folded directories deleted.
  *    Readers therefore never observe a folded row twice — the
  *    interrupted-compaction duplicate absorber is needed only on the
  *    legacy root-scan path.
  */
private[streaming] object StoreCompaction {

  private def idOf(name: String): Long = name.stripPrefix("batch_id=").toLong

  /** The resolved store content strictly before `ltBatch`, projected to
    * `schema`'s columns; a correctly-typed empty frame when the store
    * resolves to no live data. */
  def readResolved(spark: SparkSession, storeDir: String,
                   schema: StructType, ltBatch: Long): DataFrame =
    readResolvedManaged(spark, storeDir, schema, ltBatch)._1

  /** [[readResolved]] plus whether the store is manifest-MANAGED — the
    * streaming drivers need both (the managed flag decides the
    * uniqueIds/uniqueFps dedup-shield opt-out), and a separate
    * `isManaged` call would re-pay the manifest resolve on the hot
    * per-batch path. ONE resolve per read: latest() is a listStatus +
    * open on `_manifest`, and this runs on every micro-batch —
    * resolving once and branching beats the resolvesEmpty/readLive
    * pair (2-3 round trips of driver-side metadata I/O on an object
    * store). */
  def readResolvedManaged(spark: SparkSession, storeDir: String,
                          schema: StructType,
                          ltBatch: Long): (DataFrame, Boolean) = {
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    def project(df: DataFrame) = df
      .filter(col("batch_id") < ltBatch)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    StoreManifest.latest(spark, storeDir) match {
      case Some((_, dirs)) =>
        (if (dirs.isEmpty) empty
         else project(StoreManifest.readDirs(spark, storeDir, dirs)), true)
      case None =>
        (if (StoreManifest.legacyNames(spark, storeDir).isEmpty) empty
         else project(spark.read.parquet(storeDir)), false) // batch_id partition col
    }
  }

  /** Fold everything with `batch_id <= uptoBatch` (prior snapshots
    * included — their ids are negative) into one fresh snapshot
    * directory and retire the folded ones. `legacyDedup` is the
    * interrupted-compaction duplicate absorber, applied ONLY when the
    * store is an unmanaged pile whose root-scan can see a snapshot and
    * its folded partitions together; a manifest-managed resolve cannot.
    * The newest batch (the only one structured streaming can still
    * replay) must never fold — same guard as always. */
  def fold(spark: SparkSession, storeDir: String, uptoBatch: Long,
           legacyDedup: DataFrame => DataFrame): Unit = {
    require(uptoBatch >= 0, "uptoBatch must be a real batch id")
    val root = new Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val managed = StoreManifest.latest(spark, storeDir)
    val names = managed.map(_._2).getOrElse(
      fs.listStatus(root).map(_.getPath.getName)
        .filter(_.startsWith("batch_id=")).toSeq)
    require(names.map(idOf).exists(_ > uptoBatch),
      s"refusing to compact through batch $uptoBatch: it is the newest " +
        "batch and may still be replayed — compact only after a newer " +
        "batch has committed")
    val foldNames = names.filter(n => idOf(n) <= uptoBatch)
    if (foldNames.isEmpty) return // nothing below the horizon: no-op
    val resolved = (managed match {
      case Some((_, dirs)) => StoreManifest.readDirs(spark, storeDir, dirs)
      case None => spark.read.parquet(storeDir)
    }).filter(col("batch_id") <= uptoBatch).drop("batch_id")
    val snapshot = if (managed.isDefined) resolved else legacyDedup(resolved)
    // the snapshot id must be fresh against EVERY resolved name, not
    // just "fold horizons strictly increase": a retried fold at an
    // already-folded horizon would otherwise target its own listed
    // input — an overwrite whose lazy write plan reads the directory it
    // is destroying (recomputable lineage on a cluster re-reads the
    // half-clobbered files on executor loss). min(existing)-1 keeps the
    // first-fold name at -(uptoBatch+1) and gives every retry a fresh,
    // still-negative, never-replayable id below all prior snapshots.
    val snapId = math.min(-(uptoBatch + 1), names.map(idOf).min - 1)
    val snapName = s"batch_id=$snapId"
    snapshot.write.mode("overwrite").parquet(s"$storeDir/$snapName")
    StoreManifest.replace(spark, storeDir, foldNames.toSet, Seq(snapName))
    foldNames.foreach(n => fs.delete(new Path(root, n), true))
  }
}
