package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructType}
import graft.operators.Dedup

/** Continuous partial-overlap detection: each micro-batch is winnowed
  * once ([[graft.operators.Dedup.winnowedFingerprints]]), paired
  * against the fingerprint store of all PRIOR batches
  * ([[graft.operators.Dedup.incrementalWinnowingOverlap]]), and its
  * `(id, fp)` rows join the store — per batch the work is
  * O(batch + fingerprint collisions), the corpus is never re-winnowed,
  * and old-old pairs never re-emit. The streaming twin of query d17,
  * structured exactly like [[IncrementalSpanDedup]] /
  * [[IncrementalSubstringScrub]].
  *
  * Unlike the scrub stores (pure membership sets), this store carries
  * `(id, fp)` — pairing needs the document ids on the store side — so
  * partitions are NOT deduplicated against each other; that is fine:
  * each batch appends only its own documents' fingerprints, and ids
  * are unique across batches, so partitions stay disjoint by id.
  *
  * Idempotence: both sinks write `batch_id=<n>` overwrite partitions
  * and a replay reads the store without its own prior attempt
  * (strictly lower batch ids), so pairs are bit-identical across
  * at-least-once redeliveries.
  */
object IncrementalWinnowing {

  /** Ingest any new files under `inputDir` once (AvailableNow), then
    * stop. Emits (id_a, id_b, n_shared >= `minShared`) pairs touching
    * the batch into `pairsOutDir`; appends the batch's (id, fp) rows
    * to `fpStoreDir`. */
  def runOnce(spark: SparkSession, schema: StructType, inputDir: String,
              idCol: String, textCol: String,
              fpStoreDir: String, pairsOutDir: String, checkpointDir: String,
              k: Int = 4, w: Int = 4, minShared: Long = 3,
              fpDfCap: Long = 1000L): Unit = {
    val in = spark.readStream.schema(schema).parquet(inputDir)
      .select(col(idCol), col(textCol))
    val q = in.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val store = readStore(s, fpStoreDir, idCol,
          schema(idCol).dataType, ltBatch = batchId)
        // ONE winnowing pass (checkpointed inside the operator) feeds
        // both the pairing and the store delta
        val newFps = Dedup.winnowedFingerprints(batch, idCol, textCol, k, w)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          Dedup.incrementalWinnowingOverlapFromFps(newFps, store, idCol,
              minShared, fpDfCap)
            .write.mode("overwrite").parquet(s"$pairsOutDir/batch_id=$batchId")
          // append AFTER pairing (the batch must not meet itself twice)
          newFps.write.mode("overwrite")
            .parquet(s"$fpStoreDir/batch_id=$batchId")
        } finally newFps.unpersist()
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Fingerprint-store compaction: fold the `batch_id=` pile through
    * `uptoBatch` into the RESERVED `batch_id=-1` base and drop the
    * folded partitions — the [[IncrementalSubstringScrub.compactStore]]
    * shape. Partitions are disjoint by id on a clean history; the
    * `distinct` absorbs the crash window where a prior interrupted
    * compaction left rows in both the base and a folded partition. The
    * NEWEST batch (the only one structured streaming can still replay)
    * must never fold. */
  def compactStore(spark: SparkSession, storeDir: String,
                   uptoBatch: Long): Unit = {
    require(uptoBatch >= 0, "uptoBatch must be a real batch id")
    val path = new org.apache.hadoop.fs.Path(storeDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return
    val ids = fs.listStatus(path).map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
    require(ids.exists(_ > uptoBatch),
      s"refusing to compact through batch $uptoBatch: it is the newest " +
        "batch and may still be replayed — compact only after a newer " +
        "batch has committed")
    val snapshot = spark.read.parquet(storeDir)
      .filter(col("batch_id") <= uptoBatch)
      .drop("batch_id")
      .distinct()
      .localCheckpoint(true) // materialize BEFORE overwriting the inputs
    snapshot.write.mode("overwrite").parquet(s"$storeDir/batch_id=-1")
    fs.listStatus(path).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("batch_id=")) {
        val id = name.stripPrefix("batch_id=").toLong
        if (id >= 0 && id <= uptoBatch) fs.delete(st.getPath, true)
      }
    }
  }

  /** The accumulated (id, fp) fingerprint table as of just before
    * `ltBatch` (replay safety: a batch's own earlier attempt is
    * excluded). `idType` shapes the empty first-batch frame — the
    * operator family is generic over orderable id types, so the store
    * must not hard-code one. */
  def readStore(spark: SparkSession, storeDir: String, idCol: String,
                idType: org.apache.spark.sql.types.DataType,
                ltBatch: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(storeDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new StructType().add(idCol, idType).add("fp", LongType))
    spark.read.parquet(storeDir)   // batch_id is the partition column
      .filter(col("batch_id") < ltBatch)
      .select(col(idCol), col("fp"))
  }
}
