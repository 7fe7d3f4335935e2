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
        // ONE manifest resolve serves both the store read and the
        // uniqueFps decision (a separate isManaged call would re-pay
        // the driver-side metadata round-trip every micro-batch)
        val (store, managed) = StoreCompaction.readResolvedManaged(
          s, fpStoreDir, new StructType().add(idCol, schema(idCol).dataType)
            .add("fp", LongType), ltBatch = batchId)
        // ONE winnowing pass (checkpointed inside the operator) feeds
        // both the pairing and the store delta
        val newFps = Dedup.winnowedFingerprints(batch, idCol, textCol, k, w)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // uniqueFps: a manifest-resolved store read is duplicate-free
          // by construction, so the df count needs no distinct shield
          Dedup.incrementalWinnowingOverlapFromFps(newFps, store, idCol,
              minShared, fpDfCap, uniqueFps = managed)
            .write.mode("overwrite").parquet(s"$pairsOutDir/batch_id=$batchId")
          // append AFTER pairing (the batch must not meet itself twice)
          newFps.write.mode("overwrite")
            .parquet(s"$fpStoreDir/batch_id=$batchId")
          graft.sources.StoreManifest.commitBatch(s, fpStoreDir, s"batch_id=$batchId")
        } finally newFps.unpersist()
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Fingerprint-store compaction: fold the `batch_id=` pile through
    * `uptoBatch` into a fresh negative-id snapshot and drop the folded
    * partitions — the [[IncrementalSubstringScrub.compactStore]] shape
    * ([[StoreCompaction.fold]]). Partitions are disjoint by id on a
    * clean history; the legacy-path `distinct` absorbs the crash window
    * where a prior interrupted compaction left rows in both the base
    * and a folded partition (impossible through a manifest resolve).
    * The NEWEST batch (the only one structured streaming can still
    * replay) must never fold. */
  def compactStore(spark: SparkSession, storeDir: String,
                   uptoBatch: Long): Unit =
    StoreCompaction.fold(spark, storeDir, uptoBatch, _.distinct())

  /** The accumulated (id, fp) fingerprint table as of just before
    * `ltBatch` (replay safety: a batch's own earlier attempt is
    * excluded). `idType` shapes the empty first-batch frame — the
    * operator family is generic over orderable id types, so the store
    * must not hard-code one. Resolved through the store manifest when
    * one exists. */
  def readStore(spark: SparkSession, storeDir: String, idCol: String,
                idType: org.apache.spark.sql.types.DataType,
                ltBatch: Long): DataFrame =
    StoreCompaction.readResolved(spark, storeDir,
      new StructType().add(idCol, idType).add("fp", LongType), ltBatch)
}
