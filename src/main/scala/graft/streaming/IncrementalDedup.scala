package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.operators.Dedup

/** Continuous near-duplicate detection: each micro-batch of documents
  * is banded against the signature store accumulated from all PRIOR
  * batches (`Dedup.incrementalPairsFromSigs`), the surviving pairs are
  * appended, and the batch's own signatures join the store — so a
  * perpetual ingest pays O(batch + collisions) per batch and the
  * corpus is never re-tokenized. The streaming twin of query d7.
  *
  * Idempotence: both sinks write into a `batch_id=<n>` subdirectory
  * with overwrite, so a replayed micro-batch (foreachBatch is
  * at-least-once) lands in the same place instead of duplicating rows.
  *
  * Store size note: the store carries the distinct shingle-hash array
  * (`sh`) per doc — O(8 bytes × corpus tokens) — because exact-Jaccard
  * verification needs it. Swap the verify to the signature-estimate
  * (`sig` agreement fraction) to shrink the store to O(numHashes) longs
  * per doc at the cost of probabilistic verification.
  */
object IncrementalDedup {

  /** Ingest any new files under `inputDir` once (AvailableNow), then
    * stop. Call repeatedly for a scheduled-cadence pipeline. */
  def runOnce(spark: SparkSession, schema: StructType, inputDir: String,
              idCol: String, textCol: String,
              sigStoreDir: String, pairsOutDir: String, checkpointDir: String,
              shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
              minJaccard100: Int = 50): Unit = {
    val in = spark.readStream.schema(schema).parquet(inputDir)
      .select(col(idCol), col(textCol))
    val q = in.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val newSigs = Dedup.minhashSignatures(
            batch, idCol, textCol, shingleK, numHashes, bands)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val existing = readStore(s, sigStoreDir, newSigs.schema)
          Dedup.incrementalPairsFromSigs(
              newSigs, existing, idCol, bands, minJaccard100)
            .write.mode("overwrite").parquet(s"$pairsOutDir/batch_id=$batchId")
          // append AFTER pairing: the batch must not see its own sigs
          // on the existing side (pairs would double via both orders)
          newSigs.write.mode("overwrite")
            .parquet(s"$sigStoreDir/batch_id=$batchId")
        } finally newSigs.unpersist()
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The accumulated signature store, or an empty frame with the right
    * schema before the first batch lands. */
  private def readStore(spark: SparkSession, dir: String,
                        schema: StructType): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      spark.read.schema(schema).parquet(dir)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
