package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructType}
import graft.operators.Dedup

/** Continuous C4-style span scrubbing: each micro-batch of documents
  * is cleaned against the span-hash store accumulated from all PRIOR
  * batches ([[graft.operators.Dedup.incrementalSpanDedup]]), and the
  * batch's surviving span hashes join the store — a perpetual ingest
  * tokenizes only its own batch and probes a membership set that holds
  * ONE 16-byte-hash row per distinct span ever seen (no text, no
  * positions: the minimal state the scrub semantics need). The
  * streaming twin of query d13.
  *
  * Idempotence: both sinks write into a `batch_id=<n>` subdirectory
  * with overwrite, so a replayed micro-batch (foreachBatch is
  * at-least-once) lands in the same place instead of double-appending
  * store hashes — and because a replay reads the store WITHOUT its own
  * partition's prior attempt (strictly lower batch ids), the scrub
  * result is bit-identical across attempts.
  *
  * Store growth is monotone append-only; fold the `batch_id=`
  * partition pile into one base with the same snapshot+compact shape
  * as [[IncrementalDedup.compactLabels]] when read amplification
  * warrants (dedup of the pile is free — partitions are disjoint by
  * construction since each batch appends only hashes the store
  * lacked).
  */
object IncrementalSpanDedup {

  /** Ingest any new files under `inputDir` once (AvailableNow), then
    * stop. Call repeatedly for a scheduled-cadence pipeline. */
  def runOnce(spark: SparkSession, schema: StructType, inputDir: String,
              idCol: String, textCol: String,
              storeDir: String, cleanOutDir: String, checkpointDir: String,
              spanTokens: Int = 16): Unit = {
    val in = spark.readStream.schema(schema).parquet(inputDir)
      .select(col(idCol), col(textCol))
    val q = in.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val store = readStore(s, storeDir, ltBatch = batchId)
        // ONE winners pass feeds both the scrub and the store delta
        val fresh = Dedup.freshSpanWinners(batch, store, idCol, textCol, spanTokens)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          Dedup.reassembleSpans(batch, fresh, idCol, textCol, spanTokens)
            .write.mode("overwrite").parquet(s"$cleanOutDir/batch_id=$batchId")
          // append AFTER scrubbing: the batch must not see its own
          // spans on the store side (everything would scrub to "")
          fresh.select(col("span_md5"))
            .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
        } finally fresh.unpersist()
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Fold the `batch_id=` partition pile through `uptoBatch` into the
    * RESERVED `batch_id=-1` base and drop the folded partitions — the
    * read-amplification chore ([[readStore]] otherwise opens every
    * batch's files forever). Store partitions are disjoint by
    * construction (each batch appends only hashes the store lacked),
    * so the fold is a plain concatenation with the existing base.
    *
    * The base id is reserved, never a live batch id: writing the
    * snapshot AT `batch_id=uptoBatch` would alias a partition a
    * structured-streaming replay of that batch still owns — the
    * replay would overwrite the entire folded history with its own
    * delta and read an empty store for its scrub (at-least-once
    * delivery destroys the membership set). For the same reason the
    * NEWEST batch must never fold (only it can still replay): the
    * guard refuses unless a strictly newer partition exists. */
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
    // distinct: partitions are disjoint on a clean history, but a crash
    // between writing this snapshot and deleting the folded partitions
    // leaves their hashes in BOTH — without the dedup every interrupted
    // compaction would bake the duplicates into the base forever
    val snapshot = readStore(spark, storeDir, ltBatch = uptoBatch + 1)
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

  /** The span-hash membership set as of just before `ltBatch` (replay
    * safety: a batch's own earlier attempt is excluded). */
  def readStore(spark: SparkSession, storeDir: String,
                ltBatch: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(storeDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new StructType().add("span_md5", StringType))
    spark.read.parquet(storeDir)   // batch_id is the partition column
      .filter(col("batch_id") < ltBatch)
      .select(col("span_md5"))
  }
}
