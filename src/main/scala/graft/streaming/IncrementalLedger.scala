package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** §2.I: the reference's batch-incremental model — daily Airflow runs +
  * file-grain at-least-once checkpointing via processed_files + key-level
  * keep-first writes — re-expressed on Structured Streaming's file
  * source, which gives exactly-once file tracking natively (the ledger
  * table, its race-prone mid-batch writes and the final-flush catch-all
  * of scripts/extract_commoncrawl.py:126-161 all collapse into the
  * checkpoint).
  *
  * `Trigger.AvailableNow` = "process everything new, then stop": the
  * scheduler-cadence equivalent of the reference's @daily DAG
  * (airflow/dags/etl_pipeline.py:26-31) without engine-side scheduling.
  */
object IncrementalLedger {

  /** Run one incremental pass: ingest any files under `inputDir` not yet
    * recorded in `checkpointDir`, apply `transform`, append to `outDir`
    * as parquet. Returns after the pass completes. */
  def runOnce(spark: SparkSession, schema: StructType, inputDir: String,
              checkpointDir: String, outDir: String,
              transform: DataFrame => DataFrame = identity): Unit = {
    val in = spark.readStream.schema(schema).parquet(inputDir)
    val q = transform(in).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
