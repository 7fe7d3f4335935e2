package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S-3/J-4: the reference's processed_files idempotency ledger
  * (reads scripts/extract_commoncrawl.py:87-93, writes :126-131,155-161)
  * as anti-join operators. The streaming-native equivalent (exactly-once
  * file tracking) lives in [[graft.streaming.IncrementalLedger]].
  */
object Ledger {

  /** Inputs not yet processed: left-anti on file_path. */
  def pending(inputs: DataFrame, ledger: DataFrame, pathCol: String = "file_path"): DataFrame =
    inputs.join(ledger.select(col(pathCol)).distinct(), Seq(pathCol), "left_anti")

  /** New ledger rows for a batch of completed paths (recorded only after
    * the batch's output is durably written — the reference's intent, see
    * SURVEY.md §2.I caveat). */
  def record(paths: DataFrame, pathCol: String = "file_path"): DataFrame =
    paths.select(col(pathCol)).distinct()
      .withColumn("processed_at", current_timestamp())
}
