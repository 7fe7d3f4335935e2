package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S-3/J-4: the reference's processed_files idempotency ledger
  * (reads scripts/extract_commoncrawl.py:87-93, writes :126-131,155-161)
  * as anti-join operators. The streaming-native equivalent (exactly-once
  * file tracking) lives in [[graft.streaming.IncrementalLedger]].
  */
object Ledger {

  /** Inputs not yet processed: NULL-SAFE left-anti on file_path. A
    * plain equality anti-join never matches a NULL path (NULL = NULL
    * is NULL), so a malformed manifest row with a NULL path would be
    * re-extracted on EVERY batch forever even after [[record]] stamped
    * it — the one failure mode an idempotency ledger exists to
    * prevent. */
  def pending(inputs: DataFrame, ledger: DataFrame, pathCol: String = "file_path"): DataFrame = {
    val done = ledger.select(col(pathCol).as("__ledger_path")).distinct()
    inputs.join(done, col(pathCol) <=> col("__ledger_path"), "left_anti")
  }

  /** New ledger rows for a batch of completed paths (recorded only after
    * the batch's output is durably written — the reference's intent, see
    * SURVEY.md §2.I caveat). */
  def record(paths: DataFrame, pathCol: String = "file_path"): DataFrame =
    paths.select(col(pathCol)).distinct()
      .withColumn("processed_at", current_timestamp())
}
