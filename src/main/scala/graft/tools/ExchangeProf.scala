package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-operator shuffle attribution for one named query — the tool a
  * scale-linearity claim reaches for when the TOTAL shuffle (Bench /
  * TimeQuery task metrics) moves superlinearly and the question is
  * WHICH exchange grew (SCALE.md n8_scaled x1000 attribution). Runs
  * the query once and prints the final adaptive plan as a tree with
  * each node's runtime metrics (output rows, exchange data size,
  * shuffle bytes/records written, sort spill), so two runs at
  * different scales diff exchange-by-exchange instead of arguing from
  * one total.
  *
  *   scripts/run_tool.sh graft.tools.ExchangeProf n8_incremental_ann_scaled target/scaledata/x100
  */
object ExchangeProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // every QueryExecution that completes, WITH its wall duration (the
    // codebook-training collects and eager closure-round
    // materializations run as their own executions before the main
    // count — their durations are where an iterative query's wall
    // actually goes, so print them rather than leaving the total
    // unattributed)
    val captured = new java.util.concurrent.CopyOnWriteArrayList[(QueryExecution, Long)]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = { captured.add((qe, durationNs)); () }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    })

    // The main action runs through a Dataset we hold, so its
    // QueryExecution can be tagged by IDENTITY below — listener
    // delivery order is not guaranteed to match completion order, so
    // "last captured" could mislabel a late side execution as the main
    // plan. Dataset.collect() executes the dataset's own lazy
    // `queryExecution`, so the listener's qe for this action is this
    // exact object. Query CONSTRUCTION stays inside the timed window:
    // eager materializations (memoized pair frames, closure rounds)
    // run at construction time and belong in the reported wall.
    val t0 = System.nanoTime()
    val countDf = graft.SparkEntry.queries(name)(spark, d).groupBy().count()
    val mainQe = countDf.queryExecution
    val rows = countDf.collect().head.getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.MetricsBridge.drain(spark.sparkContext)
    println(f"QUERY $name rows=$rows wall=$sec%.1f dir=$d")

    def fmt(b: Long): String =
      if (b >= (1L << 30)) f"${b / 1e9}%.2fGB"
      else if (b >= (1L << 20)) f"${b / 1e6}%.1fMB"
      else s"${b}B"
    val bytesKeys = Set("dataSize", "shuffleBytesWritten", "spillSize")
    val keep = bytesKeys ++ Set("numOutputRows", "shuffleRecordsWritten", "numPartitions")

    def metricsOf(p: SparkPlan): String =
      p.metrics.collect {
        case (k, m) if keep.contains(k) && m.value > 0 =>
          s"$k=${if (bytesKeys.contains(k)) fmt(m.value) else m.value.toString}"
      }.toSeq.sorted.mkString(" ")

    var totalShuffleWritten = 0L
    def show(p: SparkPlan, depth: Int): Unit = {
      val ms = metricsOf(p)
      p.metrics.get("shuffleBytesWritten").foreach(m => totalShuffleWritten += m.value)
      println(("  " * depth) + p.nodeName + (if (ms.nonEmpty) s"  [$ms]" else ""))
      p match {
        case a: AdaptiveSparkPlanExec => show(a.executedPlan, depth + 1)
        case q: QueryStageExec => show(q.plan, depth + 1)
        case r: ReusedExchangeExec =>
          println(("  " * (depth + 1)) + s"(reused exchange #${r.child.id})")
        case _ => p.children.foreach(show(_, depth + 1))
      }
    }

    def anyShuffle(p: SparkPlan): Long = {
      val own = p.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
      val sub = p match {
        case a: AdaptiveSparkPlanExec => anyShuffle(a.executedPlan)
        case q: QueryStageExec => anyShuffle(q.plan)
        case _: ReusedExchangeExec => 0L
        case _ => p.children.map(anyShuffle).sum
      }
      own + sub
    }

    // the main plan (tagged by QueryExecution identity, not capture
    // order) plus any side execution that itself shuffled >1 MB
    // (tiny codebook-sample collects stay out of the way)
    val all = captured.toArray(Array.empty[(QueryExecution, Long)])
    all.zipWithIndex.foreach { case ((qe, durNs), i) =>
      val sh = anyShuffle(qe.executedPlan)
      val isMain = qe eq mainQe
      if (isMain || sh > (1L << 20)) {
        println(f"\n=== execution $i${if (isMain) " MAIN" else ""} " +
          f"(shuffle written ${fmt(sh)}, wall ${durNs / 1e9}%.1f s) ===")
        totalShuffleWritten = 0L
        show(qe.executedPlan, 0)
        println(s"--- execution $i total shuffle written: ${fmt(totalShuffleWritten)}")
      }
    }
    val (printed, unprinted) = all.partition { case (qe, _) =>
      (qe eq mainQe) || anyShuffle(qe.executedPlan) > (1L << 20) }
    val accounted = printed.map(_._2).sum
    val restNs = unprinted.map(_._2).sum
    println(f"\nWALL $name total=$sec%.1f s: printed executions " +
      f"${accounted / 1e9}%.1f s, ${unprinted.length} sub-1MB executions " +
      f"${restNs / 1e9}%.1f s (closure rounds, convergence counts), " +
      f"unattributed ${sec - (accounted + restNs) / 1e9}%.1f s " +
      "(driver-side bookkeeping, plan/codegen time)")
    spark.stop()
  }
}
