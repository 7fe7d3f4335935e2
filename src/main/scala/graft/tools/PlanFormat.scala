package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of named queries to plans/<tag>/<name>_<suffix>.txt
  * — the optimization-round evidence files (the judge checks plan claims
  * against these).
  *   sbt "runMain graft.tools.PlanFormat r14 before q1,q2 [sfDir]"
  * Runs at bench geometry (local[32], shuffle.partitions=32, AQE on) so the
  * dumped plan is the one the bench executes; the plan printed is the
  * POST-EXECUTION adaptive plan (isFinalPlan=true) plus the formatted view.
  */
object PlanFormat {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanFormat <tag> <suffix> <q1,q2,...> [sfDir]")
    val Array(tag, suffix, names) = args.take(3)
    val d = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    // side executions (Materialize.once sketch/memo builds, closure
    // rounds) carry the scans and exchanges the main plan then reads as
    // checkpoints — capture them too, else a memoizing query's plan
    // file shows none of its real work
    val sides = new java.util.concurrent.CopyOnWriteArrayList[
      org.apache.spark.sql.execution.QueryExecution]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            ns: Long): Unit = { sides.add(qe); () }
        override def onFailure(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })
    for (name <- names.split(",").map(_.trim).filter(_.nonEmpty)) {
      sides.clear()
      val df = graft.SparkEntry.queries(name)(spark, d)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.count() // drive to completion so the AQE final plan exists
      Thread.sleep(500) // listener delivery is async; let side QEs land
      val fin = df.queryExecution.executedPlan.toString
      val sb = new StringBuilder
      sb.append(s"== explain(formatted), pre-execution ==\n$formatted\n")
      sb.append(s"== executedPlan after AQE (isFinalPlan) ==\n$fin\n")
      import scala.jdk.CollectionConverters._
      for ((qe, i) <- sides.asScala.zipWithIndex if qe ne df.queryExecution)
        sb.append(s"\n== side execution $i (construction-time " +
          s"materialization / closure round) ==\n${qe.executedPlan.toString}\n")
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), sb.toString)
      println(s"wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
