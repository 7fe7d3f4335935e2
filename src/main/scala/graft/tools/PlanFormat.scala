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
    for (name <- names.split(",").map(_.trim).filter(_.nonEmpty)) {
      val df = graft.SparkEntry.queries(name)(spark, d)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.count() // drive to completion so the AQE final plan exists
      val fin = df.queryExecution.executedPlan.toString
      val out = s"== explain(formatted), pre-execution ==\n$formatted\n" +
        s"== executedPlan after AQE (isFinalPlan) ==\n$fin\n"
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), out)
      println(s"wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
