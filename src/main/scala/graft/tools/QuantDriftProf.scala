package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of the incremental-ANN drift statistic (quantizationError): the
  * PqReconSqErr kernel vs the declarative encode→decode→zip_with chain,
  * over an sf0.1 embeddings frame replicated `reps`× (batch-scale).
  * Both forms are bitwise-equal (VectorsSpec); this measures the cost
  * the streaming driver pays PER MICRO-BATCH for the check.
  *   sbt "runMain graft.tools.QuantDriftProf [reps=64] [sfDir]"
  */
object QuantDriftProf {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(64)
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val big = e.crossJoin(spark.range(reps).select(col("id").as("rep")))
      .select((col("vec_id") * reps + col("rep")).as("vec_id"),
        transform(col("embedding"),
          x => x + col("rep").cast("float") / lit(1000f)).as("embedding"))
      .localCheckpoint(true)
    println(s"rows=${big.count()}")
    val cb = graft.operators.SimilaritySearch.pqTrainCodebook(
      big, "vec_id", "embedding", 64, 8, 16)
    def time(name: String)(f: => Double): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val v = f
        println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (mse=$v%.6f)")
      }
    time("kernel") {
      graft.streaming.IncrementalAnn.quantizationError(big, "embedding", cb)
    }
    time("declarative") {
      big.select(avg(graft.streaming.IncrementalAnn
        .reconSqErrDeclarative("embedding", cb)).as("mse")).head().getDouble(0)
    }
    // kernel again: JVM-warmup-order fairness
    time("kernel-rewarm") {
      graft.streaming.IncrementalAnn.quantizationError(big, "embedding", cb)
    }
    spark.stop()
  }
}
