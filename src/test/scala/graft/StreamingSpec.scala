package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.streaming.IncrementalLedger

/** S-3 / §2.I: exactly-once file-grain incremental processing. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("AvailableNow passes ingest each file exactly once across runs") {
    val root = Files.createTempDirectory("graft-stream")
    val in = root.resolve("in"); Files.createDirectories(in)
    val ckpt = root.resolve("ckpt").toString
    val out = root.resolve("out").toString

    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(in.toString)
    val schema = spark.read.parquet(in.toString).schema

    IncrementalLedger.runOnce(spark, schema, in.toString, ckpt, out,
      df => df.withColumn("v", upper(col("v"))))
    assert(spark.read.parquet(out).count() == 2)

    // second pass with no new files: nothing re-processed
    IncrementalLedger.runOnce(spark, schema, in.toString, ckpt, out,
      df => df.withColumn("v", upper(col("v"))))
    assert(spark.read.parquet(out).count() == 2)

    // new file arrives: only it is processed
    Seq((3L, "c")).toDF("id", "v").coalesce(1).write.mode("append").parquet(in.toString)
    IncrementalLedger.runOnce(spark, schema, in.toString, ckpt, out,
      df => df.withColumn("v", upper(col("v"))))
    val rows = spark.read.parquet(out).orderBy($"id").as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "A"), (2L, "B"), (3L, "C")))
  }
}
