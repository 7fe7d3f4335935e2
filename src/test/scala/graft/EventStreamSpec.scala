package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(dir: String, rows: Seq[(Timestamp, String, Double)]): Unit =
    rows.toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(dir)

  test("watermarked windowed aggregation over a file-backed stream") {
    val in = Files.createTempDirectory("graft-es").toString
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    writeEvents(in, Seq(
      (ts(1), "click", 1.0), (ts(2), "click", 2.0),
      (ts(7), "click", 4.0), (ts(8), "view", 8.0)))
    val schema = spark.read.parquet(in).schema
    EventStream.runToMemory(spark, schema, in, "win_out",
      df => EventStream.windowedAgg(df, "10 minutes", "5 minutes"),
      OutputMode.Append())
    // append mode emits only watermark-closed windows; rerun with a late
    // batch that advances the watermark past the first windows
    writeEvents(in, Seq((Timestamp.valueOf("2024-01-01 10:30:00"), "click", 0.5)))
    EventStream.runToMemory(spark, schema, in, "win_out2",
      df => EventStream.windowedAgg(df, "10 minutes", "5 minutes"),
      OutputMode.Append())
    val rows = spark.table("win_out2")
      .select(col("window.start").cast("string"), col("event_type"), col("n"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(rows.contains(("2024-01-01 10:00:00", "click", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 10:05:00", "click", 1L, 4.0)))
    assert(rows.contains(("2024-01-01 10:05:00", "view", 1L, 8.0)))
  }

  test("streaming keep-first dedup emits one row per key, lowest seq wins") {
    val in = Files.createTempDirectory("graft-sd").toString
    // seq makes the within-batch winner deterministic (groupByKey gives
    // no intra-group ordering after the shuffle)
    Seq(("a", 1L, "a1"), ("b", 2L, "b1"), ("a", 3L, "a2"), ("c", 4L, "c1"), ("b", 5L, "b2"))
      .toDF("key", "seq", "payload").coalesce(1).write.mode("append").parquet(in)
    Seq(("a", 6L, "a3"), ("d", 7L, "d1"))
      .toDF("key", "seq", "payload").coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    EventStream.runToMemory(spark, schema, in, "dedup_out",
      df => EventStream.dedupKeepFirst(df.as[EventStream.Keyed]).toDF(),
      OutputMode.Append())
    val out = spark.table("dedup_out").as[EventStream.Keyed].collect()
    assert(out.map(_.key).sorted.toSeq == Seq("a", "b", "c", "d"))
    val byKey = out.map(k => k.key -> k.payload).toMap
    assert(byKey == Map("a" -> "a1", "b" -> "b1", "c" -> "c1", "d" -> "d1"))
  }

  test("watermarked stream-stream interval join pairs events within the bound") {
    val clicks = Files.createTempDirectory("graft-ij-l").toString
    val buys = Files.createTempDirectory("graft-ij-r").toString
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    Seq((1L, ts(0), "c1"), (1L, ts(20), "c2"), (2L, ts(5), "c3"))
      .toDF("user_id", "ts", "click_id").coalesce(1).write.mode("append").parquet(clicks)
    Seq((1L, ts(4), "b1"), (1L, ts(40), "b2"), (2L, ts(30), "b3"))
      .toDF("user_id", "ts", "buy_id").coalesce(1).write.mode("append").parquet(buys)
    val ls = spark.read.parquet(clicks).schema
    val rs = spark.read.parquet(buys).schema
    val q = EventStream.intervalJoin(
        spark.readStream.schema(ls).parquet(clicks),
        spark.readStream.schema(rs).parquet(buys),
        "user_id", "10 minutes", beforeSec = 0L, afterSec = 600L)
      .select(col("click_id"), col("r_buy_id"))
      .writeStream.format("memory").queryName("ij_out")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("ij_out")
      .as[(String, String)].collect().toSet
    // only c1→b1 lands inside [click, click+10min]; b2/b3 are too late
    assert(got == Set(("c1", "b1")))
  }

  test("stateful sessionization accumulates per-user state across batches") {
    val in = Files.createTempDirectory("graft-ss").toString
    def ev(u: Long, m: Int, v: Double) =
      (u, Timestamp.valueOf(f"2024-01-01 10:$m%02d:00"), v)
    Seq(ev(1, 1, 1.0), ev(1, 2, 2.0), ev(2, 1, 10.0))
      .toDF("user_id", "ts", "value").coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    EventStream.runToMemory(spark, schema, in, "sess_out",
      df => EventStream.sessionize(df.as[EventStream.Event]).toDF(),
      OutputMode.Update())
    val out = spark.table("sess_out")
      .as[EventStream.SessionOut].collect().map(s => s.user_id -> s).toMap
    assert(out(1L).n_events == 2 && out(1L).total_value == 3.0)
    assert(out(2L).n_events == 1 && out(2L).total_value == 10.0)
    assert(!out(1L).closed)
  }

  test("sessionize rounds negative half-cents with SQL semantics (away from zero)") {
    // the state function must follow the cents convention of the batch
    // twins (SQL round = half away from zero), not JVM math.round
    // (half toward +inf): -0.025 * 100 = -2.5 must become -3 cents.
    // math.round(-2.5) == -2 — the bug this pins.
    val in = Files.createTempDirectory("graft-ss-neg").toString
    def ev(u: Long, m: Int, v: Double) =
      (u, Timestamp.valueOf(f"2024-01-01 10:$m%02d:00"), v)
    Seq(ev(1, 1, -0.025), ev(2, 1, 0.025))
      .toDF("user_id", "ts", "value").coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    EventStream.runToMemory(spark, schema, in, "sess_neg_out",
      df => EventStream.sessionize(df.as[EventStream.Event]).toDF(),
      OutputMode.Update())
    val out = spark.table("sess_neg_out")
      .as[EventStream.SessionOut].collect().map(s => s.user_id -> s).toMap
    // SQL round(-2.5) = -3, round(2.5) = 3 — symmetric away from zero
    assert(out(1L).total_value == -0.03,
      s"negative half-cent rounded toward +inf: ${out(1L).total_value}")
    assert(out(2L).total_value == 0.03)
  }

  test("sessionize fails loudly on non-finite event values (ANSI batch-twin parity)") {
    // the ANSI batch twin's round(value*100).cast("long") rejects
    // NaN/Infinity; the state function must fail with the value named,
    // not silently add math.round's 0 / Long.MaxValue to the session
    // total (and not die in a cryptic BigDecimal NumberFormatException)
    val in = Files.createTempDirectory("graft-ss-nan").toString
    Seq((1L, Timestamp.valueOf("2024-01-01 10:01:00"), Double.NaN))
      .toDF("user_id", "ts", "value").coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      EventStream.runToMemory(spark, schema, in, "sess_nan_out",
        df => EventStream.sessionize(df.as[EventStream.Event]).toDF(),
        OutputMode.Update())
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[ArithmeticException] &&
        c.getMessage.contains("non-finite")),
      s"expected the named non-finite failure, got: ${e.getMessage}")
  }
}
