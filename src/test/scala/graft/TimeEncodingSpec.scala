package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.model.Tables

/** `Tables.epochMicros` / `loadEventsUs` must map every physical
  * event-time encoding a parquet feed can ship to the SAME epoch-micros
  * bigint — the round-8 lesson: the testdata's `ts` flipped from
  * TIMESTAMP(NANOS) (bigint nanos under `nanosAsLong`) to
  * TIMESTAMP(MICROS) (TIMESTAMP_NTZ) between rounds and took 10
  * queries down at analysis time. */
class TimeEncodingSpec extends SparkSpec {
  import spark.implicits._

  // three instants incl. a pre-1970 one (negative micros) and a
  // non-integral-second one
  private val micros = Seq(-1234567L, 0L, 1696159317123456L)

  test("epochMicros is identical across bigint-nanos, TIMESTAMP, and TIMESTAMP_NTZ") {
    val root = Files.createTempDirectory("graft-ts-enc")
    // bigint nanos (what nanosAsLong hands us for parquet TIMESTAMP(NANOS))
    micros.map(u => Tuple1(u * 1000L)).toDF("ts")
      .write.parquet(s"$root/nanos")
    // TIMESTAMP / TIMESTAMP_NTZ via timestamp_micros so values stay
    // micros-exact
    spark.sql(s"SELECT timestamp_micros(col) AS ts FROM VALUES ${micros.map(u => s"($u)").mkString(",")} t(col)")
      .write.parquet(s"$root/tsz")
    spark.sql(s"SELECT CAST(timestamp_micros(col) AS TIMESTAMP_NTZ) AS ts FROM VALUES ${micros.map(u => s"($u)").mkString(",")} t(col)")
      .write.parquet(s"$root/ntz")

    val decoded = Seq("nanos", "tsz", "ntz").map { enc =>
      val df = spark.read.parquet(s"$root/$enc")
      val got = df.select(Tables.epochMicros(df, "ts").as("us"))
        .as[Long].collect().sorted.toSeq
      enc -> got
    }.toMap
    assert(decoded("nanos") == micros.sorted, s"nanos: ${decoded("nanos")}")
    assert(decoded("tsz") == micros.sorted, s"tsz: ${decoded("tsz")}")
    assert(decoded("ntz") == micros.sorted, s"ntz: ${decoded("ntz")}")
  }

  test("bigint-nanos with sub-microsecond precision floors to the micro below") {
    // -1500 ns lies between micros -2 and -1: floor must pick -2 (the
    // DuckDB epoch_ns(ts) // 1000 semantics), where truncation toward
    // zero would pick -1 and break oracle parity on pre-1970 feeds
    val root = Files.createTempDirectory("graft-ts-floor")
    Seq(-1500L, -1L, 999L, 1001L, 123456789L).map(Tuple1(_)).toDF("ts")
      .write.parquet(s"$root/ns")
    val df = spark.read.parquet(s"$root/ns")
    val got = df.select(Tables.epochMicros(df, "ts").as("us"))
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(-2L, -1L, 0L, 1L, 123456L), s"got $got")
  }

  test("epochMicros rejects an unsupported encoding loudly") {
    val df = Seq("2020-01-01").toDF("ts")
    val e = intercept[IllegalArgumentException] {
      Tables.epochMicros(df, "ts")
    }
    assert(e.getMessage.contains("unsupported event-time type"))
  }

  test("loadEventsUs normalizes the shipped testdata to bigint micros") {
    val df = Tables.loadEventsUs(spark, sf)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    // sanity: values are epoch micros (year range ~2020s), not nanos
    val mx = df.agg(max(col("ts"))).head().getLong(0)
    assert(mx > 1000000000000000L && mx < 4000000000000000L,
      s"ts out of epoch-micros range: $mx")
  }
}
