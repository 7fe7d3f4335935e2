package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types._

/** Typed data model for the engine.
  *
  * Mirrors the reference's four relational tables (reference
  * `sql/schema.sql:4-49`) as Spark case classes + explicit StructTypes
  * (SURVEY.md §1.2/§1.4). ABN stays a string key (leading zeros matter,
  * `sql/schema.sql:15`); `merged_confidence` is an INT 0-100 similarity
  * score (`sql/schema.sql:40`).
  */
object Schemas {

  /** reference `sql/schema.sql:13-24` */
  final case class AbrRecord(
      abn: String,
      entity_name: Option[String],
      entity_type: Option[String],
      entity_status: Option[String],
      address: Option[String],
      postcode: Option[String],
      state: Option[String],
      start_date: Option[java.sql.Date])

  /** reference `sql/schema.sql:4-10` */
  final case class CcRecord(
      website_url: Option[String],
      company_name: Option[String],
      industry: Option[String])

  /** reference `sql/schema.sql:27-42` — ABR columns + matched CC columns. */
  final case class UnifiedCompany(
      abn: String,
      entity_name: Option[String],
      entity_type: Option[String],
      entity_status: Option[String],
      address: Option[String],
      postcode: Option[String],
      state: Option[String],
      start_date: Option[java.sql.Date],
      website_url: Option[String],
      company_name: Option[String],
      industry: Option[String],
      merged_confidence: Int)

  /** reference `sql/schema.sql:45-49` — incremental-processing ledger. */
  final case class ProcessedFile(file_path: String, processed_at: java.sql.Timestamp)

  val abrSchema: StructType = StructType(Seq(
    StructField("abn", StringType, nullable = false),
    StructField("entity_name", StringType),
    StructField("entity_type", StringType),
    StructField("entity_status", StringType),
    StructField("address", StringType),
    StructField("postcode", StringType),
    StructField("state", StringType),
    StructField("start_date", DateType)))

  val ccSchema: StructType = StructType(Seq(
    StructField("website_url", StringType),
    StructField("company_name", StringType),
    StructField("industry", StringType)))
}

/** Loaders for the driver-generated testdata (TESTDATA.md). One parquet
  * file per table; reads are partition-parallel and columnar, with
  * Catalyst handling projection/predicate pushdown into the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Analyzed-relation cache: one `spark.read.parquet` per (session,
    * path) instead of per query — repeated loads would re-list files
    * and re-read parquet footers on every one of the 58 census queries
    * (pure driver fixed cost). The returned DataFrame is an immutable
    * logical plan, safe to share across queries; the underlying
    * testdata is static for the life of a session. */
  private val loadCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    // keyed on the SESSION OBJECT (identity), never its hashCode: an
    // identity hash can recur on a new session after the old one is
    // collected, which would hand back a plan bound to a STOPPED
    // session. Entries for stopped sessions are evicted opportunistically
    // (the cache is sessions × tables small, so the sweep is trivial).
    loadCache.keysIterator.foreach { case k @ (s, _) =>
      if (s.sparkContext.isStopped) loadCache.remove(k)
    }
    loadCache.getOrElseUpdate((spark, path), spark.read.parquet(path))
  }

  /** Epoch-MICROS (bigint) view of an event-time column, adaptive to the
    * physical type the source shipped. Real feeds deliver all three:
    * parquet TIMESTAMP(MICROS) arrives as TIMESTAMP or TIMESTAMP_NTZ
    * (depending on isAdjustedToUTC), and parquet TIMESTAMP(NANOS) —
    * which the vectorized reader can't widen — arrives as bigint nanos
    * under `spark.sql.legacy.parquet.nanosAsLong`. Downstream operators
    * (as-of/band joins, sessionization, range frames) all do integer
    * time arithmetic, so they get one canonical unit regardless of
    * source. NTZ goes through a cast to TIMESTAMP, which is value-
    * preserving because every entry point pins
    * `spark.sql.session.timeZone=UTC`.
    */
  def epochMicros(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    // FLOOR division, not DIV's truncation-toward-zero: a pre-1970
    // nano timestamp must land on the micro BELOW it, matching both
    // the timestamp paths and DuckDB's `epoch_ns(ts) // 1000`
    case LongType         => expr(s"(`$c` - pmod(`$c`, 1000L)) DIV 1000")
    case TimestampType    => unix_micros(col(c))
    case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
    case other => throw new IllegalArgumentException(
      s"unsupported event-time type for `$c`: $other (expected TIMESTAMP, TIMESTAMP_NTZ, or bigint nanos)")
  }

  /** The events table with `ts` normalized to epoch-micros bigint —
    * the single ingestion point for every event-time query. */
  def loadEventsUs(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.withColumn("ts", epochMicros(df, "ts"))
  }

  /** Fan a small single-file scan out across the session's parallelism —
    * the testdata tables are one parquet row-group each, so a scan feeds
    * ONE task regardless of maxPartitionBytes; compute-heavy per-row
    * operators (minhash, simhash, vector math — interpreted
    * higher-order-function lambdas) would otherwise run single-threaded.
    * On a real multi-file 100 TB table this is a no-op decision: the
    * scan already yields thousands of splits and the repartition should
    * be skipped. */
  def spread(df: DataFrame): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    df.repartition(n)
  }
}
