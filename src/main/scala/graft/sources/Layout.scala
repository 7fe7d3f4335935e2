package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout writers — the engine's answer to the reference's
  * serving-side indexes (`sql/schema.sql` puts a B-tree on
  * `unified_companies.state`; SURVEY §4).
  *
  * In a Spark/parquet world the index is the LAYOUT:
  *  - '''Partitioned''' directories turn equality/range predicates on
  *    the partition column into partition PRUNING — the scan never
  *    opens non-matching directories (SkewBucketSpec asserts the
  *    PartitionFilters in the plan). Right for low-cardinality filter
  *    columns (state, date).
  *  - '''Bucketed''' tables pre-shuffle rows by key hash at write time:
  *    joins and aggregations on the bucket key run with NO exchange on
  *    either side (SkewBucketSpec asserts the shuffle-free sort-merge
  *    join). Right for high-cardinality join keys (abn, custkey) that
  *    are joined repeatedly — the 100 TB co-location strategy.
  *
  * Both are write-once / read-many trades: pay one clustered write,
  * save a shuffle (or most of a scan) on every subsequent query.
  */
object Layout {

  /** Write `df` partitioned by `cols` (directory-per-value). Filters on
    * `cols` prune at the directory level on read. */
  def writePartitioned(df: DataFrame, dir: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(dir)

  def readPartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Save `df` as a bucketed+sorted managed table on `key`. Subsequent
    * equi-joins/aggregations on `key` between tables bucketed with the
    * same count run shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Compact a small-files parquet directory into ~`targetBytes` output
    * files (by current on-disk size), written to `outDir`.
    *
    * The operational chore every long-running ingest leaves behind:
    * streaming/incremental writers emit a file per micro-batch per
    * partition, and a 100 TB table quietly becomes tens of millions of
    * kilobyte files — then every scan pays file-listing, footer-read
    * and task-schedule cost per file, and the NameNode/object-store
    * pays the metadata. One coalesced rewrite restores scan-sized
    * files. `coalesce` (not `repartition`) keeps it shuffle-free: it
    * only merges read-splits, at worst losing some write parallelism
    * when n is small — exactly the right trade for a compaction job. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): Long = {
    require(targetBytes > 0, "targetBytes must be positive")
    // Path.getFileSystem handles spaces/special chars a raw URI rejects
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(path).getLength
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
    require(n <= Int.MaxValue, s"$n output files exceeds Int.MaxValue — raise targetBytes")
    spark.read.parquet(inDir)
      .coalesce(n.toInt)
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
