package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Morton z-value: bit-interleave of two non-negative integer
    * dimensions (x bit b → z bit 2b, y bit b → z bit 2b+1). Rows close
    * in z are close in BOTH x and y, so sorting a table by z clusters
    * it for two-dimensional predicates at once — the multi-column
    * answer to single-key sort/bucket layout, and the same technique
    * lakehouse table formats expose as Z-ORDER clustering. Pure integer
    * arithmetic (shift/mask/add), so it is exactly reproducible in any
    * engine — query x4 oracles it bit-for-bit.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    // mask explicitly to the declared domain: without it, inputs wider
    // than `bits` would silently interleave only their low bits (rows
    // 2^bits apart collide to one z — no locality, no error) and a
    // negative input would sign-extend into the high z bits. Reduce
    // wider domains deliberately (pmod/bucketing) before calling —
    // Morton locality only exists within the masked [0, 2^bits) square.
    val m = lit((1L << bits) - 1)
    val xs = x.cast("bigint").bitwiseAND(m); val ys = y.cast("bigint").bitwiseAND(m)
    (0 until bits).map { b =>
      shiftright(xs, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(ys, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)
  }

  /** ANSI-SQL twin of [[zValue]] (DuckDB oracle). */
  def sqlZValue(x: String, y: String, bits: Int): String = {
    // same domain as the Column twin: bits=0 would emit the invalid SQL
    // "()" and bits>31 would silently diverge from the function this
    // exists to oracle
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val m = (1L << bits) - 1
    (0 until bits).map { b =>
      s"((((($x)::BIGINT & $m) >> $b) & 1) * ${1L << (2 * b)} + " +
        s"(((($y)::BIGINT & $m) >> $b) & 1) * ${1L << (2 * b + 1)})"
    }.mkString("(", " + ", ")")
  }

  /** Write `df` z-order-clustered on two integer dimensions into
    * `nFiles` range-partitioned files, each sorted by z within. Every
    * output file then covers a compact z-range — a small rectangle in
    * (x, y) — so its parquet row-group min/max stats are tight on BOTH
    * columns and a two-dimensional box predicate prunes most files and
    * row groups entirely (a single-column sort gives tight stats on one
    * dimension and full-range stats on the other; SkewBucketSpec measures
    * both layouts' per-file ranges). Write-once / read-many, like the
    * other layout writers: one ranged shuffle at write time buys stats
    * pruning on every subsequent scan. */
  def writeZOrdered(df: DataFrame, dir: String, xCol: String, yCol: String,
                    bits: Int, nFiles: Int): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)

  /** Materialize one training epoch as fixed-size parquet SHARDS in
    * the deterministic epoch order — the artifact a data loader
    * actually consumes: `shard=N` directories of `shardSize` rows
    * each (last shard short), every row carrying its global `ordinal`
    * so a crashed run resumes from an exact position and workers
    * slice the epoch without coordination. Order and shard membership
    * are functions of (key, epoch) alone
    * ([[graft.operators.Curation.epochShuffle]] +
    * [[graft.operators.Curation.globalOrdinals]]): re-running the
    * same epoch rewrites byte-identical shard contents. The write
    * itself repartitions on the shard id — each output directory is
    * produced by the tasks owning that ordinal range, no global
    * sort. */
  def writeEpochShards(df: DataFrame, dir: String, keyCol: String,
                       epoch: Int, shardSize: Long): Unit = {
    require(shardSize > 0, "shardSize must be positive")
    val ordered = graft.operators.Curation.globalOrdinals(
      graft.operators.Curation.epochShuffle(df, keyCol, epoch),
      Seq("shuffle_key", keyCol))
    ordered
      .withColumn("shard", expr(s"ordinal DIV $shardSize"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("ordinal"))
      // the artifact carries the data plus its ordinal, nothing else:
      // shuffle_key is ordering machinery, and at 100 TB an extra
      // 8-byte internal column per row in a long-lived training
      // artifact is real bloat (it re-derives from (key, epoch) when
      // needed — SkewBucketSpec does exactly that)
      .drop("shuffle_key")
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
  }

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
    // a PARTITIONED input (the writePartitioned layout this module
    // provides — and the file-per-micro-batch-per-partition case the
    // doc above motivates with) must compact back into the SAME
    // layout: a flat rewrite would demote partition columns to data
    // columns and silently destroy directory pruning for every
    // downstream reader. The exchange must NOT key on the partition
    // columns alone — that funnels every row of one partition value
    // through a single task, so a 3-value source= layout would emit 3
    // ~totalBytes/3 files from 3 straggler tasks no matter what
    // targetBytes asked for. Instead each value gets a proportional
    // file budget (row share × global bytes/row, both from metadata-
    // only scans) and a salt spreads its rows across exactly that many
    // tasks: ~targetBytes files per directory, parallel writers, and a
    // value smaller than targetBytes still compacts to one file. The
    // flat case keeps the shuffle-free coalesce.
    val parts = partitionColumnsOf(fs, path)
    val df = spark.read.parquet(inDir)
    if (parts.isEmpty) {
      df.coalesce(n.toInt).write.mode("overwrite").parquet(outDir)
      n
    } else {
      val totalRows = math.max(1L, df.count()) // parquet footer count
      val bytesPerRow = totalBytes.toDouble / totalRows
      val partCols = parts.map(col)
      val budget = df.groupBy(partCols: _*).agg(count(lit(1)).as("__rows"))
        .withColumn("__files", greatest(lit(1L),
          ceil(col("__rows") * lit(bytesPerRow) / lit(targetBytes.toDouble))
            .cast("long")))
        .drop("__rows")
      val nOut = budget.agg(sum(col("__files"))).head().getLong(0)
      require(nOut <= Int.MaxValue,
        s"$nOut output files exceeds Int.MaxValue — raise targetBytes")
      // deterministic within-value spread: hash of the data columns
      // (a partition-cols-only table has nothing to spread — one file
      // per value is already the compacted shape)
      val dataCols = df.columns.filterNot(parts.contains).map(col).toSeq
      val salt = if (dataCols.isEmpty) lit(0L)
                 else pmod(hash(dataCols: _*).cast("long"), col("__files"))
      df.join(broadcast(budget), parts)
        .withColumn("__salt", salt)
        .repartition(nOut.toInt, partCols :+ col("__salt"): _*)
        .drop("__files", "__salt")
        .write.mode("overwrite").partitionBy(parts: _*).parquet(outDir)
      nOut
    }
  }

  /** The `k=v` partition-column chain of a parquet directory, outermost
    * first — empty for a flat layout. Mirrors Spark's own partition
    * discovery on the directory names alone (one listStatus per level;
    * underscore/dot-prefixed entries like _SUCCESS are ignored, as
    * Spark ignores them). */
  private def partitionColumnsOf(fs: org.apache.hadoop.fs.FileSystem,
                                 root: org.apache.hadoop.fs.Path): Seq[String] = {
    val cols = Seq.newBuilder[String]
    var cur = root
    var done = false
    while (!done) {
      val kids = fs.listStatus(cur).filter { s =>
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
      val dirs = kids.filter(_.isDirectory).map(_.getPath.getName)
      val colNames = dirs.filter(_.contains("=")).map(_.split("=", 2)(0)).distinct
      if (colNames.length == 1 && dirs.forall(_.contains("="))) {
        cols += colNames.head
        cur = kids.filter(_.isDirectory).head.getPath
      } else done = true
    }
    cols.result()
  }
}
