package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Scale techniques the engine leans on: salting for hot keys and
  * bucketing for shuffle-free co-located joins. */
class SkewBucketSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    // one pathological key carrying 50x the tail
    val hot = (1 to 50000).map(i => ("hot", i.toLong))
    val tail = (1 to 50).flatMap(k => (1 to 1000).map(i => (s"k$k", i.toLong)))
    (hot ++ tail).toDF("key", "v")
  }

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy($"key").agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(skewed, "key", "v", 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == plain)
  }

  test("clone-mass skew: the naive salt funnels exact clones into one bucket; dedup-first collapses them and spreads") {
    // the shape saltedSumCount's KNOWN LIMITATION names: a hot key
    // whose mass is EXACT CLONES — no deterministic row function can
    // tell identical rows apart, so no salt can split them
    val clones = spark.range(20000).select(lit("hot").as("key"), lit(7L).as("v"))
    val tail = (1 to 40).flatMap(k => (1 to 25).map(i => (s"k$k", i.toLong)))
      .toDF("key", "v")
    val df = clones.unionByName(tail).repartition(8)

    // NAIVE full-row salt: all 20k clone rows carry ONE hash value —
    // the entire mass lands in a single (key, salt) bucket (= a single
    // reducer at scale), despite 16 requested buckets
    val naive = df.withColumn("_salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(16)))
    val hotDist = naive.filter($"key" === "hot").groupBy($"_salt").count().collect()
    assert(hotDist.length == 1,
      s"exact clones occupied ${hotDist.length} salts — they can only occupy one")
    assert(hotDist.head.getLong(1) == 20000, "the funnel carries the full mass")

    // DECLARED shape (cloneSaltedSumCount stage 0): the clone mass is
    // collapsed BEFORE any key-shaped shuffle — map-side partial
    // aggregation bounds reducer fan-in — and the hot key becomes ONE
    // weighted row...
    val weighted = df.groupBy(df.columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("_cnt"))
    assert(weighted.filter($"key" === "hot").count() == 1,
      "20k clones must collapse to one weighted row")
    // ...while DISTINCT rows spread: a tail key's 25 distinct values
    // occupy many salts, and no (key, salt) bucket carries more than a
    // handful of rows (vs the naive funnel's 20,000)
    val saltedDistinct = weighted.withColumn("_salt",
      pmod(hash($"key", $"v"), lit(16)))
    assert(saltedDistinct.filter($"key" === "k1")
      .select($"_salt").distinct().count() > 1,
      "distinct rows of one key must spread across salts")
    val maxBucket = saltedDistinct.groupBy($"key", $"_salt").count()
      .agg(max($"count")).head().getLong(0)
    assert(maxBucket <= 8, s"declared shape's max (key,salt) bucket is $maxBucket")

    // and the cured operator is exact: same result as the plain groupBy
    val plain = df.groupBy($"key").agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cured = Skew.cloneSaltedSumCount(df, "key", "v", 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cured == plain)
  }

  test("salted join equals plain join on a skewed fact side") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")
    val plain = skewed.join(dim, "key").groupBy($"label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(skewed, dim, "key", 8).groupBy($"label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salting rejects map-typed columns at build time") {
    // hash() has no canonical order over map entries; the operator must
    // fail loudly at build time, not with a deep analyzer error later
    val withMap = skewed.withColumn("m", map(lit("a"), $"v"))
    val e1 = intercept[IllegalArgumentException] {
      Skew.saltedSumCount(withMap, "key", "v", 4)
    }
    assert(e1.getMessage.contains("map-typed"))
    val dim = Seq(("hot", "H")).toDF("key", "label")
    val e2 = intercept[IllegalArgumentException] {
      Skew.saltedJoin(withMap, dim, "key", 4)
    }
    assert(e2.getMessage.contains("map-typed"))
    // Spark's analyzer check is recursive — a map NESTED in a struct
    // or array fails hash() too, so the build-time guard must recurse
    val nested = skewed.withColumn("meta", struct(map(lit("a"), $"v").as("tags")))
    val e3 = intercept[IllegalArgumentException] {
      Skew.saltedSumCount(nested, "key", "v", 4)
    }
    assert(e3.getMessage.contains("meta"))
    val inArray = skewed.withColumn("ms", array(map(lit("a"), $"v")))
    val e4 = intercept[IllegalArgumentException] {
      Skew.saltedSumCount(inArray, "key", "v", 4)
    }
    assert(e4.getMessage.contains("ms"))
  }

  test("partitioned layout prunes partitions under an equality filter") {
    // the reference's B-tree-on-state index analog (SURVEY §4): lay the
    // unified table out partitioned by the filter column and the scan
    // reads only the matching directory
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    graft.sources.Layout.writePartitioned(
      spark.read.parquet(s"$sf/customer.parquet")
        .selectExpr("c_custkey", "c_name", "CAST(c_nationkey AS STRING) AS state"),
      dir, "state")
    val q = graft.sources.Layout.readPartitioned(spark, dir).filter(col("state") === "7")
    val expect = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_nationkey") === 7).count()
    assert(q.count() == expect)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(state"),
      s"expected partition filter in scan:\n$scan")
    assert(scan.contains("(state") && scan.contains("= 7)"),
      s"equality should prune to the state=7 directory:\n$scan")
  }

  test("compaction merges a small-files directory, preserving rows") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact")
    val in = base.resolve("in").toString
    val out = base.resolve("out").toString
    // simulate a micro-batch-fragmented table: 40 files of ~25 rows
    spark.range(1000).selectExpr("id", "id % 7 AS k")
      .repartition(40).write.parquet(in)
    def parts(dir: String) = new java.io.File(dir)
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(parts(in) == 40)
    val n = graft.sources.Layout.compact(spark, in, out, targetBytes = 64L * 1024)
    assert(parts(out) == n && n < 40)
    val a = spark.read.parquet(in).orderBy("id").collect().map(_.getLong(0)).toSeq
    val b = spark.read.parquet(out).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("compaction preserves a partitioned layout (pruning survives)") {
    val base = java.nio.file.Files.createTempDirectory("graft-compactp")
    val in = base.resolve("in").toString
    val out = base.resolve("out").toString
    // the motivating case from compact's own doc: a file per
    // micro-batch per partition
    spark.range(300).selectExpr("id", "CAST(id % 3 AS STRING) AS state")
      .repartition(10).write.partitionBy("state").parquet(in)
    graft.sources.Layout.compact(spark, in, out, targetBytes = 1L << 20)
    // the partition directories survive the rewrite...
    val dirs = new java.io.File(out).listFiles.filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("state=0", "state=1", "state=2"),
      s"flat rewrite destroyed the partition layout: $dirs")
    // ...so a filter still prunes at the directory level
    val plan = spark.read.parquet(out).filter($"state" === "1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(state"),
      s"partition pruning lost after compaction:\n$plan")
    // rows and values intact
    assert(spark.read.parquet(out).orderBy("id").collect().map(_.getLong(0)).toSeq ==
      (0L until 300L).toSeq)
  }

  test("partitioned compaction splits a large partition value across ~targetBytes files") {
    // the scale contract the partitioned path exists for: keying the
    // exchange on the partition columns alone would write ONE file per
    // value (one straggler task each, targetBytes ignored) — a 3 TB
    // value would become a 3 TB file. Each value must spread over
    // ~size/targetBytes parallel tasks instead.
    val base = java.nio.file.Files.createTempDirectory("graft-compactw")
    val in = base.resolve("in").toString
    val out = base.resolve("out").toString
    spark.range(20000)
      .selectExpr("id", "md5(CAST(id AS STRING)) AS pad",
        "CAST(id % 2 AS STRING) AS state")
      .repartition(10).write.partitionBy("state").parquet(in)
    val n = graft.sources.Layout.compact(spark, in, out, targetBytes = 64L * 1024)
    def files(d: String) = new java.io.File(out, d).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(files("state=0") > 1 && files("state=1") > 1,
      s"a value larger than targetBytes must split: " +
        s"${files("state=0")}/${files("state=1")} files, n=$n")
    assert(n >= files("state=0") + files("state=1"),
      s"returned budget $n below written files")
    assert(spark.read.parquet(out).count() == 20000)
  }

  test("approx aggregates land within tolerance of exact values") {
    // x3's KMV estimates: k=256 → std err ~1/16, so 15% ≈ 2.4σ bound;
    // when n_distinct < k the sketch degrades to the exact count.
    val df = graft.queries.ScaleQueries.queries("x3_approx_stats")(spark, sf).head()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val exactOrders = li.select($"l_orderkey").distinct().count()
    val exactParts = li.select($"l_partkey").distinct().count()
    assert(math.abs(df.getDouble(0) - exactOrders) / exactOrders < 0.15,
      s"KMV orders ${df.getDouble(0)} vs exact $exactOrders")
    assert(math.abs(df.getDouble(1) - exactParts) / exactParts < 0.15,
      s"KMV parts ${df.getDouble(1)} vs exact $exactParts")
    val exactMedian = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.001).head
    assert(math.abs(df.getDouble(2) - exactMedian) / exactMedian < 0.02,
      s"exact median ${df.getDouble(2)} vs approxQuantile $exactMedian")
    // the engine-internal HLL++ sketch stays available for non-audited
    // paths — bound it here since x3 no longer exercises it
    val hll = li.agg(approx_count_distinct($"l_orderkey", 0.01)).head().getLong(0)
    assert(math.abs(hll - exactOrders).toDouble / exactOrders < 0.05,
      s"HLL orders $hll vs exact $exactOrders")
  }

  test("KMV estimators reject k < 2 (k = 1 estimates 0.0 for any input)") {
    val df = spark.range(10).select($"id".as("key"))
    for (bad <- Seq(0, 1)) {
      val e = intercept[IllegalArgumentException] {
        graft.operators.Sketches.kmvDistinctEstimate(df, "key", bad)
      }
      assert(e.getMessage.contains("k must be >= 2"))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Sketches.kmvGroupedDistinctEstimate(df, "key", "key", 1)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Sketches.kmvOverlapEstimate(df, df, "key", 1)
    }
  }

  test("grouped KMV estimates land within tolerance of exact per-group counts") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = graft.operators.Sketches
      .kmvGroupedDistinctEstimate(li, "l_returnflag", "l_orderkey", 128)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est.keySet == exact.keySet)
    for ((g, n) <- exact) {
      // err ~ 1/sqrt(k) ≈ 8.8%; allow 3 sigma (or exact when n < k)
      val tol = if (n < 128) 0.0 else 0.27 * n
      assert(math.abs(est(g) - n) <= math.max(tol, 0.0),
        s"group $g: est ${est(g)} vs exact $n")
    }
  }

  test("AQE splits a skewed join partition without salting, same results") {
    // the no-code-change alternative to x1/x2's salting: with skew-join
    // enabled AQE splits the hot key's oversized partition at runtime
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")
    def run(): (Long, String) = {
      val joined = skewed.join(dim, "key").groupBy($"label").count()
      val n = joined.collect().map(_.getLong(1)).sum
      (n, joined.queryExecution.executedPlan.toString)
    }
    val (nPlain, _) = run()
    val confs = Seq(
      // tiny thresholds: the fixture's hot partition is only ~100 KB
      // and shuffle compression shrinks repeated keys further
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // SMJ, so skew applies
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val (nSkew, plan) = run()
      assert(nSkew == nPlain, "skew-split run must not change results")
      assert(plan.contains("skew=true"), s"expected AQE skew-split markers in:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("KMV overlap estimate tracks the exact intersection within tolerance") {
    // two key sets with known overlap: A = 0..5999, B = 4000..9999
    // → |A∩B| = 2000, |A∪B| = 10000
    val a = (0 until 6000).map(_.toLong).toDF("key")
    val b = (4000 until 10000).map(_.toLong).toDF("key")
    val row = graft.operators.Sketches.kmvOverlapEstimate(a, b, "key", 256).head()
    val (estA, estB, estU, estI) =
      (row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
    // err ~ 1/sqrt(256) ≈ 6.3%; 3-sigma bounds (intersection compounds
    // the union estimate with the Jaccard fraction — give it 4 sigma)
    assert(math.abs(estA - 6000) < 0.19 * 6000, s"est_a $estA")
    assert(math.abs(estB - 6000) < 0.19 * 6000, s"est_b $estB")
    assert(math.abs(estU - 10000) < 0.19 * 10000, s"est_union $estU")
    assert(math.abs(estI - 2000) < 0.25 * 2000, s"est_inter $estI")
  }

  test("sided KMV overlap is bitwise the two-frame form (incl. overlap, empty side, all-one-side)") {
    // the one-scan x7 form must produce the IDENTICAL row: same
    // bottom-k sets -> same estimates, bit for bit
    val rng = new scala.util.Random(23)
    val cases = Seq(
      // random overlap, estimated regime (union > k at k=16)
      (rng.shuffle((0 until 400).toList).take(120).map(_.toLong),
        rng.shuffle((0 until 400).toList).take(150).map(_.toLong)),
      // exact regime (union < k at k=256)
      ((0L until 60L).toList, (40L until 90L).toList),
      // one side empty
      ((0L until 50L).toList, List.empty[Long]))
    for ((aKeys, bKeys) <- cases; k <- Seq(16, 256)) {
      val two = graft.operators.Sketches.kmvOverlapEstimate(
        aKeys.toDF("key"), bKeys.toDF("key"), "key", k).head()
      val tagged = (aKeys.map(x => (x, true)) ++ bKeys.map(x => (x, false)))
        .toDF("key", "is_a")
      val one = graft.operators.Sketches.kmvOverlapEstimateSided(
        tagged, "key", $"is_a", k).head()
      assert(two == one, s"sided diverged at k=$k: two=$two one=$one")
    }
  }

  test("zValue roundtrips: deinterleaving recovers (x, y) for random inputs") {
    val rng = new scala.util.Random(7)
    val bits = 10
    val pts = Seq.fill(200)((rng.nextInt(1024).toLong, rng.nextInt(1024).toLong))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", graft.sources.Layout.zValue($"x", $"y", bits).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val dx = (0 until bits).map(b => ((z >> (2 * b)) & 1L) << b).sum
      val dy = (0 until bits).map(b => ((z >> (2 * b + 1)) & 1L) << b).sum
      assert(dx == x && dy == y, s"z=$z deinterleaved to ($dx,$dy), want ($x,$y)")
    }
  }

  test("KMV overlap is EXACT when the union fits the sketch") {
    // below k nothing is estimated: every hash survives, so all four
    // outputs are exact integers — the property that keeps small-SF
    // oracle tests honest and gives calibrated behavior at the tail
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 5) {
      val a = rng.shuffle((0 until 300).toList).take(rng.nextInt(80) + 20).map(_.toLong)
      val b = rng.shuffle((0 until 300).toList).take(rng.nextInt(80) + 20).map(_.toLong)
      val row = graft.operators.Sketches.kmvOverlapEstimate(
        a.toDF("key"), b.toDF("key"), "key", 256).head()
      assert(row.getDouble(0) == a.toSet.size.toDouble)
      assert(row.getDouble(1) == b.toSet.size.toDouble)
      assert(row.getDouble(2) == (a.toSet ++ b.toSet).size.toDouble)
      assert(row.getDouble(3) == a.toSet.intersect(b.toSet).size.toDouble)
    }
  }

  test("zValue interleaves bits exactly") {
    // x=3 (0b011) → z bits 0,2; y=5 (0b101) → z bits 1,5:
    // z = 1 + 4 + 2 + 32 = 39
    val got = Seq((3L, 5L)).toDF("x", "y")
      .select(graft.sources.Layout.zValue($"x", $"y", 3)).as[Long].head()
    assert(got == 39L)
    // single-bit sanity: (1,0)→1, (0,1)→2, (1,1)→3
    val basics = Seq((1L, 0L), (0L, 1L), (1L, 1L)).toDF("x", "y")
      .select(graft.sources.Layout.zValue($"x", $"y", 1)).as[Long].collect().toSeq
    assert(basics == Seq(1L, 2L, 3L))
  }

  test("z-ordered layout bounds BOTH dimensions per file; single-key sort only one") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(pmod($"o_custkey", lit(1024)).cast("bigint").as("x"),
        pmod(datediff($"o_orderdate".cast("date"),
          lit("1970-01-01").cast("date")).cast("bigint"), lit(1024)).as("y"))
    def perFileRanges(dir: String): Seq[(Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max($"x") - min($"x")).as("xr"), (max($"y") - min($"y")).as("yr"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString
    graft.sources.Layout.writeZOrdered(o, zDir, "x", "y", bits = 10, nFiles = 16)
    val xDir = java.nio.file.Files.createTempDirectory("graft-xsort").toString
    o.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(xDir)
    val zr = perFileRanges(zDir)
    val xr = perFileRanges(xDir)
    def avg(s: Seq[Long]) = s.sum.toDouble / s.size
    // a contiguous z-range covers a compact rectangle: BOTH per-file
    // extents stay well under the 1024 global range...
    assert(avg(zr.map(_._1)) < 700, s"z-layout x-extent too wide: $zr")
    assert(avg(zr.map(_._2)) < 700, s"z-layout y-extent too wide: $zr")
    // ...while the x-sorted layout leaves the un-sorted dimension at
    // effectively full range per file (no pruning power on y)
    assert(avg(xr.map(_._2)) > 900, s"x-sort y-extent unexpectedly tight: $xr")
    assert(avg(zr.map(_._2)) < avg(xr.map(_._2)) / 2,
      "z-order should at least halve the unsorted dimension's per-file extent")
  }

  test("z-ordered layout prunes row groups under a 2-D box predicate") {
    // the payoff measurement for writeZOrdered: parquet min/max stats
    // skip whole row groups, so a box predicate on BOTH dimensions
    // reads fewer rows from the z-clustered layout than from a
    // single-key sort (which only bounds one dimension per file)
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(pmod($"o_custkey", lit(1024)).cast("bigint").as("x"),
        pmod(datediff($"o_orderdate".cast("date"),
          lit("1970-01-01").cast("date")).cast("bigint"), lit(1024)).as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("graft-zprune").toString
    graft.sources.Layout.writeZOrdered(o, zDir, "x", "y", bits = 10, nFiles = 16)
    val xDir = java.nio.file.Files.createTempDirectory("graft-xprune").toString
    o.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(xDir)
    def rowsRead(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
        .filter($"x".between(100, 227) && $"y".between(300, 427))
      // drive THIS queryExecution (count() would execute a separate
      // plan instance whose metrics we couldn't read)
      val n = df.collect().length.toLong
      val scan = df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
        .get
      (scan.metrics("numOutputRows").value, n)
    }
    val total = o.count()
    val (zScan, zHits) = rowsRead(zDir)
    val (xScan, xHits) = rowsRead(xDir)
    assert(zHits == xHits, "both layouts must return the same matching rows")
    // x-sort prunes on x only (~1/8 of files); z-order prunes on both
    assert(zScan < xScan,
      s"z-order should read fewer rows than single-key sort ($zScan vs $xScan)")
    assert(zScan < total / 2, s"z-order scan read $zScan of $total rows")
  }

  test("bucketed tables join without a shuffle exchange") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    graft.sources.Layout.writeBucketed(o, "orders_b", 8, "o_custkey")
    graft.sources.Layout.writeBucketed(c, "customer_b", 8, "c_custkey")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("epoch shards: fixed-size, ordinal-complete, byte-reproducible") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-shards")
    val dir = base.resolve("ep2").toString
    val docs = (1L to 337L).toDF("doc_id")
    graft.sources.Layout.writeEpochShards(docs, dir, "doc_id",
      epoch = 2, shardSize = 64)
    val out = spark.read.parquet(dir)
      .select($"doc_id", $"ordinal", $"shard".cast("long"))
      .as[(Long, Long, Long)].collect()
    // the artifact carries the data plus its ordinal, nothing else —
    // no internal ordering machinery leaks into the persisted shards
    assert(spark.read.parquet(dir).columns.toSet ==
      Set("doc_id", "ordinal", "shard"))
    // complete and disjoint: ordinals are exactly 0..n-1, rows preserved
    assert(out.map(_._2).sorted.toSeq == (0L until 337L).toSeq)
    assert(out.map(_._1).sorted.toSeq == (1L to 337L).toSeq)
    // every shard holds shardSize rows (last one short), membership =
    // ordinal DIV shardSize
    assert(out.forall { case (_, ord, sh) => sh == ord / 64 })
    val sizes = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert((0L to 4L).forall(sizes(_) == 64) && sizes(5L) == 17)
    // the order is the epoch-2 permutation: re-deriving it from the
    // KEYS ALONE (not from anything stored in the artifact) matches
    // the written ordinals — the reproducible-resume contract
    val keyed = graft.operators.Curation.epochShuffle(docs, "doc_id", 2)
      .select($"doc_id", $"shuffle_key").as[(Long, Long)].collect()
    val want = keyed.map(r => (r._2, r._1)).sorted.zipWithIndex
      .map { case ((_, id), i) => id -> i.toLong }.toMap
    assert(out.forall { case (id, ord, _) => want(id) == ord })
  }
}
