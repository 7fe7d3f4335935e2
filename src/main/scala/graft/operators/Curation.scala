package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Dataset-curation operators for a training-data pipeline: split
  * assignment, stratified sampling, benchmark decontamination, and
  * sequence packing. All deterministic (md5-keyed, no RNG state), so
  * runs are reproducible and restartable — the property that matters
  * when a 100 TB curation job fails at hour nine and must resume
  * without reshuffling examples between train and test.
  */
object Curation {

  /** Deterministic train/val/test split: bucket = 60-bit md5 of the key
    * mod `buckets`, split by cumulative per-mille thresholds. Pure
    * narrow map — no shuffle, no sampling state, stable under
    * re-partitioning and incremental appends (a new row's split never
    * depends on what else is in the dataset).
    */
  /** NULL keys hash to a NULL bucket and fall through to "test" —
    * deterministic quarantine away from training data, pinned by
    * CurationSpec. Callers with a better key should coalesce first
    * (p8/u5 use coalesce(cluster, doc_id)). */
  def hashSplit(df: DataFrame, keyCol: String, buckets: Int = 1000,
                trainUpto: Int = 800, valUpto: Int = 900): DataFrame = {
    // loud shape errors: buckets=0 would DIVIDE_BY_ZERO mid-query under
    // ANSI, and thresholds outside [0, buckets] silently mislabel — a
    // buckets=100 with the default 800/900 puts EVERY row in train,
    // which in a decontamination pipeline is silent test contamination
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(0 <= trainUpto && trainUpto <= valUpto && valUpto <= buckets,
      s"split thresholds must satisfy 0 <= trainUpto <= valUpto <= buckets, " +
        s"got trainUpto=$trainUpto valUpto=$valUpto buckets=$buckets")
    val b = Hashing.hash64(col(keyCol).cast("string")) % buckets
    df.withColumn("bucket", b.cast("int"))
      .withColumn("split",
        when(col("bucket") < trainUpto, "train")
          .when(col("bucket") < valUpto, "val")
          .otherwise("test"))
  }

  /** Deterministic per-epoch corpus shuffle: a fixed pseudo-random
    * permutation keyed by `md5(key || ':' || epoch)` — every epoch is a
    * DIFFERENT uniform order, every re-run of the same epoch is the
    * SAME order (resume a crashed epoch mid-stream, replay a training
    * run bit-exactly, shard deterministically across workers). The
    * `shuffle_key` column is a narrow map; materializing the order is
    * one range exchange (`repartitionByRange` + sort within, the
    * writeZOrdered shape) — never a single-task global sort.
    *
    * The 60-bit hash CAN collide once the corpus reaches billions of
    * keys (birthday bound ~2^30), so consumers must tie-break on the
    * key column when ordering — `ORDER BY shuffle_key, key` — or the
    * tied rows' relative order depends on input partitioning and the
    * replay guarantee is lost (query p7 and CurationSpec both order
    * that way).
    */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Int): DataFrame =
    df.withColumn("shuffle_key",
      Hashing.hash64(concat(col(keyCol).cast("string"), lit(":" + epoch))))

  /** Deterministic 0-based GLOBAL ordinal by `orderCols` without a
    * single-task global sort — the number a training loader needs to
    * cut an epoch order into fixed-size shards ("rows 0..N of epoch e")
    * and to seek back to an exact resume point. A plain
    * `row_number() OVER (ORDER BY ...)` plans as one partition holding
    * the whole corpus; this is the two-stage form: range-partition on
    * the order keys (partition p holds a contiguous key range below
    * partition p+1), rank locally, and add per-partition offsets
    * computed from an O(partitions)-row aggregate whose running sum is
    * a window over that TINY frame, broadcast back onto the stream.
    * The result is independent of the partition count (ForcedShuffle
    * sweeps pin that), because the ordinal is just the global rank.
    *
    * `orderCols` must be ties-free as a combination (append a unique id
    * as the last column — p9 orders by `(shuffle_key, doc_id)`), or
    * ties get an arbitrary stable-within-run ordinal. */
  def globalOrdinals(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val keys = orderCols.map(col(_).asc)
    // the eager checkpoint FREEZES one physical partitioning before
    // __pid is read from two subtrees — without it, AQE partition
    // coalescing or independent range-boundary sampling can give the
    // offset aggregate and the rank stream DIFFERENT pids for the same
    // row, silently corrupting every ordinal (RDD zipWithIndex runs
    // its count job against materialized partitions for the same
    // reason)
    // (Materialize.once — on a cluster the frozen partitioning must
    // also survive executor loss by RECOMPUTE, which replays the same
    // range-shuffle dependency and so the same pids)
    val ranged = Materialize.once(df.repartitionByRange(keys: _*)
      .withColumn("__pid", spark_partition_id()))
    val offsets = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    val local = Window.partitionBy(col("__pid")).orderBy(keys: _*)
    ranged.withColumn("__rk", row_number().over(local))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("ordinal", col("__offset") + col("__rk") - 1)
      .drop("__pid", "__rk", "__offset")
  }

  /** Deterministic weighted Bernoulli sample: keep a row iff
    * `md5(key) % denom < weight`, i.e. with probability weight/denom —
    * integer arithmetic end to end, so it is exactly reproducible and
    * oracle-able (no FP pow/log as in exponential-rank weighting).
    * The shape quality-weighted corpus sampling wants: upweight good
    * documents without any global pass or sampling state; a narrow map,
    * zero shuffle. */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
                     denom: Int): DataFrame = {
    require(denom > 0, "denom must be positive")
    df.filter(Hashing.hash64(col(keyCol).cast("string")) % denom < weight)
  }

  /** Deterministic source-mix balancing: downsample every source to the
    * token budget of the SMALLEST source, so no domain dominates the
    * training mix. Each row is kept iff `md5(id) % src_total < target`
    * where `src_total` is its source's token sum and `target` the
    * global minimum — i.e. with probability target/src_total, giving
    * every source ≈`target` expected surviving tokens. Integer
    * arithmetic end to end; the per-source totals and the global min
    * are in-plan aggregates joined back via broadcast (a handful of
    * rows), so the corpus itself is touched in one linear pass.
    *
    * A NULL source is a legal group: the null-safe join keeps its rows
    * in the mix (a plain using-join would count them toward the global
    * minimum and then silently DROP them — the worst of both), and
    * like any smallest source it participates in the min. Callers with
    * unattributed rows that should not set the budget must coalesce a
    * fallback source first (the [[hashSplit]] advice).
    *
    * @param weight per-row token count (any positive integral column)
    * @return input rows that survive, plus `src_total` and `target`
    */
  def balanceSources(df: DataFrame, srcCol: String, idCol: String,
                     weight: Column): DataFrame = {
    val weighted = df.withColumn("__w", weight.cast("long"))
    val totals = weighted.groupBy(col(srcCol).as("__src"))
      .agg(sum(col("__w")).as("src_total"))
    val target = totals.agg(min(col("src_total")).as("target"))
    weighted
      .join(broadcast(totals.crossJoin(target)), col(srcCol) <=> col("__src"))
      // a source with no positive mass cannot be balanced against: a
      // zero total would DIVIDE_BY_ZERO under ANSI (or, pre-ANSI,
      // set target=0 and silently EMPTY the whole corpus), and an
      // all-NULL-weight source would both skip the budget min and
      // NULL-drop its own rows. Loud, naming the source — callers
      // filter empty sources (or fix weights) first. The guard lives
      // inside the filter so pruning cannot remove it.
      .filter(
        when(col("src_total").isNull || col("src_total") <= 0,
          raise_error(concat(
            lit("balanceSources: source has no positive weight mass " +
              "(src_total="), col("src_total").cast("string"),
            lit(") for source="), coalesce(col(srcCol).cast("string"), lit("NULL")),
            lit(" — filter empty sources or fix the weight column first")))
            .cast("boolean"))
          .otherwise(Hashing.hash64(col(idCol).cast("string")) % col("src_total")
            < col("target")))
      .drop("__w", "__src")
  }

  /** Per-group EXACT discrete percentile via the histogram two-stage:
    * aggregate rows to a (group, value) → count histogram first, then
    * run the cumulative window over THAT — a table bounded by
    * #groups × #distinct-values, not by corpus rows. The naive
    * formulation (a window over raw rows partitioned by group) sorts
    * whole sources inside single tasks and dies of skew at 100 TB; the
    * histogram never does, and `percentile_disc` over integers needs no
    * interpolation so the result is integer-exact cross-engine.
    *
    * Threshold = smallest value v with cdf(v) >= pct% of the group
    * (inclusive-rank percentile_disc). All-integer comparison
    * `cum * 100 >= pct * total` — no doubles anywhere.
    *
    * @return one row per group: (groupCol, threshold)
    */
  def percentileDisc(df: DataFrame, groupCol: String, valueCol: String,
                     pct: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pct >= 1 && pct <= 100, "pct in 1..100")
    // NULL values are not observations: percentile_disc ignores them in
    // every engine, and counting them here would both shift the
    // threshold below the true percentile AND diverge between engines
    // (Spark's ASC window sorts NULLS FIRST, DuckDB's NULLS LAST). A
    // group whose values are all NULL gets no threshold row.
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    hist
      .withColumn("__cum", sum(col("__n")).over(w))
      .withColumn("__tot", sum(col("__n")).over(wAll))
      .filter(col("__cum") * 100 >= lit(pct.toLong) * col("__tot"))
      .groupBy(col(groupCol))
      .agg(min(col("__v")).as("threshold"))
  }

  /** Flag rows whose value exceeds their group's exact pct-percentile —
    * the per-source length-outlier gate (truncation artifacts, merged
    * pages, runaway boilerplate). The per-group thresholds are a tiny
    * broadcast table; the corpus is touched in one linear pass. */
  def lengthOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     pct: Int): DataFrame = {
    // null-safe LEFT join: percentileDisc emits a threshold row for a
    // NULL group (so its rows must receive their flag — a plain
    // using-join would drop them unexamined) but emits NO row for a
    // group whose values are all NULL — those rows survive with a NULL
    // threshold and NULL flag instead of silently vanishing
    val th = percentileDisc(df, groupCol, valueCol, pct)
      .withColumnRenamed(groupCol, "__g")
    df.join(broadcast(th), col(groupCol) <=> col("__g"), "left")
      .withColumn("is_outlier", col(valueCol).cast("long") > col("threshold"))
      .drop("__g")
  }

  /** Deterministic stratified sample: k rows per stratum, chosen by
    * md5-hash order (a fixed uniform permutation), tie-broken on the
    * key for exactness.
    *
    * A naive rank funnels every row of a stratum through one window
    * partition — a 100 TB stratum becomes a single-task sort. Instead,
    * the k survivors are pre-located with a hash-bucket histogram
    * (the [[percentileDisc]] two-stage trick): hash64 is uniform on
    * [0, 2^60), so bucket = hash DIV 2^50 gives 1024 equal-width
    * buckets; a partial-agg histogram per stratum finds the smallest
    * bucket edge whose cumulative count reaches k, and only rows in
    * buckets up to that edge enter the rank window — expected
    * k + |stratum|/1024 rows instead of |stratum|. The filter keeps
    * WHOLE buckets, so every row that could rank ≤ k survives and the
    * emitted rows AND their rk values are bit-identical to the
    * unfiltered rank (p2's oracle runs the plain window form).
    * Strata smaller than k fall back to their max bucket (all rows).
    */
  def stratifiedSample(df: DataFrame, stratumCols: Seq[String], keyCol: String,
                       k: Int): DataFrame = {
    val strata = stratumCols.map(col)
    val bucketed = df.withColumn("__h", Hashing.hash64(col(keyCol).cast("string")))
      .withColumn("__b", expr(s"__h DIV ${1L << 50}"))
    val wCum = Window.partitionBy(strata: _*).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // histogram + cumulative edge: O(strata × 1024) rows, broadcastable
    val edges = bucketed.groupBy(strata :+ col("__b"): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__cum", sum(col("__n")).over(wCum))
      .groupBy(strata: _*)
      .agg(coalesce(min(when(col("__cum") >= k, col("__b"))), max(col("__b")))
        .as("__edge"))
    val w = Window.partitionBy(strata: _*)
      .orderBy(col("__h").asc, col(keyCol).asc)
    // null-safe join: a null stratum is a legal window group and must
    // keep its rows (a plain using-join would silently drop them)
    val keyed = edges.select(stratumCols.zipWithIndex.map {
      case (c, i) => col(c).as(s"__s$i") } :+ col("__edge"): _*)
    val cond = stratumCols.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"__s$i") }.reduce(_ && _)
    bucketed.join(broadcast(keyed), cond)
      // null hashes (NULL keyCol) sort FIRST in the rank window, so
      // those rows can hold ranks <= k — the bucket prefilter must
      // keep them (their __b is null, which a bare <= would drop,
      // silently diverging from the plain-window oracle)
      .filter(col("__b").isNull || col("__b") <= col("__edge"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(df.columns.map(col) :+ col("rk"): _*)
  }

  /** Benchmark decontamination: flag training documents sharing any
    * word k-gram with a held-out set. Both sides shingle to k-grams,
    * reduce each gram to a 60-bit md5 (8-byte join keys instead of
    * strings in the shuffle), distinct per document, and inner-join on
    * the gram hash; output = per-train-doc overlap counts.
    *
    * Scale shape: |test| k-grams is benchmark-sized (millions), so the
    * join side is broadcastable in a real deployment; the train side
    * streams through as explode → distinct → join → partial-agg count.
    * No pair enumeration ever materializes doc×doc.
    */
  def decontaminate(train: DataFrame, test: DataFrame, idCol: String,
                    textCol: String, k: Int): DataFrame = {
    // one-pass native shingle-hash kernel (value-identical to the
    // declarative shingles→hash64%M31 chain the oracle mirrors — the
    // same kernel/twin pair DedupSpec property-checks for d2)
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol),
          explode(graft.plans.ShingleHashes64.column(col(textCol), k)).as("gh"))
        .distinct()
    // the test side only needs the gram set — one distinct on gh alone,
    // not a per-doc distinct followed by a second one
    val testGrams = test
      .select(explode(graft.plans.ShingleHashes64.column(col(textCol), k)).as("gh"))
      .distinct()
    grams(train)
      .join(testGrams, "gh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Bloom-pre-filtered decontamination — output-identical to
    * [[decontaminate]] (a Bloom filter admits no false negatives, and
    * the exact gram join removes its false positives), but the
    * corpus-side gram stream is cut map-side BEFORE any exchange: the
    * held-out gram set aggregates into one Bloom sketch that reaches
    * the probe as a scalar subquery (the same shape Spark's own
    * InjectRuntimeFilter produces), so at 100 TB the distinct/join
    * shuffle carries only true overlaps + fpp × stream instead of
    * every distinct train gram. `expectedGrams` sizes the sketch to
    * the held-out side, which is benchmark-sized by construction.
    */
  def decontaminateBloom(train: DataFrame, test: DataFrame, idCol: String,
                         textCol: String, k: Int,
                         expectedGrams: Long = 1L << 22): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ExprBridge
    def xx(c: org.apache.spark.sql.Column) =
      new XxHash64(Seq(ExprBridge.toExpression(c)))
    val testGrams = test
      .select(explode(graft.plans.ShingleHashes64.column(col(textCol), k)).as("gh"))
      .distinct()
    val bloom = testGrams.agg(ExprBridge.toColumn(
      new BloomFilterAggregate(xx(col("gh")), expectedGrams)
        .toAggregateExpression()).as("bf")).scalar()
    // explode → bloom-probe → distinct: the probe is a narrow filter on
    // the map side of the distinct's exchange (PlanSpec pins this), and
    // filter-then-distinct ≡ distinct-then-filter for a per-row predicate
    train.select(col(idCol),
        explode(graft.plans.ShingleHashes64.column(col(textCol), k)).as("gh"))
      .filter(ExprBridge.toColumn(
        BloomFilterMightContain(ExprBridge.toExpression(bloom), xx(col("gh")))))
      .distinct()
      .join(testGrams, "gh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Sequential token packing: concatenate documents in a stable order
    * into fixed token-budget bins — `bin = floor(cum_tokens_before /
    * budget)`, the streaming packer a tokenize-and-concat pretraining
    * loader uses (a document may straddle its bin boundary; bins are
    * closed by budget, not by document edges). Windowed per partition
    * column so the cumsum never becomes a single global sort at scale.
    */
  def packSequential(df: DataFrame, partCol: String, orderCol: String,
                     tokensCol: String, budget: Long): DataFrame = {
    // DIV 0 would yield NULL bins silently in non-ANSI mode
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_before",
        (sum(col(tokensCol)).over(w) - col(tokensCol)).cast("long"))
      // token counts are non-negative, so integral DIV == floor — and
      // stays exact where floor(double / budget) would drift past 2^53
      .withColumn("bin", expr(s"cum_before DIV $budget"))
  }

  /** Temperature-based source-mix resampling (the T5/PaLM mixing rule
    * at alpha = 1/2): a source with n_s rows keeps each row with
    * probability sqrt(min_n / n_s) — sampling proportional to
    * n_s^alpha, normalized so the SMALLEST source keeps everything.
    * Softer than [[balanceSources]] (which flattens every source to the
    * minimum): large sources still contribute more rows, just
    * sub-linearly, which is how production training mixes temper
    * dominant web domains without discarding them.
    *
    * Deterministic and cross-engine exact despite the fractional
    * probability: keep iff `md5(id) % scale < floor(scale *
    * sqrt(min_n / n_s))`. Division, sqrt, and the product are each
    * correctly-rounded IEEE-754 double ops (bit-identical in any
    * engine), floor lands on an exact integer threshold, and the hash
    * is md5. Per-source counts and the global min are in-plan broadcast
    * aggregates ([[balanceSources]] shape); the corpus is touched in
    * one linear pass, no shuffle of the data rows.
    */
  def temperatureMix(df: DataFrame, srcCol: String, idCol: String,
                     scale: Int = 1000000): DataFrame = {
    require(scale > 0, "scale must be positive")
    // null-safe join: a NULL source is a legal group and keeps its rows
    // (kept whole, as the smallest source) — a plain using-join would
    // let it set min_n and then silently drop its rows (see
    // balanceSources; coalesce a fallback source upstream if
    // unattributed rows should not set the budget)
    val totals = df.groupBy(col(srcCol).as("__src")).agg(count(lit(1)).as("src_n"))
    val minN = totals.agg(min(col("src_n")).as("min_n"))
    df.join(broadcast(totals.crossJoin(minN)), col(srcCol) <=> col("__src"))
      .withColumn("keep_threshold",
        floor(lit(scale.toLong).cast("double") *
          sqrt(col("min_n").cast("double") / col("src_n").cast("double")))
          .cast("long"))
      .filter(Hashing.hash64(col(idCol).cast("string")) % scale
        < col("keep_threshold"))
      .drop("__src")
  }

  /** Sliding-window chunking of documents into fixed-size training
    * sequences: chunk i starts at token i·stride and carries up to
    * `chunkSize` tokens (stride < chunkSize ⇒ overlapping context, the
    * standard embedding/training windowing). Trailing starts whose
    * window adds no token beyond the previous chunk are dropped
    * (`s == 0 OR s + chunkSize − stride < n`); because that predicate
    * is monotone in s, surviving starts are exactly the prefix
    * 0, stride, 2·stride, … and chunk_idx = s DIV stride.
    *
    * Purely narrow compute — the explode is linear in emitted chunks
    * and there is NO exchange anywhere: a 100 TB corpus chunks at scan
    * speed and writes back partition-local.
    *
    * A NULL text yields NO chunks (the isNotNull filter below) —
    * without it, the s=0 start survives the monotone predicate and a
    * phantom (chunk_idx=0, NULL tokens, NULL text) row reaches the
    * training loader.
    *
    * @return (idCol, chunk_idx, n_chunk_tokens, chunk_text)
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    df.withColumn("__toks", Hashing.tokens(col(textCol)))
      .filter(col("__toks").isNotNull)
      .withColumn("__n", size(col("__toks")))
      // kernel: the declarative filter(sequence(...)) ran its lambda
      // interpreted per candidate start (~n/stride per doc) and
      // materialized the unfiltered sequence; ChunkStartsExpr emits the
      // kept starts in one pass (twin pinned in CurationSpec)
      .withColumn("__s", explode(
        graft.plans.TokenExprs.chunkStarts(col("__n"), chunkSize, stride)))
      .withColumn("__chunk", slice(col("__toks"), col("__s") + 1, lit(chunkSize)))
      .select(col(idCol),
        expr(s"__s DIV $stride").cast("int").as("chunk_idx"),
        size(col("__chunk")).as("n_chunk_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }
}
