package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing
import graft.model.Tables
import graft.operators.Curation

/** Dataset-curation operators over the documents corpus: deterministic
  * split assignment (P-1), stratified sampling (P-2), benchmark
  * decontamination (C-1), repetition signals (T-6), and sequence
  * packing (K-1). All md5-keyed/deterministic, so each query carries a
  * full DuckDB hash oracle.
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  val queries: Map[String, Q] = Map(
    // P-1: hash-bucketed train/val/test split — narrow map, no RNG
    "p1_hash_split" -> ((s, d) =>
      Curation.hashSplit(t(s, d, "documents"), "doc_id")
        .select(col("doc_id"), col("bucket"), col("split"))
        .orderBy(col("doc_id"))),

    // P-2: 5 docs per source stratum in md5-permutation order
    "p2_stratified_sample" -> ((s, d) =>
      Curation.stratifiedSample(t(s, d, "documents"), Seq("source"), "doc_id", 5)
        .select(col("doc_id"), col("source"), col("rk"))
        .orderBy(col("source"), col("rk"))),

    // P-3: quality-weighted Bernoulli sample — keep probability q/100,
    // integer arithmetic, zero shuffle
    "p3_weighted_sample" -> ((s, d) => {
      val scored = t(s, d, "documents")
        .select(col("doc_id"),
          graft.functions.TextStats.qualityScore(col("text")).as("q"))
      Curation.weightedSample(scored, "doc_id", col("q"), denom = 100)
        .orderBy(col("doc_id"))
    }),

    // P-4: source-mix balancing — every source downsampled to the token
    // budget of the smallest source via deterministic hash thresholding;
    // totals + global min are broadcast aggregates
    "p4_source_balance" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
        size(Hashing.tokens(col("text"))).cast("long").as("n_tokens"))
      Curation.balanceSources(docs, "source", "doc_id", col("n_tokens"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("src_total"), col("target"))
        .orderBy(col("doc_id"))
    }),

    // P-6: temperature-based source mixing (alpha = 1/2) — each source
    // keeps rows with probability sqrt(min_n / n_s): softer than p4's
    // flatten-to-min; deterministic via the integer hash threshold
    // (sqrt/division/product are correctly-rounded IEEE doubles in both
    // engines, so the floored threshold is bit-identical)
    // (the corpus's `source` strata are uniform — 25 docs each — which
    // would make the mix an identity; a derived 60/30/10 stratum makes
    // the sqrt thresholds real: sqrt(1/6) ≈ .408, sqrt(1/3) ≈ .577, 1)
    "p6_temperature_mix" -> ((s, d) =>
      Curation.temperatureMix(
          t(s, d, "documents").select(col("doc_id"),
            when(col("doc_id") % 10 < 6, "web")
              .when(col("doc_id") % 10 < 9, "books")
              .otherwise("code").as("mix_src")),
          "mix_src", "doc_id")
        .select(col("doc_id"), col("mix_src"), col("src_n"),
          col("min_n"), col("keep_threshold"))
        .orderBy(col("doc_id"))),

    // P-7: deterministic per-epoch shuffle — epoch 1's first 100 docs
    // in the fixed md5-keyed permutation order (reproducible training
    // order: re-runs and resumes see the identical sequence; the next
    // epoch is a different uniform order). TakeOrdered at the limit —
    // no global sort materializes for a head slice.
    "p7_epoch_shuffle" -> ((s, d) =>
      Curation.epochShuffle(
          t(s, d, "documents").select(col("doc_id")), "doc_id", epoch = 1)
        .orderBy(col("shuffle_key"), col("doc_id"))
        .limit(100)),

    // P-9: epoch order → GLOBAL ordinals → fixed-size shards, without
    // a single-task global sort: range-partition on the order keys,
    // rank locally, add tiny broadcast per-partition offsets. The
    // number a training loader needs to cut epoch 2 into 64-doc shards
    // and resume from an exact position. Ordered by (shuffle_key,
    // doc_id) — the tie-break p7's 60-bit-collision note requires.
    "p9_epoch_ordinals" -> ((s, d) =>
      Curation.globalOrdinals(
          Curation.epochShuffle(
            t(s, d, "documents").select(col("doc_id")), "doc_id", epoch = 2),
          Seq("shuffle_key", "doc_id"))
        .select(col("doc_id"), col("shuffle_key"), col("ordinal"),
          expr("ordinal DIV 64").as("shard"))
        .orderBy(col("doc_id"))),

    // K-2: sliding-window chunking into training sequences (32-token
    // chunks, stride 24) — narrow per-row explode, zero exchanges
    "k2_chunk_documents" -> ((s, d) =>
      Curation.chunkDocuments(
          t(s, d, "documents").select(col("doc_id"), col("text")),
          "doc_id", "text", chunkSize = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // P-5: per-source length-outlier gate — exact discrete 90th
    // percentile via the (source, length) histogram two-stage, never a
    // window over raw rows
    "p5_length_outliers" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
        size(Hashing.tokens(col("text"))).as("n_tokens"))
      Curation.lengthOutliers(docs, "source", "n_tokens", 90)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("threshold"), col("is_outlier"))
        .orderBy(col("doc_id"))
    }),

    // C-1: word-3-gram overlap of train docs against the held-out set
    // (doc_id % 97 == 0) — explode → hash → distinct → semi-shaped join,
    // never doc×doc
    "c1_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Curation.decontaminate(
          Tables.spread(docs.filter(col("doc_id") % 97 =!= 0)),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", k = 3)
        .orderBy(col("doc_id"))
    }),

    // C-4: the same decontamination through the Bloom-pre-filtered
    // scale path — output-identical to c1 by construction (no false
    // negatives; exact join kills false positives), so it shares c1's
    // oracle verbatim; what changes is the plan: the corpus gram
    // stream is probed against a scalar-subquery Bloom sketch before
    // any exchange
    "c4_bloom_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Curation.decontaminateBloom(
          Tables.spread(docs.filter(col("doc_id") % 97 =!= 0)),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", k = 3, expectedGrams = 1L << 18)
        .orderBy(col("doc_id"))
    }),

    // T-6: repetition quality signal — duplicate-token fraction
    "t6_repetition" -> ((s, d) => {
      val w = split(col("text"), " ")
      t(s, d, "documents")
        .select(col("doc_id"), size(w).as("n_words"),
          size(array_distinct(w)).as("n_distinct"))
        .withColumn("dup_frac",
          lit(1.0) - col("n_distinct").cast("double") / col("n_words"))
        .orderBy(col("doc_id"))
    }),

    // U-3: the curation pipeline end-to-end — classify + quality-score
    // every doc, drop low-quality, keep-first dedup on a 60-bit content
    // hash, hash-split, then per-(split, class) corpus stats. Every
    // stage is linear: narrow maps + one window + one partial-agg.
    // The corpus is unioned with exact copies (ids + 100000) so the
    // dedup stage provably REMOVES rows (lowest doc_id survives).
    "u3_curation_pipeline" -> ((s, d) => {
      val base = t(s, d, "documents").select(col("doc_id"), col("text"))
      val withCopies = base.unionByName(
        base.select((col("doc_id") + 100000).as("doc_id"), col("text")))
      val scored = Tables.spread(withCopies)
        .select(col("doc_id"),
          graft.functions.TextStats.classify(col("text")).as("cls"),
          graft.functions.TextStats.qualityScore(col("text")).as("q"),
          size(split(col("text"), " ")).as("n_tokens"),
          Hashing.hash64(col("text")).as("content_hash"))
      val deduped = graft.operators.Dedup.keepFirst(
        scored.filter(col("q") >= 40), "content_hash", "doc_id")
      Curation.hashSplit(deduped, "doc_id")
        .groupBy(col("split"), col("cls"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
          sum(col("q").cast("long")).as("sum_q"))
        .orderBy(col("split"), col("cls"))
    }),

    // K-1: sequential token packing into 500-token bins per source
    "k1_token_packing" -> ((s, d) =>
      Curation.packSequential(
          t(s, d, "documents")
            .select(col("doc_id"), col("source"),
              size(split(col("text"), " ")).as("n_tokens")),
          "source", "doc_id", "n_tokens", budget = 500L)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("cum_before"), col("bin"))
        .orderBy(col("source"), col("doc_id")))
  )

  // ───── DuckDB oracle twins ─────

  private val h = Hashing.sql.hash64("CAST(doc_id AS VARCHAR)")

  /** Shared by c1 and c4: the Bloom path is output-identical. */
  private val decontaminateOracle: String =
    s"""WITH grams AS (
       |  SELECT doc_id, unnest(${Hashing.sql.shingles("text", 3)}) AS gram FROM documents),
       |hashed AS (SELECT DISTINCT doc_id, ${Hashing.sql.hash64("gram")} % 2147483647 AS gh
       |           FROM grams),
       |test_g AS (SELECT DISTINCT gh FROM hashed WHERE doc_id % 97 = 0)
       |SELECT h.doc_id, count(*) AS n_shared
       |FROM hashed h JOIN test_g USING (gh)
       |WHERE h.doc_id % 97 <> 0
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "p1_hash_split" ->
      s"""SELECT doc_id, CAST(h % 1000 AS INT) AS bucket,
         |  CASE WHEN h % 1000 < 800 THEN 'train'
         |       WHEN h % 1000 < 900 THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT doc_id, $h AS h FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "p2_stratified_sample" ->
      s"""SELECT doc_id, source, CAST(rk AS INT) AS rk FROM (
         |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
         |    ORDER BY $h ASC, doc_id ASC) AS rk
         |  FROM documents)
         |WHERE rk <= 5 ORDER BY source, rk""".stripMargin,
    "p3_weighted_sample" ->
      s"""SELECT doc_id, q FROM (
         |  SELECT doc_id, ${graft.functions.TextStats.sql.qualityScore("text")} AS q,
         |    $h AS hh
         |  FROM documents)
         |WHERE hh % 100 < q ORDER BY doc_id""".stripMargin,
    "p4_source_balance" ->
      s"""WITH tok AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_total
         |        FROM tok GROUP BY 1),
         |tgt AS (SELECT min(src_total) AS target FROM tot)
         |SELECT doc_id, source, n_tokens, src_total, target
         |FROM tok JOIN tot USING (source), tgt
         |WHERE $h % src_total < target
         |ORDER BY doc_id""".stripMargin,
    "p7_epoch_shuffle" -> {
      val h = Hashing.sql.hash64("CAST(doc_id AS VARCHAR) || ':1'")
      s"""SELECT doc_id, $h AS shuffle_key FROM documents
         |ORDER BY shuffle_key, doc_id LIMIT 100""".stripMargin
    },
    "p9_epoch_ordinals" -> {
      val h = Hashing.sql.hash64("CAST(doc_id AS VARCHAR) || ':2'")
      s"""WITH keyed AS (SELECT doc_id, $h AS shuffle_key FROM documents),
         |ranked AS (SELECT doc_id, shuffle_key,
         |    row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS ordinal
         |  FROM keyed)
         |SELECT doc_id, shuffle_key, ordinal, ordinal // 64 AS shard
         |FROM ranked ORDER BY doc_id""".stripMargin
    },
    "p6_temperature_mix" ->
      s"""WITH docs AS (SELECT doc_id,
         |    CASE WHEN doc_id % 10 < 6 THEN 'web'
         |         WHEN doc_id % 10 < 9 THEN 'books'
         |         ELSE 'code' END AS mix_src
         |  FROM documents),
         |tot AS (SELECT mix_src, count(*) AS src_n FROM docs GROUP BY 1),
         |mn AS (SELECT min(src_n) AS min_n FROM tot)
         |SELECT doc_id, mix_src, src_n, min_n,
         |  CAST(floor(1000000::DOUBLE * sqrt(min_n::DOUBLE / src_n::DOUBLE)) AS BIGINT) AS keep_threshold
         |FROM docs JOIN tot USING (mix_src), mn
         |WHERE $h % 1000000 <
         |  CAST(floor(1000000::DOUBLE * sqrt(min_n::DOUBLE / src_n::DOUBLE)) AS BIGINT)
         |ORDER BY doc_id""".stripMargin,
    "k2_chunk_documents" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |starts AS (
        |  SELECT doc_id, toks, n,
        |    unnest(list_filter(generate_series(0, greatest(n - 1, 0), 24),
        |      s -> s = 0 OR s + 8 < n)) AS s
        |  FROM base)
        |SELECT doc_id, CAST(s // 24 AS INT) AS chunk_idx,
        |  CAST(len(list_slice(toks, s + 1, least(s + 32, n))) AS INT) AS n_chunk_tokens,
        |  array_to_string(list_slice(toks, s + 1, least(s + 32, n)), ' ') AS chunk_text
        |FROM starts ORDER BY doc_id, chunk_idx""".stripMargin,
    "p5_length_outliers" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |  FROM documents),
        |hist AS (SELECT source, CAST(n_tokens AS BIGINT) AS v, count(*) AS n
        |         FROM tok WHERE n_tokens IS NOT NULL GROUP BY 1, 2),
        |cum AS (SELECT source, v,
        |    sum(n) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(n) OVER (PARTITION BY source) AS tot
        |  FROM hist),
        |thr AS (SELECT source, min(v) AS threshold FROM cum
        |        WHERE cum * 100 >= 90 * tot GROUP BY 1)
        |SELECT doc_id, tok.source AS source, n_tokens, threshold,
        |  n_tokens > threshold AS is_outlier
        |FROM tok LEFT JOIN thr ON tok.source IS NOT DISTINCT FROM thr.source
        |ORDER BY doc_id""".stripMargin,
    "c1_decontaminate" -> decontaminateOracle,
    // identical contract: the Bloom pre-filter is plan-shape only
    "c4_bloom_decontaminate" -> decontaminateOracle,
    "t6_repetition" ->
      """SELECT doc_id, CAST(len(w) AS INT) AS n_words,
        |  CAST(len(list_distinct(w)) AS INT) AS n_distinct,
        |  1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dup_frac
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "u3_curation_pipeline" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 100000, text FROM documents),
         |scored AS (
         |  SELECT doc_id, ${graft.functions.TextStats.sql.classify("text")} AS cls,
         |    ${graft.functions.TextStats.sql.qualityScore("text")} AS q,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    ${Hashing.sql.hash64("text")} AS content_hash
         |  FROM corpus),
         |deduped AS (
         |  SELECT * FROM (SELECT *, row_number() OVER (
         |      PARTITION BY content_hash ORDER BY doc_id ASC) AS rn
         |    FROM scored WHERE q >= 40) WHERE rn = 1),
         |split AS (
         |  SELECT *, $h % 1000 AS bucket FROM deduped)
         |SELECT CASE WHEN bucket < 800 THEN 'train'
         |            WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split,
         |  cls, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  CAST(sum(q) AS BIGINT) AS sum_q
         |FROM split GROUP BY 1, 2 ORDER BY split, cls""".stripMargin,
    "k1_token_packing" ->
      """SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
        |  CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS cum_before,
        |  CAST((sum(n_tokens) OVER w - n_tokens) // 500 AS BIGINT) AS bin
        |FROM (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens FROM documents)
        |WINDOW w AS (PARTITION BY source ORDER BY doc_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY source, doc_id""".stripMargin
  )
}
