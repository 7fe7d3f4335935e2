package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Corpus-level text statistics — the signals that need a pass over the
  * WHOLE corpus (document frequencies), not just a single row: TF-IDF
  * keyword extraction and cross-document boilerplate measurement.
  *
  * Both follow the same scale shape: the per-document side stays linear
  * (explode → partial-aggregate), and the corpus-global side collapses
  * to a small table (vocabulary / high-frequency-gram head) that joins
  * back via broadcast — no doc×doc work, no global windows, and the
  * wide text column never enters a shuffle.
  */
object CorpusStats {

  /** Per-document top-k keywords by TF-IDF rank. The score is
    * `tf·scale·nDocs / docFreq` computed in IEEE-754 doubles with a
    * FIXED operation order — each multiply/divide is correctly rounded
    * and therefore bit-identical across engines (the temperatureMix
    * precedent; no `ln` whose last ulp differs between libm and the
    * JVM). Doubles, not the integer DIV this used to be: at the 100 TB
    * design point (nDocs ~1e9, a garbage doc with tf ~1e4) the integer
    * product tf·scale·nDocs exceeds 2^63 — both engines fail the whole
    * query on one garbage document (Spark 4 ANSI overflow error; DuckDB
    * likewise). Doubles lose exactness past 2^53 but stay
    * correctly-rounded-identical on both engines at any magnitude, and
    * ranking needs order, not exact integers. Ties break on the token
    * for a total order.
    *
    * nDocs and the doc-frequency table are computed in-plan; the
    * scoring join is left unhinted so AQE broadcasts a small
    * vocabulary and falls back to shuffle-hash when the vocabulary is
    * corpus-sized (URLs/ids/typos dominate distinct tokens at 100 TB —
    * see [[heavyHitters]] — and a forced broadcast would collect all
    * of it to the driver).
    *
    * @return (idCol, token, tf, doc_freq, score, rk) for rk <= k
    */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String, k: Int,
                scale: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // both the doc-frequency aggregate and the scoring join consume
    // tf — without materializing, the corpus tokenize+count runs
    // twice. Materialize.once, not df.persist: a persist entry on this
    // call-local frame would pin the CacheManager for the session's
    // life; and on a cluster the blocks stay recomputable + evictable
    // one exchange for the whole per-doc side (guide §2.4): hash the
    // DOCUMENTS by id first — HashPartitioning(id) satisfies the
    // groupBy(id, token) clustering (id ⊆ {id, token}) so the count
    // aggregates exchange-free, localCheckpoint preserves the
    // partitioning through Materialize.once, and the top-k window
    // (partitionBy id) then reads tf without re-shuffling. The text
    // column crosses the wire once; previously the (id, token, cnt)
    // pair stream crossed once for the aggregate and the scored rows
    // again for the window. (On the cluster Materialize branch the
    // df.rdd round-trip drops partitioning metadata and the window
    // re-exchanges — the groupBy exchange saving still holds.)
    val tf = Materialize.once(df
      .repartition(col(idCol))
      .select(col(idCol), explode(Hashing.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf")))
    // tf is already distinct per (doc, token): df = plain count per token
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("doc_freq"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(docFreq.crossJoin(nDocs), "token")
      .withColumn("score",
        expr(s"CAST(tf AS DOUBLE) * ${scale}L * n_docs / doc_freq"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("token").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("token"), col("tf"), col("doc_freq"),
        col("score"), col("rk"))
  }

  /** Cross-document boilerplate ratio: the fraction of a document's
    * distinct word-k-grams that appear in at least `minDf` documents —
    * the C4/RefinedWeb-style signal for template-heavy pages that
    * per-document repetition scores (t6) cannot see.
    *
    * Boilerplate is by definition the head of the gram-frequency
    * distribution, so the shared-gram set is small and broadcast: the
    * corpus-sized gram stream is touched twice linearly (per-doc
    * distinct, frequency count) and never joined against itself.
    *
    * @return (idCol, n_grams, n_shared, boilerplate_ratio)
    */
  /** Corpus-boilerplate REMOVAL (the transform t8's ratio only measures):
    * C4/RefinedWeb-style span scrubbing — drop every token covered by a
    * word-k-gram that appears in at least `minDf` documents, keeping the
    * remaining tokens in order.
    *
    * Scale shape mirrors [[boilerplateRatio]]: the gram stream is slim
    * (id, pos, 60-bit hash) longs, the shared-gram head set is small and
    * broadcast, and only the covered POSITIONS of shared occurrences are
    * shuffled back per doc (O(shared occurrences), not O(corpus
    * tokens)) — the text column itself never enters a shuffle; the final
    * token filter is a narrow per-row array op against the collected
    * position set.
    *
    * A document shorter than k tokens hashes as one whole-text gram
    * (ShingleHashes64 semantics); if that gram is shared the whole
    * document is scrubbed.
    *
    * @return (idCol, n_tokens, n_kept, cleaned)
    */
  /** Grams appearing in at least `minDf` docs, from a per-doc-DISTINCT
    * (id, gh) stream — the one shared-set derivation t8 and t9 build
    * on (keeping it in one place keeps their semantics in lockstep). */
  private def sharedGramSet(distinctGrams: DataFrame, minDf: Long): DataFrame =
    distinctGrams.groupBy(col("gh")).agg(count(lit(1)).as("gdf"))
      .filter(col("gdf") >= minDf)
      .select(col("gh"))

  def removeSharedSpans(df: DataFrame, idCol: String, textCol: String,
                        k: Int, minDf: Long): DataFrame = {
    // raw 60-bit gram hashes: this transform DELETES tokens, so a
    // 31-bit bucket collision (certain at corpus vocabulary scale)
    // would scrub non-boilerplate text — same reasoning as
    // containmentPairs' set-identity hashes
    // minDf = 1 would mark EVERY distinct gram shared: the broadcast
    // becomes a corpus-vocabulary driver collect and the scrub deletes
    // every token of every document, silently (the heavyHitters
    // threshold rule)
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    // NULL text coalesces to "" before gram computation AND the scrub
    // tail (the dedup-family convention, and what the t9 oracle
    // computes) — raw NULL would emit a (id, NULL, NULL, NULL) row
    // that silently breaks downstream sums
    val safe = df.withColumn(textCol, coalesce(col(textCol), lit("")))
    // Materialize.once, not df.persist — call-local frame, two consumer
    // subtrees; persist would leak a CacheManager entry per call, and
    // cluster blocks must stay recomputable + evictable
    val grams = Materialize.once(safe
      .select(col(idCol),
        posexplode(graft.plans.ShingleHashes64.column60(col(textCol), k))
          .as(Seq("pos", "gh"))))
    val shared = sharedGramSet(grams.select(col(idCol), col("gh")).distinct(), minDf)
    val covered = grams.join(broadcast(shared), "gh")
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("cpos"))
    scrubCovered(safe, idCol, textCol, covered)
  }

  /** Shared scrub tail: delete every token position listed in `covered`
    * (`(idCol, cpos)` rows, duplicates and out-of-range values inert),
    * rebuilding the survivors in order — the
    * (idCol, n_tokens, n_kept, cleaned) shape of [[removeSharedSpans]]
    * and [[graft.operators.Dedup.dedupSubstrings]]. Kept positions via
    * array_except (hash-based, order-preserving on its first argument):
    * linear in the token count — a per-token array_contains over the
    * covered set would be O(tokens × covered), quadratic exactly on the
    * template-heavy docs these operators target. */
  private[operators] def scrubCovered(df: DataFrame, idCol: String,
                                      textCol: String,
                                      covered: DataFrame): DataFrame = {
    val perDoc = covered
      .groupBy(col(idCol))
      .agg(collect_set(col("cpos")).as("__covered"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("__toks", Hashing.tokens(col(textCol)))
      .withColumn("__cov", coalesce(col("__covered"), array().cast("array<int>")))
      .withColumn("__keptpos",
        array_except(sequence(lit(0), size(col("__toks")) - 1), col("__cov")))
      // kernel rebuild: the transform(p => element_at(toks, p+1)) +
      // array_join chain ran its lambda INTERPRETED once per kept token
      // per document (HOF CodegenFallback); PickJoin is one codegen'd
      // pass, and n_kept == size(__keptpos) (transform is
      // length-preserving), so __kept never materializes at all
      .select(col(idCol),
        size(col("__toks")).as("n_tokens"),
        size(col("__keptpos")).as("n_kept"),
        graft.plans.TokenExprs.pickJoin(col("__toks"), col("__keptpos")).as("cleaned"))
  }

  /** EXACT corpus heavy hitters — every token whose corpus frequency
    * exceeds total/`threshold` — via per-partition Misra–Gries
    * summaries plus one exact recount of the survivors.
    *
    * Why not a plain `groupBy(token).count()`: that shuffles one row
    * per DISTINCT token per partition — at 100 TB the vocabulary tail
    * (URLs, ids, typos) dominates and the shuffle is vocabulary-sized.
    * Here stage 1 is a narrow mapPartitions: each task compresses its
    * token stream into ≤ `threshold` Misra–Gries counters. The MG
    * guarantee (undercount ≤ N_p/(w+1)) plus an averaging argument —
    * a token with global count > N/threshold must have local count
    * > N_p/threshold in at least one partition — makes the union of
    * per-partition survivors a SUPERSET of the true heavy hitters.
    * Stage 2 recounts ONLY candidate tokens (a broadcast semi-join,
    * ≤ threshold × partitions rows) and applies the exact integer
    * cutoff `cnt × threshold > total`, so the result is bitwise exact
    * and partitioning-independent despite the sketch — which is what
    * makes the approximate-looking operator fully oracle-able.
    *
    * @return (token, cnt) for cnt × threshold > total tokens
    */
  def heavyHitters(df: DataFrame, textCol: String, threshold: Int): DataFrame = {
    require(threshold > 1, "threshold must be > 1")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(explode(Hashing.tokens(col(textCol))).as("token"))
    // pass 1 (narrow): MG candidate survivors AND the partition's token
    // total in one sweep — a null-token row per partition carries the
    // total, so the corpus is NOT rescanned just to count it. The tiny
    // result (≤ threshold+1 rows/partition) is persisted because both
    // the candidate set and the total read it.
    val sketch = toks.as[String].mapPartitions { it =>
      var pn = 0L
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { tok =>
        pn += 1
        counters.get(tok) match {
          case Some(n) => counters.update(tok, n + 1)
          case None if counters.size < threshold => counters.update(tok, 1L)
          case None => // decrement-all step: amortized O(1) per token
            val dead = List.newBuilder[String]
            counters.foreachEntry { (k, v) =>
              if (v == 1L) dead += k else counters.update(k, v - 1) }
            dead.result().foreach(counters.remove)
        }
      }
      Iterator.single((null: String, pn)) ++ counters.keysIterator.map((_, 0L))
    }.toDF("token", "pn")
      // Materialize.once, not df.persist — call-local frame read by
      // both the candidate set and the total; persist would leak a
      // CacheManager entry per call
      .transform(Materialize.once)
    val candidates = sketch.filter(col("token").isNotNull).select(col("token")).distinct()
    val total = sketch.filter(col("token").isNull).agg(sum(col("pn")).as("total"))
    // pass 2: exact recount of candidates only + the integer cutoff
    toks.join(broadcast(candidates), "token")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * threshold > col("total"))
      .select(col("token"), col("cnt"))
  }

  def boilerplateRatio(df: DataFrame, idCol: String, textCol: String,
                       k: Int, minDf: Long): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf") // see removeSharedSpans
    // 60-bit hashes for the same collision reasoning as
    // removeSharedSpans (a 31-bit collision would inflate the ratio)
    // Materialize.once, not df.persist — call-local frame, three
    // consumer subtrees; persist would leak a CacheManager entry
    val grams = Materialize.once(df
      .select(col(idCol),
        explode(graft.plans.ShingleHashes64.column60(col(textCol), k)).as("gh"))
      .distinct())
    val shared = sharedGramSet(grams, minDf)
    val nShared = grams.join(broadcast(shared), "gh")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
    val out = grams.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
      .join(nShared, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") /
          col("n_grams").cast("double")).as("boilerplate_ratio"))
    out
  }

  /** Integer-exact bigram-fluency score — the cheap KenLM-ish quality
    * proxy: a document whose word bigrams are corpus-common reads
    * "fluent"; machine-garbled or boilerplate-stitched text pairs
    * words the corpus never pairs. `fluency = sum(corpus count of
    * each bigram occurrence) DIV n_bigrams` — all-integer (no
    * cross-engine `ln` drift), order-equivalent to average bigram
    * log-probability for ranking purposes at fixed corpus size.
    *
    * Scale: the per-doc bigram stream is linear (explode); the corpus
    * bigram-count table joins back by key — a plain equi-join, since
    * at 100 TB the bigram vocabulary can exceed broadcast size; both
    * sides shuffle slim (id|bg, count) rows. A document under 2
    * tokens falls back to its whole text as one "bigram"
    * ([[Hashing.shingles]] semantics, mirrored by the oracle). */
  def bigramFluency(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // the bigram stream feeds both the count aggregate and the join
    // probe side; without materialization the dominant tokenize+explode
    // pass runs (and shuffles) twice. Materialize.once over df.persist
    // for the same call-local-lifetime reasoning as winnowingOverlap.
    val bigrams = Materialize.once(df.select(col(idCol),
      explode(Hashing.shingles(coalesce(col(textCol), lit("")), 2)).as("bg")))
    val counts = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    bigrams.join(counts, Seq("bg"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        expr("sum(cnt) DIV count(1)").as("fluency"))
  }

  /** Vocabulary pruning with `<unk>` rewrite — the tokenizer-prep step:
    * the kept vocabulary is every token appearing in at least
    * `num/den` of the corpus's documents (integer arithmetic:
    * `df * den >= num * nDocs`), and each document reports its token
    * count, OOV occurrence count, and its text with every OOV token
    * replaced by `<unk>`.
    *
    * Scale shape: document frequency is one distinct-per-doc explode +
    * count (the same linear pass t7 takes); the KEPT vocabulary — small
    * by construction, it is the high-df head while the Zipf tail is
    * what gets pruned — broadcasts onto the positional token stream,
    * and only the OOV POSITIONS (slim (id, pos) longs) shuffle back
    * per doc; the text column itself is rewritten by one narrow
    * two-arg `transform` at the end, never entering an exchange
    * (the t9 covered-positions shape). */
  def oovScrub(df: DataFrame, idCol: String, textCol: String,
               num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "need a fraction 0 < num/den <= 1")
    // three consumers read the tokenized corpus (docFreq's explode,
    // oovPos's explode, the final rewrite join) — materialize the
    // token arrays once or the corpus tokenizes three times.
    // Materialize.once, not a raw localCheckpoint: on a cluster the
    // blocks must stay RECOMPUTABLE (executor loss under dynamic
    // allocation would otherwise fail the query) and EVICTABLE (this
    // frame is corpus-sized — under pressure it degrades to re-
    // tokenizing, never to OOM); and not df.persist, whose CacheManager
    // entry no call site here could ever unpersist.
    val toks = Materialize.once(df.withColumn("__toks",
      Hashing.tokens(coalesce(col(textCol), lit("")))))
    val pos = toks.select(col(idCol),
      posexplode(col("__toks")).as(Seq("pos", "tok")))
    val docFreq = pos.select(col(idCol), col("tok")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("nd"))
    val vocab = docFreq.crossJoin(broadcast(nDocs))
      .filter(col("df") * den >= col("nd") * num)
      .select(col("tok"))
    val oovPos = pos.join(broadcast(vocab), Seq("tok"), "left_anti")
      .groupBy(col(idCol)).agg(collect_set(col("pos")).as("__oov"))
    // linear rewrite, one kernel pass: position p emits <unk> when
    // p ∈ oov, else toks[p] — bitwise the declarative merge (kept
    // (pos, token) structs + (pos, <unk>) structs, array_sort by pos,
    // project, join), which ran FOUR interpreted HOF passes per doc
    // (two struct-building transforms, the struct sort's comparator,
    // the projection transform); a per-token array_contains over the
    // OOV set would likewise be O(tokens × oov), quadratic exactly on
    // the rare-token-heavy documents this operator exists to clean
    toks.join(oovPos, Seq(idCol), "left")
      .withColumn("__oovArr", coalesce(col("__oov"), array().cast("array<int>")))
      .select(col(idCol),
        size(col("__toks")).as("n_tokens"),
        size(col("__oovArr")).as("n_oov"),
        graft.plans.TokenExprs.unkText(col("__toks"), col("__oovArr"))
          .as("unk_text"))
  }

  /** Linear-model document scoring — applying a TRAINED classifier at
    * corpus scale (the fasttext-style quality/language filter of
    * CCNet-like curation stages, vs [[graft.functions.TextStats]]'s
    * literal wordlist heuristics): `score(d) = bias + Σ_positions
    * w(token)` over every token position whose token appears in the
    * model table; absent tokens contribute 0, and a document with no
    * model hit scores exactly `bias`. Integer weights keep the result
    * bitwise-reproducible across engines.
    *
    * The model is a DATAFRAME, not a literal list — a real quality
    * classifier carries millions of n-gram features, far past what an
    * in-plan literal (or a guaranteed broadcast) can hold. The join is
    * deliberately unhinted: AQE broadcasts a small vocabulary head and
    * falls back to a shuffle-hash join when the model side is large —
    * the same sizing logic as Dedup's pair-enrichment joins. Only slim
    * (id, feature) pairs enter the join; the text column never
    * shuffles, and one pass covers everything (see the body comment).
    *
    * @param model  (featureCol: string feature, weightCol: long weight)
    * @param featureN word n-gram width of the model's features (1 =
    *                 unigram tokens; fasttext-style models carry word
    *                 bigrams/trigrams — [[Hashing.shingles]] semantics,
    *                 so a doc shorter than n contributes its whole text
    *                 as one feature)
    * @return (idCol, n_tokens, n_hits, score, label) — n_tokens counts
    *         feature positions; label is "keep" when score >= 0, else
    *         "drop"
    */
  def linearModelScore(df: DataFrame, idCol: String, textCol: String,
                       model: DataFrame, featureCol: String,
                       weightCol: String, bias: Long,
                       featureN: Int = 1): DataFrame = {
    // single pass: every doc survives the explode (shingles never
    // returns an empty array for non-null text — "" yields [""]), so a
    // LEFT join against the model keeps zero-hit docs in the stream and
    // one groupBy recovers n_tokens (position count), n_hits (matched
    // positions), and the score together — no second corpus scan, no
    // rejoin of a (id, n_tokens) base. A model row with a NULL weight
    // counts as absent (count(__w) skips NULLs, sum ignores them).
    require(featureN >= 1, "featureN must be >= 1")
    val pos = df.select(col(idCol),
      explode(Hashing.shingles(coalesce(col(textCol), lit("")), featureN))
        .as("__tok"))
    // pre-aggregate the model to one row per feature BEFORE the join:
    // a model table carrying duplicate feature rows would otherwise
    // multiply every matched position (inflating n_tokens, n_hits AND
    // score for every doc containing that feature). Duplicate weights
    // SUM — the linear-model reading of repeated (feature, weight)
    // contributions — and sum's NULL-skipping keeps the documented
    // "NULL weight counts as absent" rule: an all-NULL feature sums to
    // NULL and count(__w) still skips it. The aggregate is map-side
    // partial over the model only; AQE sizes the join from its output.
    val uniq = model
      .select(col(featureCol).as("__tok"), col(weightCol).as("__w"))
      .groupBy(col("__tok")).agg(sum(col("__w")).as("__w"))
    pos.join(uniq, Seq("__tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        count(col("__w")).cast("int").as("n_hits"),
        (coalesce(sum(col("__w")), lit(0L)) + lit(bias)).as("score"))
      .withColumn("label",
        when(col("score") >= 0, lit("keep")).otherwise(lit("drop")))
  }
}
