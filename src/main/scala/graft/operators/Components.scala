package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the step that turns
  * pairwise near-duplicate hits (minhash/simhash collisions) into
  * DUPLICATE CLUSTERS, so a dedup pipeline can keep one canonical
  * document per cluster instead of dropping both ends of every pair.
  *
  * Algorithm: iterative min-label propagation with pointer jumping,
  * as pure DataFrame ops — every node starts labeled with itself; each
  * round every node takes the min of its own and its neighbors' labels,
  * then follows the label chain one hop (`label(label(x))`,
  * "shortcutting"). The jump halves chain lengths, so rounds needed is
  * O(log diameter), not O(diameter) — a 64-link near-dup chain closes
  * in ~7 rounds (ComponentsSpec proves it under a tight maxIter).
  * Each round is two equi-joins + one partial aggregation, all
  * shuffled on the node id. Lineage is truncated per round
  * (`localCheckpoint`) so the plan doesn't grow with iterations — on a
  * cluster, prefer reliable `checkpoint` to survive executor loss.
  *
  * The driver sees ONE scalar per round (the changed-label count) —
  * the label table itself never leaves the executors.
  */
object Components {

  /** @param edges undirected pair list (each pair once is enough)
    * @return (node, cluster) — cluster = min node id reachable;
    *         isolated nodes (absent from `edges`) are not emitted
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(edges.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
      .persist()
    var labels: DataFrame = null
    var labelsH: Materialize.Handle = null
    var it = 0
    var converged = false
    // try/finally: a job failure in ANY eager step — the seed job
    // below included, which is also what populates sym's cache — must
    // not leave the corpus-sized cached edge set pinned for the
    // session's life (the labels frames are eager localCheckpoints, so
    // unpersisting sym after the loop never invalidates the returned
    // frame)
    try {
      // seed with the round-0 neighbor minimum (least(self, min(nbr)))
      // — exactly what the first propagation round would produce from
      // the identity labeling, for the price of the groupBy that
      // builds the node set anyway: one fewer join round every call
      labelsH = Materialize.onceReleasable(sym.groupBy(col("u"))
        .agg(min(col("v")).as("mv"))
        .select(col("u").as("node"), least(col("u"), col("mv")).as("cluster")))
      labels = labelsH.df
      while (!converged && it < maxIter) {
      // min label among each node's neighbors this round
      val nbrMin = sym.join(labels, sym("v") === labels("node"))
        .groupBy(sym("u").as("node2"))
        .agg(min(col("cluster")).as("nbr_min"))
      val stepped = labels.join(nbrMin, labels("node") === nbrMin("node2"), "left")
        .select(col("node"), col("cluster").as("old_cluster"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster"))).as("c1"))
      // pointer jump (shortcutting): label(label(x)) — labels only
      // shrink and label(x) <= x, so following one hop of the label
      // chain halves its length; combined with the neighbor-min step
      // this closes in O(log diameter) rounds instead of O(diameter)
      // onceReleasable (eager), not raw localCheckpoint: per-round
      // lineage truncation must stay RECOMPUTABLE on a real cluster
      // (executor loss under dynamic allocation), where the
      // master-aware wrapper persists instead of checkpointing — and
      // EAGER because the isEmpty probe below can stop at the first
      // non-empty partition, which must not be what populates the
      // round. The handle releases the PREVIOUS round's blocks once
      // this round is populated, keeping O(1) rounds cached.
      val nextH = Materialize.onceReleasable(stepped
        .join(stepped.select(col("node").as("jn"), col("c1").as("jc")),
          col("c1") === col("jn"), "left")
        .select(col("node"), coalesce(col("jc"), col("c1")).as("cluster"),
          (coalesce(col("jc"), col("c1")) < col("old_cluster")).as("changed")),
        truncateLineage = it % TruncateLineageEvery == TruncateLineageEvery - 1)
      val next = nextH.df
      converged = next.filter(col("changed")).isEmpty
      labelsH.release() // round N's last reader was the join above
      labels = next.drop("changed")
      labelsH = nextH
      it += 1
      }
    } finally sym.unpersist()
    // a silent non-converged return would emit WRONG labels (a cluster
    // split in two) — fail loudly instead; callers with adversarially
    // deep graphs raise maxIter or switch to large-star/small-star
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — " +
        "graph diameter exceeds maxIter; raise it or use star-contraction")
    labels
  }

  /** Star-contraction connected components (alternating large-star /
    * small-star, Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — the 100×-scale variant of [[connectedComponents]].
    *
    * Where min-label propagation keeps the full (node, label) table live
    * and re-joins the whole edge set every round, star contraction
    * REWRITES the edge set itself, collapsing each component toward a
    * star centered on its minimum node:
    *
    *  - large-star (per node u, over neighbors Γ(u)): connect every
    *    strictly larger neighbor to m = min(Γ(u) ∪ {u});
    *  - small-star (per node u, over its smaller neighbors N(u)): connect
    *    u and every v ∈ N(u) to m = min(N(u) ∪ {u}).
    *
    * Both steps are one partial-aggregated `groupBy(min)` plus one
    * equi-join on the grouping key, so a giant duplicate cluster costs a
    * map-side-combined min — no single hot reduce key accumulates the
    * whole component the way the label table's cluster-min key does. The
    * edge set only shrinks (toward n−1 star edges per component), so
    * late rounds get cheaper, while min-label propagation's per-round
    * cost stays flat. Converges in O(log²  n) rounds worst-case,
    * ~log n in practice (ComponentsSpec closes a 64-chain well inside 12).
    *
    * Output contract is identical to [[connectedComponents]]: (node,
    * cluster = component-min), one row per node that appears in `edges`
    * (self-pairs label themselves; absent nodes are not emitted) — c2
    * hashes are unchanged whichever implementation serves it.
    */
  def connectedComponentsStar(edges: DataFrame, aCol: String, bCol: String,
                              maxIter: Int = 40,
                              localCap: Long = LocalIterationCap): DataFrame = {
    // Materialize the INPUT edge list once before deriving the node
    // set and the canonical edge set from it: both derivations are
    // eager materializations, and without this the edge-producing
    // subtree — for c3/c6 the banding join + Jaccard verify behind the
    // contracted merge, for c5_scaled the LSH generator itself — runs
    // TWICE per closure call (measured: two bit-identical 7.91 GB
    // executions inside one c3 run at x1000, 83% of the query's
    // shuffle; ExchangeProf, SCALE.md r12). Released as soon as both
    // derived frames are populated — O(pairs) storage for the window
    // between the two checkpoints, zero after.
    val rawH = Materialize.onceReleasable(
      edges.select(col(aCol).as("u"), col(bCol).as("v")))
    val raw = rawH.df
    // every node ever seen (incl. self-pair-only nodes) — the label
    // frame's row set, whatever the surviving star edges look like
    val nodes = Materialize.once(
      raw.select(explode(array(col("u"), col("v"))).as("node")).distinct())
    // canonical orientation big→small; self-loops carry no connectivity
    var eH = Materialize.onceReleasable(raw.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct())
    var e = eH.df
    rawH.release() // both derived frames are populated; raw is done

    // Size-adaptive fast path: each distributed contraction round costs
    // a fixed ~5 tiny shuffles of plan compilation + scheduling — on a
    // graph this small (both frames already checkpointed, so the counts
    // are one cheap job each) the whole closure is microseconds of
    // driver union-find on a few MB, while the iteration would pay
    // seconds regardless of data size. This is the micro-batch merge
    // case: [[mergeIncrementalClusters]] contracts the graph to
    // O(batch) BEFORE closing it. Corpus-scale inputs exceed the cap
    // and run the unchanged distributed iteration; tests pin both paths
    // (localCap = 0 forces distributed).
    val localOrderable = e.schema("u").dataType match {
      case _: org.apache.spark.sql.types.LongType |
           _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.ByteType |
           _: org.apache.spark.sql.types.StringType => true
      case _ => false // exotic id types keep the distributed ordering
    }
    val eCnt0 = e.count() // both frames checkpointed: one cheap job each
    if (localCap > 0 && localOrderable &&
        eCnt0 <= localCap && nodes.count() <= localCap)
      return localClosure(nodes, e)

    // large-star: u's neighborhood min adopts all neighbors ABOVE u.
    // Input oriented, symmetrize; output is naturally big→small again
    // (emitted (v, m) has v > u ≥ m).
    def largeStar(ed: DataFrame): DataFrame = {
      val sym = ed.union(ed.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u").as("cu"), least(col("u"), col("mn")).as("m"))
      sym.join(m, sym("u") === m("cu"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // no distinct here: small-star's groupBy(min) is duplicate-
      // insensitive and its final distinct canonicalizes the round's
      // output set — dropping this exchange saves a shuffle per round
    }

    // small-star: u's smaller-neighbor min adopts u and the rest of
    // N(u). Works directly on the big→small orientation (group by the
    // big endpoint); emitted (v, m) has v > m by minimality.
    def smallStar(ed: DataFrame): DataFrame = {
      val m = ed.groupBy(col("u")).agg(min(col("v")).as("m"))
      ed.join(m, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v")))
        .distinct()
    }

    var it = 0
    var eCnt = eCnt0
    var converged = eCnt == 0
    while (!converged && it < maxIter) {
      // LAZY materialization with a release handle: the count() below
      // is the materializing action, so lineage truncation costs no
      // extra job per round; once this round is populated AND compared,
      // the previous round's blocks are dead weight — released below so
      // a deep contraction keeps O(1) rounds cached, not O(rounds)
      // (they stay recomputable; replay depth is reset by the periodic
      // reliable checkpoint on deployments that armed a checkpoint dir)
      val nextH = Materialize.lazilyReleasable(smallStar(largeStar(e)),
        truncateLineage = it % TruncateLineageEvery == TruncateLineageEvery - 1)
      val next = nextH.df
      // both sides are distinct sets, so equal counts are NECESSARY for
      // the fixed point — and counting freshly-checkpointed data is one
      // cheap job, while the exact symmetric-difference check is two
      // anti-joins. Most rounds the count moves; only a stable count
      // pays for the exact confirmation.
      // equal-cardinality distinct sets are equal iff one-sided
      // difference is empty — the second anti-join would be redundant
      val nextCnt = next.count()
      converged = nextCnt == eCnt && next.exceptAll(e).isEmpty
      eH.release() // last read of round N was the exceptAll above
      e = next
      eH = nextH
      eCnt = nextCnt
      it += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxIter rounds — " +
        "pathological ordering; raise maxIter")
    // fixed point is a forest of stars (member > center): members carry
    // their center, centers and self-pair-only nodes label themselves
    nodes.join(e.select(col("u").as("node"), col("v").as("cl")), Seq("node"), "left")
      .select(col("node"), coalesce(col("cl"), col("node")).as("cluster"))
  }

  /** Above this many edges or nodes the driver-local closure fast path
    * is skipped and the distributed star contraction runs. 200k rows of
    * boxed ids is tens of MB of driver heap — comfortably bounded —
    * while the batch-contracted graphs the fast path exists for are
    * thousands of rows. */
  val LocalIterationCap: Long = 200000L

  /** Every this-many contraction/propagation rounds, ask the
    * materializer for a reliable lineage truncation (active only on a
    * cluster that armed `setCheckpointDir` — see
    * [[Materialize.lazilyReleasable]]). Both loops converge in
    * O(log diameter) rounds, so this fires at most once or twice on
    * real graphs; it exists for the adversarially deep ones, bounding
    * executor-loss replay to ≤ this many rounds of recompute. */
  val TruncateLineageEvery: Int = 10

  /** Spark-semantics ordering for collected atomic id values: STRING
    * must compare as UTF-8 bytes (UTF8String's binary order), not
    * java.lang.String's UTF-16 code units — they disagree above the
    * BMP, and the local fast path must pick the SAME component minimum
    * the distributed `min()` would. */
  private def cmpAtomic(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) =>
      java.util.Arrays.compareUnsigned(
        x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case (x: Comparable[_], _) => x.asInstanceOf[Comparable[Any]].compareTo(b)
    case _ => throw new IllegalArgumentException(
      s"unorderable component id: ${a.getClass}")
  }

  /** Driver union-find over a collected (checkpointed, cap-bounded)
    * edge set; value-identical output contract to the distributed
    * iteration: one (node, cluster = component-min) row per node in
    * `nodes`, self-pair-only nodes labeling themselves. */
  private def localClosure(nodes: DataFrame, e: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    for (row <- e.collect()) {
      val u = row.get(0); val v = row.get(1)
      require(u != null && v != null, "component ids must be non-null")
      if (!parent.containsKey(u)) parent.put(u, u)
      if (!parent.containsKey(v)) parent.put(v, v)
      val ru = find(u); val rv = find(v)
      if (ru != rv) parent.put(ru, rv)
    }
    // component minimum per root
    val minOf = new java.util.HashMap[Any, Any]()
    parent.keySet().forEach { n =>
      val r = find(n)
      val cur = minOf.get(r)
      if (cur == null || cmpAtomic(n, cur) < 0) minOf.put(r, n)
    }
    val dt = e.schema("u").dataType
    val out = new java.util.ArrayList[org.apache.spark.sql.Row]()
    nodes.collect().foreach { row =>
      val n = row.get(0)
      val cl = if (parent.containsKey(n)) minOf.get(find(n)) else n
      out.add(org.apache.spark.sql.Row(n, cl))
    }
    // nullable: a null edge endpoint never reaches `e` (the u =!= v
    // orientation filter drops it) but DOES survive into `nodes`, and
    // the distributed path emits its (null, null) self-label row —
    // parity requires the same here
    spark.createDataFrame(out, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", dt, nullable = true),
      org.apache.spark.sql.types.StructField("cluster", dt, nullable = true))))
  }

  /** Incremental cluster maintenance: fold a batch of NEW near-dup
    * pairs into an existing (node, cluster) labeling without
    * recomputing the global closure — the companion of the d7/d8
    * incremental pair detectors. At 100 TB you never re-run connected
    * components over the whole corpus per ingest batch; only the
    * components the batch actually touches may change.
    *
    * Correctness rests on the labeling being closure-compressed:
    * `cluster` is the component MINIMUM, so each existing component is
    * fully represented by its single representative id. Contract every
    * batch edge endpoint to its representative (itself if the node is
    * new), run [[connectedComponentsStar]] on that contracted graph —
    * whose size is O(batch), independent of the corpus — and the
    * resulting labels are the merged components' true minima
    * (min over {old component minima} ∪ {new node ids} = min over all
    * member ids). Unaffected components never enter any iteration.
    *
    * The final relabel is one broadcast hash join of the O(batch)-sized
    * (old rep → merged min) map against the label table — a narrow
    * map-side pass; no shuffle of the corpus-sized labeling. (A real
    * deployment would push the same map into a partition-pruned storage
    * upsert; the dataflow shape is identical.)
    *
    * Invariants: node ids are unique corpus-wide; `labels` has columns
    * (node, cluster) as produced by either CC implementation. Batch
    * nodes that appear only in `newPairs` enter the labeling; batch
    * pairs wholly inside one existing cluster are no-ops.
    */
  def mergeIncrementalClusters(labels: DataFrame, newPairs: DataFrame,
                               aCol: String, bCol: String,
                               maxIter: Int = 40): DataFrame = {
    val (lab, affected) = contractedMerge(labels, newPairs, aCol, bCol, maxIter)
    // rewrite only clusters whose representative merged; everyone else
    // streams through the broadcast join unchanged
    val relabeled = lab.join(broadcast(affected), lab("cluster") === col("k"), "left")
      .select(col("node"), coalesce(col("merged"), col("cluster")).as("cluster"))
    relabeled.unionByName(newNodes(lab, affected))
  }

  /** [[mergeIncrementalClusters]] emitting ONLY the rows the batch
    * changes or adds — the per-batch DELTA a continuous pipeline
    * persists. Rewriting even one narrow pass over a corpus-sized label
    * table per ingest batch is O(corpus) I/O; the delta is O(size of
    * the merged components), so a perpetual ingest stores base + deltas
    * and resolves latest-wins per node (compacting on its own cadence —
    * the same snapshot+delta+compaction shape as the ledger and
    * [[graft.sources.Layout.compact]]). Against an empty labeling this
    * is exactly [[connectedComponentsStar]] of the batch. */
  def mergeIncrementalClustersDelta(labels: DataFrame, newPairs: DataFrame,
                                    aCol: String, bCol: String,
                                    maxIter: Int = 40): DataFrame = {
    val (lab, affected) = contractedMerge(labels, newPairs, aCol, bCol, maxIter)
    // members of clusters whose representative's label actually moved
    val changedReps = affected.filter(col("k") =!= col("merged"))
    val relabeled = lab.join(broadcast(changedReps), lab("cluster") === col("k"))
      .select(col("node"), col("merged").as("cluster"))
    relabeled.unionByName(newNodes(lab, affected))
  }

  /** Shared head of the incremental merge: contract batch endpoints to
    * their representatives, run star CC on the O(batch) graph. Returns
    * (normalized labels, (k = old-rep-or-new-node → merged min)). */
  private def contractedMerge(labels: DataFrame, newPairs: DataFrame,
                              aCol: String, bCol: String,
                              maxIter: Int): (DataFrame, DataFrame) = {
    val lab = labels.select(col("node"), col("cluster"))
    val pe = newPairs.select(col(aCol).as("pu"), col(bCol).as("pv"))
    val lu = lab.select(col("node").as("pu"), col("cluster").as("cu"))
    val lv = lab.select(col("node").as("pv"), col("cluster").as("cv"))
    // contract endpoints to their current representatives (new nodes
    // represent themselves); self-loops created by intra-cluster pairs
    // vanish inside the star contraction
    val contracted = pe.join(lu, Seq("pu"), "left").join(lv, Seq("pv"), "left")
      .select(coalesce(col("cu"), col("pu")).as("u"),
        coalesce(col("cv"), col("pv")).as("v"))
    val merged = connectedComponentsStar(contracted, "u", "v", maxIter)
    // Materialize.once, not DataFrame.persist: the frame is
    // O(batch)-small, consumed by 2-3 joins, and a perpetual-ingest
    // caller invokes this once per micro-batch — a pinned CacheManager
    // entry per call would accumulate for the session's life, while
    // checkpoint/RDD-persist blocks are released as soon as the batch's
    // frames go out of scope (and stay recomputable on a cluster)
    val affected = Materialize.once(
      merged.select(col("node").as("k"), col("cluster").as("merged")))
    (lab, affected)
  }

  /** Nodes first seen in this batch (present in the contracted merge,
    * absent from the labeling). */
  private def newNodes(lab: DataFrame, affected: DataFrame): DataFrame =
    affected.join(lab, affected("k") === lab("node"), "left_anti")
      .select(col("k").as("node"), col("merged").as("cluster"))

  /** Latest-wins resolution of a base+delta label store — the READ
    * path of the perpetual-ingest labeling: `base` is the oldest
    * partition (the compacted snapshot, or the first batch's labeling)
    * and loses to every delta; `deltas` (columns node, cluster,
    * batch_id) resolve among themselves by batch recency.
    *
    * Scale shape: the corpus-sized base NEVER shuffles — only the
    * deltas (O(changed members) per batch) go through the recency
    * window, and the base streams through one anti-join against the
    * resolved delta nodes. The join is unhinted: AQE broadcasts the
    * delta side while it is small and falls back to a shuffled join
    * when a long uncompacted run has let it grow — exactly when
    * [[graft.streaming.IncrementalDedup.compactLabels]] is due. */
  def resolveLabels(base: DataFrame, deltas: DataFrame): DataFrame = {
    // cluster.asc tie-break: a (node, batch_id) duplicated across delta
    // rows (replayed batch, at-least-once sink) must resolve to ONE
    // deterministic label, not whichever row the shuffle happened to
    // order first
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("node")).orderBy(col("batch_id").desc, col("cluster").asc)
    val latest = deltas.select(col("node"), col("cluster"), col("batch_id"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("node"), col("cluster"))
    base.select(col("node"), col("cluster"))
      .join(latest.select(col("node")), Seq("node"), "left_anti")
      .unionByName(latest)
  }
}
