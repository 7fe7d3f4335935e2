package graft

import org.apache.spark.sql.functions._
import graft.operators.Components

/** C-2: connected components by min-label propagation. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain collapses to one cluster labeled by its min node") {
    // diameter > 1 forces multi-round propagation
    val out = run(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (1L, 0L)))
    assert(out == (0L to 5L).map(_ -> 0L).toMap)
  }

  test("disjoint components get distinct labels; isolated nodes absent") {
    val out = run(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("pointer jumping closes a 64-link chain within O(log n) rounds") {
    // plain 1-hop propagation would need 63 rounds; shortcutting must
    // finish well inside 12 (≈ log2 + settle)
    val edges = (0L until 63L).map(i => (i, i + 1))
    val out = Components.connectedComponents(edges.toDF("a", "b"), "a", "b",
      maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == (0L to 63L).map(_ -> 0L).toMap)
  }

  test("matches union-find on a random graph") {
    val rnd = new scala.util.Random(23)
    val edges = (1 to 120).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val got = run(edges)
    // reference union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
    assert(got == want)
  }

  // ───── star contraction (large-star/small-star) ─────

  // localCap = 0 forces the distributed iteration; the default exercises
  // the size-gated driver fast path (these graphs are all tiny)
  private def runStar(edges: Seq[(Long, Long)], maxIter: Int = 40,
                      localCap: Long = Components.LocalIterationCap): Map[Long, Long] =
    Components.connectedComponentsStar(edges.toDF("a", "b"), "a", "b", maxIter,
        localCap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction: label-equality with min-label propagation on a chain") {
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (1L, 0L))
    assert(runStar(edges) == run(edges))
  }

  test("star contraction: label-equality on a clique plus satellites") {
    val clique = for { a <- 10L to 15L; b <- 10L to 15L if a < b } yield (a, b)
    val edges = clique ++ Seq((15L, 99L), (3L, 4L), (7L, 7L))
    assert(runStar(edges) == run(edges))
    // self-pair-only node labels itself, matching the sibling impl
    assert(runStar(edges)(7L) == 7L)
  }

  test("star contraction: label-equality on random graphs across seeds, both paths") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 150).map(_ => (rnd.nextInt(70).toLong, rnd.nextInt(70).toLong))
        .filter { case (a, b) => a != b }
      val want = run(edges)
      assert(runStar(edges) == want, s"seed $seed: local fast path diverged")
      assert(runStar(edges, localCap = 0) == want,
        s"seed $seed: distributed iteration diverged")
    }
  }

  test("star contraction closes a 64-link chain within 12 rounds") {
    // a distributed-iteration property — force past the local fast path
    val edges = (0L until 63L).map(i => (i, i + 1))
    assert(runStar(edges, maxIter = 12, localCap = 0) ==
      (0L to 63L).map(_ -> 0L).toMap)
  }

  test("star contraction on empty edge set returns no rows") {
    assert(runStar(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("star contraction: generic over orderable id types (strings), both paths") {
    val edges = Seq(("doc-b", "doc-a"), ("doc-c", "doc-b"), ("doc-x", "doc-y"))
    for (cap <- Seq(Components.LocalIterationCap, 0L)) {
      val out = Components.connectedComponentsStar(
          edges.toDF("a", "b"), "a", "b", 40, cap)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(out == Map("doc-a" -> "doc-a", "doc-b" -> "doc-a",
        "doc-c" -> "doc-a", "doc-x" -> "doc-x", "doc-y" -> "doc-x"),
        s"cap=$cap")
    }
  }

  test("star contraction: local path orders strings as UTF-8 bytes, like Spark min()") {
    // U+E000 sorts BELOW U+1F600 in UTF-8 bytes but ABOVE it in Java's
    // UTF-16 code units (surrogates < 0xE000) — the local fast path must
    // pick the same component minimum the distributed min() would
    val edges = Seq(("doc-\uE000", "doc-\ud83d\ude00"))
    val byCap = Seq(Components.LocalIterationCap, 0L).map { cap =>
      Components.connectedComponentsStar(edges.toDF("a", "b"), "a", "b", 40, cap)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    }
    assert(byCap.head == byCap.last, s"paths disagree: $byCap")
    assert(byCap.head.values.toSet == Set("doc-\uE000"))
  }

  test("star contraction: giant cluster + long chain close in bounded rounds") {
    // the adversarial mix min-label propagation struggles with: one
    // 3000-member hub cluster (every member would hammer the min label)
    // plus a 2000-link chain (deep diameter) plus background pairs
    val hub = (1L to 3000L).map(i => (100000L + i, 50L))
    val chain = (0L until 2000L).map(i => (200000L + i, 200000L + i + 1))
    val background = (1 to 500).map(i => (300000L + i * 2L, 300000L + i * 2L + 1))
    val edges = hub ++ chain ++ background
    // bounded-round convergence is a distributed-iteration property
    val out = Components.connectedComponentsStar(
        edges.toDF("a", "b"), "a", "b", maxIter = 15, localCap = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 3001 + 2001 + 1000)
    assert(hub.forall(e => out(e._1) == 50L) && out(50L) == 50L)
    assert(chain.forall(e => out(e._1) == 200000L && out(e._2) == 200000L))
    assert(background.forall(e => out(e._2) == e._1))
  }

  test("star contraction fails loudly when maxIter is exhausted") {
    // a 64-chain cannot close in 1 round — silent wrong labels are the
    // one unacceptable outcome
    val edges = (0L until 63L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      Components.connectedComponentsStar(edges.toDF("a", "b"), "a", "b",
        maxIter = 1, localCap = 0).collect()
    }
  }

  // ───── incremental cluster maintenance ─────

  test("incremental merge equals full recompute on randomized ingest sequences") {
    for (seed <- Seq(3, 11, 29)) {
      val rnd = new scala.util.Random(seed)
      // dense id space → constant cluster merging across batches
      val all = (1 to 200).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter { case (a, b) => a != b }
      val cut1 = all.length * 3 / 5
      val cut2 = all.length * 4 / 5
      var labels = Components.connectedComponentsStar(
        all.take(cut1).toDF("a", "b"), "a", "b")
      for (batch <- Seq(all.slice(cut1, cut2), all.drop(cut2)))
        labels = Components.mergeIncrementalClusters(
          labels, batch.toDF("a", "b"), "a", "b")
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = runStar(all)
      assert(got == want, s"seed $seed: incremental diverged from recompute")
    }
  }

  test("delta store: latest-wins resolution equals full recompute over randomized ingest sequences") {
    // the continuous pipeline persists per-batch DELTAS and resolves
    // latest-batch-wins per node; over any ingest order that resolution
    // must equal one star CC over the full edge set
    for (seed <- Seq(7, 21, 63)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(60)(
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }.distinct
      val shuffled = rnd.shuffle(edges)
      val nBatches = 2 + rnd.nextInt(3)
      val batches = shuffled.grouped(
        math.max(1, (shuffled.size + nBatches - 1) / nBatches)).toSeq
      // store: batchId → delta rows; resolution = latest batch wins
      var store = Map.empty[Int, Map[Long, Long]]
      def resolve: Map[Long, Long] =
        store.toSeq.sortBy(_._1).foldLeft(Map.empty[Long, Long]) {
          case (acc, (_, delta)) => acc ++ delta
        }
      for ((batch, bi) <- batches.zipWithIndex) {
        val current = resolve.toSeq.toDF("node", "cluster")
        val delta = Components.mergeIncrementalClustersDelta(
            current, batch.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // the delta is genuinely a delta: no row repeats the current label
        val redundant = delta.filter { case (n, c) => resolve.get(n).contains(c) }
        assert(redundant.isEmpty, s"seed $seed batch $bi: $redundant")
        store += bi -> delta
      }
      val want = runStar(edges)
      assert(resolve == want, s"seed $seed: delta resolution diverged")
    }
  }

  test("incremental merge: attach-only batch leaves other clusters untouched") {
    val labels = Components.connectedComponentsStar(
      Seq((1L, 2L), (10L, 11L)).toDF("a", "b"), "a", "b")
    // 50 is new and attaches to cluster 1; cluster 10 must not change
    val out = Components.mergeIncrementalClusters(
        labels, Seq((2L, 50L)).toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 50L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("incremental merge: batch bridging two clusters takes the global min") {
    val labels = Components.connectedComponentsStar(
      Seq((3L, 7L), (5L, 9L)).toDF("a", "b"), "a", "b")
    val out = Components.mergeIncrementalClusters(
        labels, Seq((7L, 9L)).toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(3L -> 3L, 7L -> 3L, 5L -> 3L, 9L -> 3L))
  }

  test("delta store: duplicated (node, batch_id) rows resolve to one deterministic label") {
    // an at-least-once sink can replay a batch and land the same
    // (node, batch_id) twice with conflicting labels — resolution must
    // not depend on shuffle order
    val base = Seq((1L, 1L), (2L, 1L)).toDF("node", "cluster")
    val deltas = Seq((2L, 9L, 3L), (2L, 5L, 3L), (3L, 7L, 2L), (3L, 4L, 3L))
      .toDF("node", "cluster", "batch_id")
    for (trial <- 1 to 3) {
      val out = Components.resolveLabels(base, deltas.repartition(4))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(out == Map(1L -> 1L, 2L -> 5L, 3L -> 4L), s"trial $trial: $out")
    }
  }
}
