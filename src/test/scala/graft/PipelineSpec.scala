package graft

import org.apache.spark.sql.functions._
import graft.api.QueryApi
import graft.operators.Multimodal
import graft.pipeline.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val unified = graft.queries.PipelineQueries
    .queries("u1_unified_pipeline")(spark, sf)

  test("end-to-end pipeline produces matched unified rows with valid scores") {
    val rows = unified.collect()
    assert(rows.nonEmpty)
    val scores = unified.select($"merged_confidence").as[Int].collect()
    assert(scores.forall(s => s >= 80 && s <= 100))
    // abn unique (ON CONFLICT DO NOTHING semantics)
    assert(unified.select($"abn").distinct().count() == rows.length)
  }

  test("blocked pipeline: accepted set is dominated by the exact variant") {
    // blockedJoin scores a SUBSET of the exact product's pairs, so per
    // left key its best score can only be <= the exact best — every
    // blocked-accepted abn must appear in the exact result with at
    // least the blocked confidence. (The reverse direction is the
    // documented recall bound: exact-accepted pairs sharing no rare
    // keyword token are invisible to blocking.)
    val blocked = graft.queries.PipelineQueries
      .queries("u1_blocked_pipeline")(spark, sf)
      .select($"abn", $"merged_confidence".as("conf_b"))
    val exact = unified.select($"abn", $"merged_confidence".as("conf_e"))
    assert(blocked.count() > 0)
    val joined = blocked.join(exact, "abn")
    assert(joined.count() == blocked.count(), "blocked abn not in exact result")
    assert(joined.filter($"conf_b" > $"conf_e").count() == 0,
      "blocked confidence exceeds exact best over superset pairs")
  }

  test("cleaning drops RSS-prefixed and blank candidates") {
    val cleaned = Pipeline.cleanCandidates(
      Seq(("RSS Feed Co", "u1"), ("  ", "u2"), ("Acme Pty Ltd", "u3"))
        .toDF("company_name", "website_url"))
    assert(cleaned.select($"company_name").as[String].collect().toSeq == Seq("Acme Pty Ltd"))
  }

  test("query API: point lookup, substring search, state filter") {
    val one = unified.limit(1).collect().head
    val abn = one.getString(0)
    assert(QueryApi.byKey(unified, abn).count() == 1)
    assert(QueryApi.search(unified, "customer#").count() == unified.count())
    val st = one.getString(6)
    val byState = QueryApi.byState(unified, st)
    assert(byState.count() > 0)
    assert(byState.filter($"state" =!= st).count() == 0)
  }

  test("multimodal decode stub: typed metadata + stable features, frame sampling") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val meta = Multimodal.decode(docs, "doc_id", "payload").collect()
    assert(meta.length == 50)
    assert(meta.forall(m => m.feature.length == 16 && m.n_bytes > 0 && m.width >= 64))
    val again = Multimodal.decode(docs, "doc_id", "payload").collect()
    assert(meta.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)

    val frames = Multimodal.sampleFrames(docs, "payload", 16, 32, 4)
    assert(frames.count() > 0)
    assert(frames.filter(length($"frame") > 16).count() == 0)

    val resized = Multimodal.resize(docs, "doc_id", "payload", 4).collect()
    assert(resized.length == 50)
    assert(resized.forall { r =>
      val (orig, out) = (r.getLong(2), r.getLong(3))
      out == math.max(1, orig / 4)
    })
  }

  test("multimodal stubs survive degenerate payloads (empty / null)") {
    val docs = Seq((1L, Array.emptyByteArray), (2L, null: Array[Byte]),
      (3L, "ok payload".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val meta = Multimodal.decode(docs, "doc_id", "payload")
      .collect().map(m => m.id -> m.n_bytes).toMap
    assert(meta == Map(1L -> 0L, 2L -> 0L, 3L -> 10L))
    val resized = Multimodal.resize(docs, "doc_id", "payload", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(resized(1L) == 0L && resized(2L) == 0L && resized(3L) == 2L)
  }
}
