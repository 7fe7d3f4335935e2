package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star similarity-search operators).
  *
  * Scale design: [[bruteForceTopK]] broadcasts the (small) query set and
  * streams the candidate corpus — one scan, no shuffle of the corpus,
  * per-partition scoring, then a per-query top-k window over only
  * queries×k-ish survivors. Norms are precomputed per side so the pair
  * stage is a single dot product. [[lshTopK]] buckets both sides with
  * deterministic sign-LSH hyperplanes and only scores within-bucket
  * pairs — candidate volume drops from Q×N to Q×(N/2^bits) on average;
  * recall is tunable via `bits` (fewer bits → bigger buckets → higher
  * recall). [[ivfTopK]] probes coarse partitions by nearest centroid.
  */
object SimilaritySearch {

  private def prep(df: DataFrame, idCol: String, vecCol: String, p: String): DataFrame = {
    val base = if (p == "c") graft.model.Tables.spread(df) else df
    base.select(col(idCol).as(s"${p}_id"), col(vecCol).as(s"${p}_vec"))
      .withColumn(s"${p}_norm", Vectors.norm(col(s"${p}_vec")))
  }

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id").asc)
    // slim BEFORE the window: the rank shuffle+sort moves (ids, cosine),
    // never the embedding payloads
    scored.select(col("q_id"), col("c_id"), col("cosine"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("rank"), col("cosine"))
  }

  /** Exact top-k cosine neighbors for each query vector (self excluded). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = prep(queries, idCol, vecCol, "q")
    val c = prep(corpus, idCol, vecCol, "c")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", Vectors.cosineWithNorms(
        col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
    rankTopK(scored, k)
  }

  /** Approximate top-k: only candidates sharing a sign-LSH bucket with
    * the query in at least one of `tables` independent hyperplane
    * families are scored (OR-amplification: more tables → higher recall,
    * proportionally more candidates). */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int, bits: Int,
              tables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, p: String): DataFrame = {
      val withBuckets = df.withColumn("buckets",
        Vectors.lshBucketsAll(col(s"${p}_vec"), bits, tables))
      withBuckets.select(col("*"), posexplode(col("buckets")).as(Seq("tbl", "bucket")))
        .drop("buckets")
    }
    val q = bucketed(prep(queries, idCol, vecCol, "q"), "q")
    val c = bucketed(prep(corpus, idCol, vecCol, "c"), "c")
    val cand = c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("q_vec"), col("q_norm"),
        col("c_id"), col("c_vec"), col("c_norm"))
      .dropDuplicates("q_id", "c_id")
    val scored = cand.withColumn("cosine", Vectors.cosineWithNorms(
      col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
    rankTopK(scored, k)
  }

  /** IVF with DETERMINISTIC centroids: per-cluster, per-dimension exact
    * medians (order statistics are partition-order-independent, and
    * Spark `percentile(0.5)` interpolates identically to DuckDB
    * `median` — bitwise), so this ANN variant carries a full oracle
    * unlike the FP-mean [[ivfTopK]]. Probe the `nProbe` nearest
    * centroids by cosine, score only vectors in probed clusters. */
  def ivfMedianTopK(queries: DataFrame, corpus: DataFrame,
                    idCol: String, vecCol: String, clusterCol: String,
                    dim: Int, k: Int, nProbe: Int): DataFrame = {
    val centroids = corpus.groupBy(col(clusterCol).as("cluster"))
      .agg(array((0 until dim).map(i =>
        percentile(element_at(col(vecCol), i + 1).cast("double"), lit(0.5))): _*).as("centroid"))
    val q = prep(queries, idCol, vecCol, "q")
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist", Vectors.cosineWithNorms(
        col("q_vec"), col("centroid"), col("q_norm"), Vectors.norm(col("centroid"))))
      .withColumn("prank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cdist").desc, col("cluster").asc)))
      .filter(col("prank") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("q_norm"), col("cluster"))
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
      col(clusterCol).as("cluster"))
      .withColumn("c_norm", Vectors.norm(col("c_vec")))
    val scored = c.join(broadcast(probes), "cluster")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", Vectors.cosineWithNorms(
        col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
    rankTopK(scored, k)
  }

  /** IVF-style coarse quantization: centroids = per-cluster mean vectors
    * (computed from a labeled/assigned corpus), probe = nearest
    * `nProbe` centroids, score only vectors in probed clusters.
    * Centroid averaging is FP-order-dependent, so this operator is for
    * the scale path (no bitwise oracle). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, clusterCol: String,
              k: Int, nProbe: Int): DataFrame = {
    val dim = 64
    val centroids = corpus.groupBy(col(clusterCol).as("cluster"))
      .agg(array((0 until dim).map(i => avg(element_at(col(vecCol), i + 1))): _*).as("centroid"))
    val q = prep(queries, idCol, vecCol, "q")
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist", Vectors.cosineWithNorms(
        col("q_vec"), col("centroid"), col("q_norm"), Vectors.norm(col("centroid"))))
      .withColumn("prank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cdist").desc, col("cluster").asc)))
      .filter(col("prank") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("q_norm"), col("cluster"))
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
      col(clusterCol).as("cluster"))
      .withColumn("c_norm", Vectors.norm(col("c_vec")))
    val scored = c.join(broadcast(probes), "cluster")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", Vectors.cosineWithNorms(
        col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
    rankTopK(scored, k)
  }
}
