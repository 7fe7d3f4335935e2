package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.functions.Vectors
import graft.operators.SimilaritySearch

/** Continuous embedding indexing + near-duplicate detection — the
  * vector twin of [[IncrementalDedup]]: each micro-batch of embeddings
  * is PQ-encoded and sign-LSH-bucketed ONCE, candidates are generated
  * by bucket-joining the batch against the accumulated code store, and
  * surviving pairs are verified by the asymmetric PQ cosine (decoded
  * codes on both sides) — so the store carries `m` small ints + a few
  * bucket ints per vector, never the float embeddings, and per batch
  * the work is O(batch + collisions), not O(corpus).
  *
  * The codebook is trained on the FIRST batch (deterministic
  * smallest-hash sample) and persisted beside the store; later batches
  * reuse it, which is what makes codes comparable across batches. Like
  * any PQ index, a drifting embedding distribution eventually warrants
  * re-training + re-encoding — that is a rebuild, not an ingest.
  *
  * Idempotence follows the sibling's layout: both sinks write
  * `batch_id=<n>` overwrite partitions, replays land in place.
  */
object IncrementalAnn {

  /** Ingest new embedding files under `inputDir` once (AvailableNow).
    * Emits (id_a, id_b, approx_cos) pairs with approx_cos >=
    * `minCosine` into `pairsOutDir`; appends (id, code, bucket ints)
    * to `codeStoreDir`. */
  def runOnce(spark: SparkSession, schema: StructType, inputDir: String,
              idCol: String, vecCol: String,
              codeStoreDir: String, pairsOutDir: String, checkpointDir: String,
              dim: Int, m: Int = 8, codewords: Int = 16,
              lshBits: Int = 8, lshTables: Int = 4,
              minCosine: Double = 0.9): Unit = {
    val in = spark.readStream.schema(schema).parquet(inputDir)
      .select(col(idCol), col(vecCol))
    val q = in.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val codebook = loadOrTrainCodebook(s, batch, idCol, vecCol,
          dim, m, codewords, s"$codeStoreDir/_codebook")
        // ONE pass computes codes + blocking buckets from the raw
        // vector; everything downstream reads only these small ints
        val newCodes = batch.select(col(idCol).as("id"),
            graft.plans.VecExprs.pqEncode(col(vecCol), codebook).as("code"),
            Vectors.lshBucketsAll(col(vecCol), lshBits, lshTables).as("buckets"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val existing = IncrementalDedup.readStore(
            s, codeStoreDir, newCodes.schema, glob = "/batch_id=*")
          pairsFromCodes(newCodes, existing, codebook, minCosine)
            .write.mode("overwrite").parquet(s"$pairsOutDir/batch_id=$batchId")
          // append AFTER pairing (the batch must not meet itself twice)
          newCodes.write.mode("overwrite")
            .parquet(s"$codeStoreDir/batch_id=$batchId")
        } finally newCodes.unpersist()
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Batch-vs-store candidate generation + PQ-approximate verification,
    * mirroring `Dedup.incrementalCandidatePairs`: bucket equi-join,
    * pair normalization (each pair once even when both sides are new),
    * cosine computed between DECODED codes — no float vectors anywhere. */
  private[streaming] def pairsFromCodes(newCodes: DataFrame, existing: DataFrame,
                                        codebook: Array[Array[Array[Double]]],
                                        minCosine: Double): DataFrame = {
    def banded(df: DataFrame) = df.select(col("id"), col("code"),
      posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val newBands = banded(newCodes)
    val allBands = banded(existing).unionByName(newBands)
    val pairs = newBands.select(col("id").as("nid"), col("tbl"), col("bucket"))
      .join(allBands, Seq("tbl", "bucket"))
      .filter(col("nid") =!= col("id"))
      .select(least(col("nid"), col("id")).as("id_a"),
        greatest(col("nid"), col("id")).as("id_b"))
      .distinct()
    // decode ONLY ids that appear in a candidate pair (semi-join first:
    // per-batch decode work is O(collisions), not O(store)), and dedup
    // by id so an at-least-once replay — where the store already holds
    // the batch's own codes — cannot multiply verification rows
    val pairIds = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id"))).distinct()
    val all = existing.unionByName(newCodes)
      .join(pairIds, Seq("id"), "left_semi")
      .dropDuplicates("id")
      .select(col("id"), SimilaritySearch.pqDecode(col("code"), codebook).as("dec"))
      .withColumn("nrm", Vectors.norm(col("dec")))
    val a = all.select(col("id").as("id_a"), col("dec").as("dec_a"), col("nrm").as("n_a"))
    val b = all.select(col("id").as("id_b"), col("dec").as("dec_b"), col("nrm").as("n_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .withColumn("approx_cos", Vectors.cosineWithNorms(
        col("dec_a"), col("dec_b"), col("n_a"), col("n_b")))
      .filter(col("approx_cos") >= minCosine)
      .select(col("id_a"), col("id_b"), col("approx_cos"))
  }

  /** First batch trains and persists the codebook; later batches load
    * it (codes are only comparable under one codebook). Stored as one
    * tiny parquet of (mi, ki, codeword). */
  private def loadOrTrainCodebook(spark: SparkSession, batch: DataFrame,
                                  idCol: String, vecCol: String,
                                  dim: Int, m: Int, k: Int,
                                  dir: String): Array[Array[Array[Double]]] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) {
      val rows = spark.read.parquet(dir)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      // a first batch smaller than `k` trains fewer codewords — rebuild
      // from what was actually persisted, not the requested size
      val byMi = rows.groupBy(_._1)
      Array.tabulate(m)(mi => byMi(mi).sortBy(_._2).map(_._3))
    } else {
      val cb = SimilaritySearch.pqTrainCodebook(batch, idCol, vecCol, dim, m, k)
      import spark.implicits._
      cb.zipWithIndex.flatMap { case (cws, mi) =>
        cws.zipWithIndex.map { case (cw, ki) => (mi, ki, cw.toSeq) }
      }.toSeq.toDF("mi", "ki", "codeword").coalesce(1)
        .write.mode("overwrite").parquet(dir)
      cb
    }
  }

}
