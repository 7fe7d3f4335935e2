package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star): image/audio/video payloads
  * travel as opaque `binary` columns with typed metadata, and
  * decode/feature-extract runs per-partition over the raw bytes — the
  * Spark-side shape (schema, batching, partitioning) is real; only the
  * codec itself is a clearly-marked deterministic STUB, because no
  * media libraries ship in this environment.
  *
  * At scale: binary payloads ride the same columnar scans as everything
  * else (parquet binary + dictionary-encoded metadata); decode is a
  * narrow mapPartitions (no shuffle), so a 100 TB corpus decodes at
  * scan speed across executors.
  */
object Multimodal {

  case class MediaMeta(id: Long, format: String, width: Int, height: Int,
                       n_bytes: Long, feature: Array[Float])

  /** Per-partition "decode": parse fake header fields + a 16-dim feature
    * vector from the payload bytes. STUB — a real build would call an
    * image/audio codec here (e.g. javax.imageio / ffmpeg bindings) with
    * exactly this batch shape; everything around the stub (typed output,
    * partition iteration, no driver collect) is production-shaped. */
  def decode(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => stubDecode(id, bytes) })
  }

  private[operators] def stubDecode(id: Long, rawBytes: Array[Byte]): MediaMeta = {
    // ??? real codec goes here; deterministic fake derived from content:
    // (null payloads decode as empty — a real codec would route them to
    // a quarantine column instead of throwing mid-partition)
    val bytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
    val n = bytes.length
    val h = java.util.Arrays.hashCode(bytes)
    val fmt = Seq("png", "jpeg", "wav", "mp4")(math.floorMod(h, 4))
    val width = 64 + math.floorMod(h >> 2, 1024)
    val height = 64 + math.floorMod(h >> 12, 1024)
    val feature = Array.tabulate(16) { i =>
      var acc = 0L
      var j = i
      while (j < n) { acc = (acc * 31 + (bytes(j) & 0xff)) % 1000003L; j += 16 }
      (acc.toFloat / 1000003f) * 2f - 1f
    }
    MediaMeta(id, fmt, width, height, n.toLong, feature)
  }

  /** Frame/window sampling over a binary payload: fixed-stride byte
    * slices standing in for video frame extraction — pure column ops,
    * no decode needed for the slicing itself. */
  def sampleFrames(df: DataFrame, binCol: String, frameSize: Int, stride: Int,
                   maxFrames: Int): DataFrame =
    df.withColumn("frame_idx", explode(sequence(lit(0), lit(maxFrames - 1))))
      .withColumn("frame",
        expr(s"substring($binCol, frame_idx * $stride + 1, $frameSize)"))
      .filter(length(col("frame")) > 0)

  /** Resize: shrink a binary payload by an integer factor (every k-th
    * byte). STUB standing in for a real image resampler — the
    * Spark-side shape is the point: a narrow per-partition map over the
    * binary column, output schema (id, resized payload, old/new sizes),
    * no shuffle, no driver materialization. */
  def resize(df: DataFrame, idCol: String, binCol: String, factor: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, rawBytes) =>
        // ??? real resampler goes here; deterministic decimation stub.
        // Degenerate payloads (null / empty) resize to empty rather than
        // indexing past the end of the array.
        val bytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
        val out =
          if (bytes.isEmpty) Array.emptyByteArray
          else Array.tabulate(math.max(1, bytes.length / factor))(i => bytes(i * factor))
        (id, out, bytes.length.toLong, out.length.toLong)
      })
      .toDF(idCol, "resized", "orig_bytes", "resized_bytes")
  }
}
