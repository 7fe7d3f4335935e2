package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star): image/audio/video payloads
  * travel as opaque `binary` columns with typed metadata, and
  * decode/feature-extract runs per-partition over the raw bytes.
  *
  * Two REAL codecs are implemented in pure JVM byte parsing — binary
  * PPM (P6) images and PCM-16 WAV audio — because those formats need
  * no external library: decode yields true dimensions/channel layout
  * and content features (channel means + luminance histogram for
  * images; RMS + zero-crossing rate + energy profile for audio), and
  * resize is a real nearest-neighbor downscale (images) / frame
  * decimation (audio) producing VALID smaller files of the same
  * format. Payloads in any other format take the clearly-marked
  * deterministic fallback (no jpeg/mp4 codec ships in this
  * environment; a real build would route them to javax.imageio /
  * ffmpeg bindings with exactly this batch shape).
  *
  * At scale: binary payloads ride the same columnar scans as everything
  * else (parquet binary + dictionary-encoded metadata); decode is a
  * narrow mapPartitions (no shuffle), so a 100 TB corpus decodes at
  * scan speed across executors.
  */
object Multimodal {

  case class MediaMeta(id: Long, format: String, width: Int, height: Int,
                       n_bytes: Long, feature: Array[Float])

  /** Per-partition decode: real PPM/WAV parsing when the magic bytes
    * match, deterministic fallback otherwise. Null payloads decode as
    * empty — a real pipeline would route them to a quarantine column
    * instead of throwing mid-partition. A NULL id fails with a NAMED
    * error ([[requireId]]) instead of the tuple encoder's opaque
    * 'Null value appeared in non-nullable field' task death. */
  def decode(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(requireId(df, idCol), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeOne(id, bytes) })
  }

  /** The id column cast to long, with NULLs converted from an encoder
    * crash into a named error: MediaMeta.id is a primitive, so an
    * id-less payload row cannot be represented — quarantine those
    * upstream. */
  private def requireId(df: DataFrame, idCol: String) =
    when(col(idCol).isNull, raise_error(lit(
        s"multimodal: NULL $idCol — every payload row needs a non-null " +
          "id; quarantine id-less rows upstream")).cast("long"))
      .otherwise(col(idCol).cast("long"))

  private[graft] def decodeOne(id: Long, rawBytes: Array[Byte]): MediaMeta = {
    val bytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
    ppmDecode(id, bytes).orElse(wavDecode(id, bytes))
      .getOrElse(fallbackDecode(id, bytes))
  }

  // ───── PPM (P6): pure header + raw RGB raster ─────

  /** (width, height, maxval, rasterOffset) if `b` is a well-formed
    * binary PPM with a complete raster. */
  private[graft] def ppmHeader(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    var i = 2
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      while (i < b.length &&
        (Character.isWhitespace(b(i).toChar) || b(i) == '#')) {
        if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else i += 1
      }
      var x = 0
      var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        x = x * 10 + (b(i) - '0'); i += 1; any = true
        // a crafted 20-digit dimension would wrap Int and could land on
        // a small positive value that mis-sizes the raster check
        if (x > (1 << 24)) return None
      }
      if (!any) return None
      vals(v) = x
      v += 1
    }
    // exactly one whitespace byte separates the header from the raster
    if (i >= b.length || !Character.isWhitespace(b(i).toChar)) return None
    val off = i + 1
    val (w, h, maxv) = (vals(0), vals(1), vals(2))
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    if (b.length.toLong < off.toLong + 3L * w * h) return None
    Some((w, h, maxv, off))
  }

  /** Feature: [r̄, ḡ, b̄] channel means + 13-bin luminance histogram,
    * all scaled to [-1, 1]. */
  private def ppmDecode(id: Long, b: Array[Byte]): Option[MediaMeta] =
    ppmHeader(b).map { case (w, h, maxv, off) =>
      val n = w * h
      val sums = new Array[Long](3)
      val hist = new Array[Long](13)
      var p = 0
      while (p < n) {
        // clamp to the declared maxval: a corrupt raster whose bytes
        // exceed it would otherwise push the "normalized" features to
        // ±(255/maxv), hundreds of times outside the contracted
        // [-1, 1] (a maxval=1 file with 0xFF bytes → ~509) — and the
        // histogram index below relies on lum <= maxv
        val r = math.min(b(off + 3 * p) & 0xff, maxv)
        val g = math.min(b(off + 3 * p + 1) & 0xff, maxv)
        val bb = math.min(b(off + 3 * p + 2) & 0xff, maxv)
        sums(0) += r; sums(1) += g; sums(2) += bb
        // integer luminance (Rec.601 weights scaled ×1000)
        val lum = (299 * r + 587 * g + 114 * bb) / 1000
        hist(math.min(12, lum * 13 / (maxv + 1))) += 1
        p += 1
      }
      val feature = Array.tabulate(16) { k =>
        if (k < 3) (sums(k).toDouble / n / maxv * 2 - 1).toFloat
        else (hist(k - 3).toDouble / n * 2 - 1).toFloat
      }
      MediaMeta(id, "ppm", w, h, b.length.toLong, feature)
    }

  // ───── WAV (RIFF/PCM-16): chunk walk, no codec needed ─────

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** (channels, sampleRate, dataOffset, dataLen) for PCM-16 WAV. */
  private[graft] def wavHeader(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def tag(i: Int, s: String): Boolean =
      b.length >= i + 4 && s.indices.forall(j => b(i + j) == s(j).toByte)
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    // bounds math in Long: a crafted chunk length near Int.MaxValue
    // must fail the guard, not wrap negative and index out of bounds
    var i = 12L
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val len = le32(b, i.toInt + 4).toLong & 0xffffffffL
      if (i + 8 + len > b.length) return None
      val at = i.toInt
      if (tag(at, "fmt ") && len >= 16) {
        val audioFormat = le16(b, at + 8)
        if (audioFormat != 1) return None // PCM only
        fmt = Some((le16(b, at + 10), le32(b, at + 12), le16(b, at + 22)))
      } else if (tag(at, "data")) data = Some((at + 8, len.toInt))
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    for {
      (ch, rate, bits) <- fmt
      (off, len) <- data
      if bits == 16 && ch > 0 && len >= 2 * ch
    } yield (ch, rate, off, len)
  }

  /** Feature: [rms, zero-crossing rate] + 14-window energy profile,
    * over channel-averaged samples; width = frames, height = channels. */
  private def wavDecode(id: Long, b: Array[Byte]): Option[MediaMeta] =
    wavHeader(b).map { case (ch, rate, off, len) =>
      val frames = len / (2 * ch)
      val mono = new Array[Double](frames)
      var f = 0
      while (f < frames) {
        var acc = 0.0
        var c = 0
        while (c < ch) {
          acc += le16(b, off + 2 * (f.toLong * ch + c).toInt).toShort.toInt
          c += 1
        }
        mono(f) = acc / ch / 32768.0
        f += 1
      }
      var sq = 0.0
      var crossings = 0
      f = 0
      while (f < frames) {
        sq += mono(f) * mono(f)
        if (f > 0 && (mono(f) >= 0) != (mono(f - 1) >= 0)) crossings += 1
        f += 1
      }
      val rms = math.sqrt(sq / frames)
      val windows = new Array[Double](14)
      val winCnt = new Array[Int](14)
      f = 0
      while (f < frames) {
        val w = math.min(13, f.toLong * 14 / frames).toInt
        windows(w) += mono(f) * mono(f)
        winCnt(w) += 1
        f += 1
      }
      val feature = Array.tabulate(16) { k =>
        if (k == 0) (rms * 2 - 1).toFloat
        else if (k == 1) (crossings.toDouble / math.max(1, frames - 1) * 2 - 1).toFloat
        // normalize by the window's ACTUAL sample count: the f*14/frames
        // assignment gives windows floor(frames/14) OR one more sample,
        // and a flat floor(frames/14) normalizer lets the larger
        // windows' energy exceed the contracted [-1, 1] (15 full-scale
        // frames: a 2-sample window over perWin=1 → feature ~1.83)
        else (math.sqrt(windows(k - 2) / math.max(1, winCnt(k - 2))) * 2 - 1).toFloat
      }
      MediaMeta(id, "wav", frames, ch, b.length.toLong, feature)
    }

  // ───── fallback for formats without an in-JVM codec ─────

  /** Deterministic content-derived fake for payloads no shipped codec
    * can parse — a real build routes these to external codec bindings
    * with the same batch shape. */
  private[graft] def fallbackDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
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
                   maxFrames: Int): DataFrame = {
    // loud argument errors, not downstream surprises (the
    // pqTrainCodebook convention): maxFrames = 0 would make
    // sequence(0, -1) auto-DESCEND to [0, -1], and the -1 frame's
    // negative substring start reads a garbage slice from the END of
    // the payload
    require(frameSize >= 1 && stride >= 1 && maxFrames >= 1,
      s"need frameSize >= 1, stride >= 1, maxFrames >= 1 " +
        s"(got $frameSize, $stride, $maxFrames)")
    // the sequence is bounded by the LAST REACHABLE frame, not blindly
    // by maxFrames: (a) a large maxFrames × stride would overflow the
    // Int multiply in the offset (ANSI kills the job; pre-ANSI the
    // negative substring start silently reads garbage tail slices),
    // so the offset math runs in LONG on only-reachable indexes; and
    // (b) exploding maxFrames rows per short payload just to filter
    // them is a maxFrames× row amplification through the narrow stage.
    // A null payload does NOT zero the bound — greatest() SKIPS null
    // arguments, so lastReachable is 0 and one frame_idx row explodes;
    // its substring(null, …) frame is null and the length(frame) > 0
    // filter below is what actually drops it. The filter is
    // load-bearing for null payloads — do not remove it on the theory
    // that the sequence bound already handles them.
    val lastReachable = greatest(lit(0L),
      ((length(col(binCol)).cast("long") - 1L) / lit(stride.toLong)).cast("long"))
    df.withColumn("frame_idx",
        explode(sequence(lit(0L), least(lit(maxFrames - 1L), lastReachable))))
      .withColumn("frame",
        expr(s"substring($binCol, frame_idx * ${stride}L + 1, $frameSize)"))
      .filter(length(col("frame")) > 0)
  }

  /** Resize: REAL nearest-neighbor downscale for PPM payloads and
    * frame decimation for PCM-16 WAV — both emit a VALID smaller file
    * of the same format; anything else falls back to byte decimation.
    * Narrow per-partition map over the binary column: no shuffle, no
    * driver materialization. */
  def resize(df: DataFrame, idCol: String, binCol: String, factor: Int): DataFrame = {
    // factor = 0 would surface as a raw '/ by zero' mid-partition
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(requireId(df, idCol), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, rawBytes) =>
        val bytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
        val out = resizeOne(bytes, factor)
        (id, out, bytes.length.toLong, out.length.toLong)
      })
      .toDF(idCol, "resized", "orig_bytes", "resized_bytes")
  }

  private[graft] def resizeOne(bytes: Array[Byte], factor: Int): Array[Byte] =
    ppmHeader(bytes).map { case (w, h, maxv, off) =>
      val nw = math.max(1, w / factor)
      val nh = math.max(1, h / factor)
      val header = s"P6\n$nw $nh\n$maxv\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + 3 * nw * nh)
      System.arraycopy(header, 0, out, 0, header.length)
      var y = 0
      while (y < nh) {
        var x = 0
        while (x < nw) {
          // nearest-neighbor: source pixel at the scaled coordinate —
          // Long math: y*h overflows Int for valid tall/wide images
          val sy = math.min(h - 1L, y.toLong * h / nh).toInt
          val sx = math.min(w - 1L, x.toLong * w / nw).toInt
          val src = off + 3 * (sy * w + sx)
          val dst = header.length + 3 * (y * nw + x)
          out(dst) = bytes(src); out(dst + 1) = bytes(src + 1); out(dst + 2) = bytes(src + 2)
          x += 1
        }
        y += 1
      }
      out
    }.orElse(wavHeader(bytes).map { case (ch, rate, off, len) =>
      val frameBytes = 2 * ch
      val frames = len / frameBytes
      val nFrames = math.max(1, frames / factor)
      val newRate = math.max(1, rate / factor)
      val dataLen = nFrames * frameBytes
      val out = new Array[Byte](44 + dataLen)
      // canonical 44-byte PCM header rebuilt from the parsed fields
      def putTag(i: Int, s: String): Unit =
        s.indices.foreach(j => out(i + j) = s(j).toByte)
      def put16(i: Int, v: Int): Unit = {
        out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      }
      def put32(i: Int, v: Int): Unit = {
        put16(i, v & 0xffff); put16(i + 2, (v >> 16) & 0xffff)
      }
      putTag(0, "RIFF"); put32(4, 36 + dataLen); putTag(8, "WAVE")
      putTag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, ch)
      put32(24, newRate); put32(28, newRate * frameBytes)
      put16(32, frameBytes); put16(34, 16)
      putTag(36, "data"); put32(40, dataLen)
      var f = 0
      while (f < nFrames) {
        System.arraycopy(bytes, off + (f * factor) * frameBytes,
          out, 44 + f * frameBytes, frameBytes)
        f += 1
      }
      out
    }).getOrElse {
      if (bytes.isEmpty) Array.emptyByteArray
      else Array.tabulate(math.max(1, bytes.length / factor))(i => bytes(i * factor))
    }
}
