package graft

import graft.operators.Multimodal

/** Real-codec coverage for the multimodal column operators: binary PPM
  * and PCM-16 WAV are parsed for real (dimensions, channel layout,
  * content features) and resized into VALID smaller files of the same
  * format; unknown formats take the deterministic fallback. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** 8×4 P6 gradient: red ramps left→right, green constant 100, blue 0. */
  private def ppm(w: Int = 8, h: Int = 4): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val raster = Array.tabulate(3 * w * h) { i =>
      val p = i / 3
      (i % 3 match {
        case 0 => (p % w) * 255 / (w - 1) // red ramp
        case 1 => 100
        case 2 => 0
      }).toByte
    }
    header ++ raster
  }

  /** 1-channel PCM-16 WAV: `frames` samples of a square wave. */
  private def wav(frames: Int = 800, rate: Int = 8000, ch: Int = 1): Array[Byte] = {
    val dataLen = frames * 2 * ch
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(36 + dataLen); b.put("WAVE".getBytes)
    b.put("fmt ".getBytes); b.putInt(16); b.putShort(1); b.putShort(ch.toShort)
    b.putInt(rate); b.putInt(rate * 2 * ch); b.putShort((2 * ch).toShort); b.putShort(16)
    b.put("data".getBytes); b.putInt(dataLen)
    for (f <- 0 until frames; _ <- 0 until ch)
      b.putShort(if ((f / 16) % 2 == 0) 16384 else -16384)
    b.array()
  }

  test("PPM decode: true dimensions and channel-mean features") {
    val m = Multimodal.decodeOne(1L, ppm())
    assert(m.format == "ppm" && m.width == 8 && m.height == 4)
    // green mean = 100/255 exactly; blue mean = 0 → feature -1
    assert(math.abs(m.feature(1) - (100.0 / 255 * 2 - 1)) < 1e-6)
    assert(math.abs(m.feature(2) - (-1.0)) < 1e-6)
    // red ramp mean = 255/2 per row-average → about mid-scale
    assert(m.feature(0) > -0.2 && m.feature(0) < 0.2)
  }

  test("PPM resize: valid smaller P6 that re-decodes at the new size") {
    val out = Multimodal.resizeOne(ppm(8, 4), 2)
    val m = Multimodal.decodeOne(2L, out)
    assert(m.format == "ppm" && m.width == 4 && m.height == 2)
    // nearest-neighbor keeps channel structure: green still exactly 100
    assert(math.abs(m.feature(1) - (100.0 / 255 * 2 - 1)) < 1e-6)
  }

  test("WAV decode: frames/channels recovered, square wave has RMS ~1") {
    val m = Multimodal.decodeOne(3L, wav(800, 8000, 1))
    assert(m.format == "wav" && m.width == 800 && m.height == 1)
    // |sample| = 0.5 everywhere → rms 0.5 → feature(0) = 0
    assert(math.abs(m.feature(0)) < 0.01)
    val stereo = Multimodal.decodeOne(4L, wav(400, 8000, 2))
    assert(stereo.width == 400 && stereo.height == 2)
  }

  test("WAV resize: decimated file is a valid WAV with proportional frames") {
    val out = Multimodal.resizeOne(wav(800, 8000, 1), 4)
    val m = Multimodal.decodeOne(5L, out)
    assert(m.format == "wav" && m.width == 200 && m.height == 1)
    // square wave survives decimation: energy unchanged
    assert(math.abs(m.feature(0)) < 0.01)
  }

  test("unknown formats keep the deterministic fallback, end to end") {
    val junk = Array.tabulate(64)(i => (i * 37 % 251).toByte)
    val viaDataset = Multimodal.decode(
        Seq((9L, junk)).toDF("doc_id", "payload"), "doc_id", "payload")
      .collect().head
    val direct = Multimodal.decodeOne(9L, junk)
    assert((viaDataset.format, viaDataset.width, viaDataset.height, viaDataset.n_bytes) ==
      (direct.format, direct.width, direct.height, direct.n_bytes))
    assert(viaDataset.feature.sameElements(direct.feature))
    assert(viaDataset.format != "ppm")
  }

  test("malformed WAV with a huge chunk length falls back, never throws") {
    // crafted chunk len near Int.MaxValue: naive Int bounds math wraps
    // negative and indexes out of bounds
    val b = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(36); b.put("WAVE".getBytes)
    b.put("JUNK".getBytes); b.putInt(0x7ffffff0)
    b.put(new Array[Byte](16))
    val m = Multimodal.decodeOne(7L, b.array())
    assert(m.format != "wav") // deterministic fallback, no exception
    assert(Multimodal.resizeOne(b.array(), 4).nonEmpty)
  }

  test("tall 1xN PPM resizes without Int overflow in the coordinate math") {
    val h = 70000
    val header = s"P6\n1 $h\n255\n".getBytes("US-ASCII")
    val img = header ++ Array.fill(3 * h)(7.toByte)
    val out = Multimodal.resizeOne(img, 2)
    val m = Multimodal.decodeOne(8L, out)
    assert(m.format == "ppm" && m.width == 1 && m.height == h / 2)
  }

  test("mixed-format frame runs through the distributed decode path") {
    val df = Seq((1L, ppm()), (2L, wav()), (3L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val metas = Multimodal.decode(df, "doc_id", "payload")
      .collect().map(m => m.id -> m.format).toMap
    assert(metas(1L) == "ppm" && metas(2L) == "wav")
    assert(metas(3L) != "ppm" && metas(3L) != "wav")
  }
}
