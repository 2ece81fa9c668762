package graft

import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.HeaderDecoder
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The real header decoder: PPM/BMP parse with pure JVM code (no codec);
  * malformed recognized formats fail loudly; unknown magic falls back to
  * the deterministic stub. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ppm(w: Int, h: Int, header: String = null): Array[Byte] = {
    val head = Option(header).getOrElse(s"P6\n$w $h\n255\n")
    head.getBytes("US-ASCII") ++ Array.fill[Byte](w * h * 3)('x'.toByte)
  }

  test("PPM: dims from the header, raster length validated, comments ok") {
    assert(HeaderDecoder.decode(ppm(17, 9)) == ((17L, 9L, 1L)))
    // spec-compliant '#' comment inside the header
    val commented = ("P6\n# made by a camera\n4 3\n255\n").getBytes("US-ASCII") ++
      Array.fill[Byte](4 * 3 * 3)(0)
    assert(HeaderDecoder.decode(commented) == ((4L, 3L, 1L)))
    // 16-bit maxval doubles the raster
    val deep = "P6\n2 2\n65535\n".getBytes("US-ASCII") ++ Array.fill[Byte](2 * 2 * 6)(0)
    assert(HeaderDecoder.decode(deep) == ((2L, 2L, 1L)))
    // truncated raster: loud failure, not garbage dimensions
    val e = intercept[IllegalArgumentException] {
      HeaderDecoder.decode(ppm(5, 5).dropRight(1))
    }
    assert(e.getMessage.contains("raster"), e.getMessage)
    intercept[IllegalArgumentException] {
      HeaderDecoder.decode("P6\nnope\n".getBytes("US-ASCII"))
    }
    // a non-whitespace byte where the raster separator belongs: the
    // raster offset would be wrong, so this must fail, not shift by one
    val sep = intercept[IllegalArgumentException] {
      HeaderDecoder.decode("P6\n2 2\n255X".getBytes("US-ASCII") ++
        Array.fill[Byte](12)(0))
    }
    assert(sep.getMessage.contains("separator"), sep.getMessage)
  }

  test("BMP: DIB-typed dims, truncation and unknown headers fail loudly") {
    def bmp(w: Int, h: Int, dib: Int = 40): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte)
      b.putInt(14, dib)
      if (dib == 12) { b.putShort(18, w.toShort); b.putShort(20, h.toShort) }
      else { b.putInt(18, w); b.putInt(22, h) }
      b.array()
    }
    assert(HeaderDecoder.decode(bmp(640, 480)) == ((640L, 480L, 1L)))
    assert(HeaderDecoder.decode(bmp(100, -50)) == ((100L, 50L, 1L)))
    // BITMAPCOREHEADER: uint16 dims at 18/20 — NOT int32 at 18/22
    assert(HeaderDecoder.decode(bmp(320, 200, dib = 12)) == ((320L, 200L, 1L)))
    intercept[IllegalArgumentException] { HeaderDecoder.decode(bmp(0, 7)) }
    // truncated 'BM' payload: recognized format, loud failure (no stub)
    intercept[IllegalArgumentException] {
      HeaderDecoder.decode("BM truncated".getBytes("US-ASCII"))
    }
    // unknown DIB header type: refuse rather than guess offsets
    intercept[IllegalArgumentException] {
      HeaderDecoder.decode(bmp(10, 10, dib = 16))
    }
    // payload ending before the declared pixel-data offset
    val short = bmp(4, 4)
    java.nio.ByteBuffer.wrap(short).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, 1000)
    val off = intercept[IllegalArgumentException] { HeaderDecoder.decode(short) }
    assert(off.getMessage.contains("offset"), off.getMessage)
  }

  test("unknown magic falls back to the deterministic stub") {
    val p = "not a known container".getBytes("US-ASCII")
    assert(HeaderDecoder.decode(p) == Multimodal.StubDecoder.decode(p))
  }

  test("extractMetaBinary runs the real decode distributed") {
    import spark.implicits._
    val media = Seq((1L, ppm(8, 2)), (2L, ppm(3, 3))).toDF("doc_id", "payload")
    val got = Multimodal.extractMetaBinary(media).collect().sortBy(_.doc_id)
    assert(got.map(m => (m.doc_id, m.width, m.height, m.n_frames)).toSeq ==
      Seq((1L, 8L, 2L, 1L), (2L, 3L, 3L, 1L)))
    assert(got(0).n_bytes == ppm(8, 2).length.toLong)
  }

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("PNG/JPEG/GIF: real JDK ImageIO roundtrip, corrupt payloads fail loudly") {
    assert(HeaderDecoder.decode(encode("png", 17, 9)) == ((17L, 9L, 1L)))
    assert(HeaderDecoder.decode(encode("jpg", 5, 23)) == ((5L, 23L, 1L)))
    assert(HeaderDecoder.decode(encode("gif", 4, 6)) == ((4L, 6L, 1L)))
    // a recognized magic with a mangled body must fail, not fall back
    // to stub dimensions
    val corrupt = encode("png", 17, 9)
    java.util.Arrays.fill(corrupt, 16, corrupt.length, 0x5a.toByte)
    val e = intercept[IllegalArgumentException] { HeaderDecoder.decode(corrupt) }
    assert(e.getMessage.contains("malformed PNG"), e.getMessage)
    // truncation right after the magic likewise
    val trunc = java.util.Arrays.copyOf(encode("png", 3, 3), 10)
    val e2 = intercept[IllegalArgumentException] { HeaderDecoder.decode(trunc) }
    assert(e2.getMessage.contains("malformed PNG"), e2.getMessage)
  }

  private def wav(rate: Int, channels: Int, blockAlign: Int,
      dataBytes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * blockAlign).putShort(blockAlign.toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    bb.array()
  }

  test("WAV: rate/channels/frames from the RIFF walk; malformed fails loudly") {
    // 8000 Hz stereo 16-bit: blockAlign 4; 64 data bytes = 16 frames
    assert(HeaderDecoder.decode(wav(8000, 2, 4, 64)) == ((8000L, 2L, 16L)))
    // missing data chunk
    val noData = java.util.Arrays.copyOf(wav(8000, 2, 4, 64), 36)
    val e = intercept[IllegalArgumentException] { HeaderDecoder.decode(noData) }
    assert(e.getMessage.contains("malformed WAV"), e.getMessage)
    // fmt chunk truncated mid-header
    val shortFmt = java.util.Arrays.copyOf(wav(8000, 2, 4, 64), 20)
    val e2 = intercept[IllegalArgumentException] { HeaderDecoder.decode(shortFmt) }
    assert(e2.getMessage.contains("malformed WAV"), e2.getMessage)
    // adversarial chunk size 0xFFFFFFF8: advanced via .toInt this is -8
    // (word-aligned to 0), i.e. an infinite loop — must fail loudly and
    // promptly instead of hanging the executor task
    val spin = wav(8000, 2, 4, 64)
    val bb = java.nio.ByteBuffer.wrap(spin).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, 0xFFFFFFF8) // fmt chunk size
    val e3 = intercept[IllegalArgumentException] { HeaderDecoder.decode(spin) }
    assert(e3.getMessage.contains("oversized chunk"), e3.getMessage)
    // same for the odd variant whose padding byte also nets zero advance
    bb.putInt(16, 0xFFFFFFF9)
    val e4 = intercept[IllegalArgumentException] { HeaderDecoder.decode(spin) }
    assert(e4.getMessage.contains("oversized chunk"), e4.getMessage)
  }

  test("MP4: tkhd dims + stts frame sum from the box walk; corrupt boxes fail loudly") {
    import graft.pipeline.Multimodal
    // multi-entry stts summed; audio (0×0) trak skipped
    assert(HeaderDecoder.decode(Multimodal.buildMp4(640, 360, 24)) ==
      ((640L, 360L, 24L)))
    assert(HeaderDecoder.decode(Multimodal.buildMp4(16, 16, 1)) ==
      ((16L, 16L, 1L)))
    val good = Multimodal.buildMp4(320, 240, 7)
    val bb = java.nio.ByteBuffer.wrap(good) // big-endian
    // ftyp-but-no-moov fails (recognition by magic, then loud parse)
    val noMoov = java.util.Arrays.copyOf(good, 16)
    val e1 = intercept[IllegalArgumentException] { HeaderDecoder.decode(noMoov) }
    assert(e1.getMessage.contains("no moov"), e1.getMessage)
    // a box size that overruns its container fails instead of reading OOB
    val overrun = good.clone()
    java.nio.ByteBuffer.wrap(overrun).putInt(16, Int.MaxValue) // moov size
    val e2 = intercept[IllegalArgumentException] { HeaderDecoder.decode(overrun) }
    assert(e2.getMessage.contains("overruns"), e2.getMessage)
    // a size below the header length (a non-advancing walk) fails too
    val tiny = good.clone()
    java.nio.ByteBuffer.wrap(tiny).putInt(16, 4)
    val e3 = intercept[IllegalArgumentException] { HeaderDecoder.decode(tiny) }
    assert(e3.getMessage.contains("overruns"), e3.getMessage)
    // truncated mid-moov: the trak's child walk hits a torn box header
    val torn = java.util.Arrays.copyOf(good, good.length - 6)
    intercept[IllegalArgumentException] { HeaderDecoder.decode(torn) }
    bb.rewind() // silence unused warning paths; buffer not needed further
  }

  test("syntheticMp4s → extractMetaBinary: distributed build→parse roundtrip") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    val docs = spark.range(0, 40).select(col("id").as("doc_id"))
    val out = Multimodal.extractMetaBinary(Multimodal.syntheticMp4s(docs))
      .collect().sortBy(_.doc_id)
    assert(out.length == 40)
    out.foreach { m =>
      assert(m.width == m.doc_id % 128 + 16)
      assert(m.height == m.doc_id * 3 % 96 + 16)
      assert(m.n_frames == m.doc_id % 24 + 1)
    }
  }

  test("syntheticPngs → extractMetaBinary: distributed encode→decode roundtrip") {
    import spark.implicits._
    val docs = Seq((0L, "a"), (63L, "b"), (64L, "c"), (100L, "d"))
      .toDF("doc_id", "text")
    val got = Multimodal.extractMetaBinary(Multimodal.syntheticPngs(docs))
      .collect().map(m => m.doc_id -> ((m.width, m.height))).toMap
    assert(got == Map(0L -> ((1L, 1L)), 63L -> ((64L, 16L)),
      64L -> ((1L, 17L)), 100L -> ((37L, 5L))))
  }

  test("audioStats: RIFF walk skips the LIST chunk, decodes LE int16 " +
      "samples, integer features exact") {
    import spark.implicits._
    val samples = Array[Short](100, -200, 2047, -2048, 0)
    val wav = Multimodal.buildWav(16000, samples)
    val media = Seq((7L, wav)).toDF("doc_id", "payload")
    val m = Multimodal.audioStats(media).collect().head
    assert(m.sample_rate == 16000L && m.n_channels == 1L)
    assert(m.n_samples == 5L)
    assert(m.duration_ms == 5L * 1000L / 16000L)
    assert(m.energy == 100L + 200L + 2047L + 2048L + 0L)
    assert(m.peak == 2048L)
  }

  test("audioStats: a recognized-but-truncated WAV fails loudly instead " +
      "of emitting garbage features") {
    import spark.implicits._
    val wav = Multimodal.buildWav(8000, Array[Short](1, 2, 3)).dropRight(2)
    val media = Seq((1L, wav)).toDF("doc_id", "payload")
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.audioStats(media).collect())
    assert(e.getMessage.contains("malformed WAV") ||
      String.valueOf(e.getCause).contains("malformed WAV"))
  }
}
