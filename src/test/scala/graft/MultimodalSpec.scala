package graft

import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.HeaderDecoder
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
}
