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
  }

  test("BMP: little-endian dims at 18/22; negative height = top-down") {
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(54)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte)
      b.putInt(18, w); b.putInt(22, h)
      b.array()
    }
    assert(HeaderDecoder.decode(bmp(640, 480)) == ((640L, 480L, 1L)))
    assert(HeaderDecoder.decode(bmp(100, -50)) == ((100L, 50L, 1L)))
    intercept[IllegalArgumentException] { HeaderDecoder.decode(bmp(0, 7)) }
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
