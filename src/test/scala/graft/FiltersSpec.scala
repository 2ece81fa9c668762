package graft

import graft.filters._
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip and framing properties pinned by the reference's filter tests
  * (test/io/mandoline/filters/lz4_test.clj:10-36, chain_test.clj:8-39).
  * Seeded-random property loops (the scalacheck/scalatest bridge isn't in
  * the offline cache). */
class FiltersSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private def randomBytes(maxLen: Int = 40000): Array[Byte] = {
    val n = 1 + rnd.nextInt(maxLen)
    // mix of compressible and incompressible segments
    if (rnd.nextBoolean()) Array.fill[Byte](n)((rnd.nextInt(3)).toByte)
    else Array.fill[Byte](n)(rnd.nextInt().toByte)
  }

  test("lz4 round trip, arbitrary bytes") {
    for (_ <- 1 to 50) {
      val data = randomBytes()
      val enc = Lz4Filter.apply(data)
      assert(java.util.Arrays.equals(Lz4Filter.reverse(enc, 0, enc.length), data))
    }
  }

  test("lz4 stores raw (marker 0) for incompressible data; expansion ≤ input+1") {
    val rnd = new scala.util.Random(42)
    val data = Array.fill[Byte](10000)(rnd.nextInt().toByte)
    val enc = Lz4Filter.apply(data)
    assert(enc(0) == 0 && enc.length == data.length + 1)
  }

  test("lz4 compresses redundant data (marker 1, LE length header)") {
    val data = Array.fill[Byte](54000)(7)
    val enc = Lz4Filter.apply(data)
    assert(enc(0) == 1)
    val len = java.nio.ByteBuffer.wrap(enc, 1, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(len == 54000 && enc.length < data.length / 2)
  }

  test("deflate round trip incl >64KiB payloads (fixes reference cap at deflate.clj:37-39)") {
    val big = Array.tabulate[Byte](200000)(i => (i % 251).toByte)
    val enc = DeflateFilter.apply(big)
    assert(java.util.Arrays.equals(DeflateFilter.reverse(enc, 0, enc.length), big))
  }

  test("chain framing: [0][count][codes][payload]; auto-detect decode (chain_test)") {
    val data = Array.fill[Byte](5000)(3)
    val framed = FilterChain.encode(Seq("lz4"), data)
    assert(framed(0) == 0 && framed(1) == 1 && framed(2) == 1)
    assert(java.util.Arrays.equals(FilterChain.decode(framed), data))
    // empty chain
    val plain = FilterChain.encode(Nil, data)
    assert(plain(0) == 0 && plain(1) == 0)
    assert(java.util.Arrays.equals(FilterChain.decode(plain), data))
    // multi-filter chain reverses right-to-left
    val multi = FilterChain.encode(Seq("deflate", "lz4"), data)
    assert(multi(1) == 2 && multi(2) == 3 && multi(3) == 1)
    assert(java.util.Arrays.equals(FilterChain.decode(multi), data))
    // lz4hc
    val hc = FilterChain.encode(Seq("lz4hc"), data)
    assert(java.util.Arrays.equals(FilterChain.decode(hc), data))
  }

  test("unknown filter name throws") {
    intercept[IllegalArgumentException] { FilterChain.encode(Seq("snappy"), Array[Byte](1)) }
  }

  test("zstd (extension code 4): round trip, raw marker on incompressible, " +
      "beats lz4 on redundant data, mixes into chains") {
    import graft.filters.{ZstdFilter, Lz4Filter}
    val redundant = Array.tabulate[Byte](60000)(i => (i % 17).toByte)
    val z = ZstdFilter(redundant)
    assert(z(0) == 1 && java.util.Arrays.equals(
      ZstdFilter.reverse(z, 0, z.length), redundant))
    assert(z.length < Lz4Filter(redundant).length)
    val noise = Array.fill[Byte](4096)(rnd.nextInt().toByte)
    val raw = ZstdFilter(noise)
    assert(raw(0) == 0 && java.util.Arrays.equals(
      ZstdFilter.reverse(raw, 0, raw.length), noise))
    val framed = FilterChain.encode(Seq("lz4", "zstd"), redundant)
    assert(framed(2) == 1 && framed(3) == 4)
    assert(java.util.Arrays.equals(FilterChain.decode(framed), redundant))
  }

  test("chain round trip property") {
    val all = Seq("lz4", "lz4hc", "deflate", "zstd")
    for (_ <- 1 to 30) {
      val names = rnd.shuffle(all).take(rnd.nextInt(4))
      val data = randomBytes()
      val framed = FilterChain.encode(names, data)
      assert(java.util.Arrays.equals(FilterChain.decode(framed), data))
    }
  }
}
