package graft.filters

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}
import net.jpountz.lz4.LZ4Factory

/** Per-chunk compression filters with the reference's exact byte framing.
  *
  * Filter body format (reference: src/io/mandoline/filters/lz4.clj:1-21):
  *   marker byte 0  → remaining bytes are raw data
  *   marker byte 1  → 4-byte little-endian decompressed length, then payload
  *
  * A filter stores raw when the compression ratio is below 1.2
  * (reference: lz4.clj:26,43-51).
  */
trait ChunkFilter {
  def code: Byte
  def name: String
  def apply(data: Array[Byte]): Array[Byte]
  def reverse(data: Array[Byte], off: Int, len: Int): Array[Byte]

  protected val MinRatio = 1.2

  protected def frame(raw: Array[Byte], compressed: Array[Byte], compLen: Int): Array[Byte] =
    if (raw.length.toDouble / compLen < MinRatio) {
      val out = new Array[Byte](1 + raw.length)
      out(0) = 0
      System.arraycopy(raw, 0, out, 1, raw.length)
      out
    } else {
      val out = ByteBuffer.allocate(5 + compLen).order(ByteOrder.LITTLE_ENDIAN)
      out.put(1.toByte).putInt(raw.length).put(compressed, 0, compLen)
      out.array
    }

  /** (isCompressed, decompressedLength, payloadOffset) for `reverse`. */
  protected def parseHeader(data: Array[Byte], off: Int): (Boolean, Int, Int) =
    if (data(off) == 0) (false, -1, off + 1)
    else {
      val len = ByteBuffer.wrap(data, off + 1, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      (true, len, off + 5)
    }
}

object Lz4Filter extends ChunkFilter {
  val code: Byte = 1
  val name = "lz4"
  private def factory = LZ4Factory.fastestInstance()
  def apply(data: Array[Byte]): Array[Byte] = {
    val c = factory.fastCompressor()
    val max = c.maxCompressedLength(data.length)
    val buf = new Array[Byte](max)
    val n = c.compress(data, 0, data.length, buf, 0, max)
    frame(data, buf, n)
  }
  def reverse(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val (compressed, decLen, payloadOff) = parseHeader(data, off)
    if (!compressed) java.util.Arrays.copyOfRange(data, payloadOff, off + len)
    else {
      val out = new Array[Byte](decLen)
      factory.fastDecompressor().decompress(data, payloadOff, out, 0, decLen)
      out
    }
  }
}

object Lz4HcFilter extends ChunkFilter {
  val code: Byte = 2
  val name = "lz4hc"
  private def factory = LZ4Factory.fastestInstance()
  def apply(data: Array[Byte]): Array[Byte] = {
    val c = factory.highCompressor()
    val max = c.maxCompressedLength(data.length)
    val buf = new Array[Byte](max)
    val n = c.compress(data, 0, data.length, buf, 0, max)
    frame(data, buf, n)
  }
  def reverse(data: Array[Byte], off: Int, len: Int): Array[Byte] =
    Lz4Filter.reverse(data, off, len) // same decode path (reference: chain.clj code 2 → lz4/filter-reverse)
}

/** DEFLATE with a proper streaming loop (the reference caps output at
  * 64 KiB — a known limitation at deflate.clj:37-39 — which we fix). */
class DeflateFilter(level: Int = 6) extends ChunkFilter {
  val code: Byte = 3
  val name = "deflate"
  def apply(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(level)
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      val comp = out.toByteArray
      frame(data, comp, comp.length)
    } finally d.end()
  }
  def reverse(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val (compressed, decLen, payloadOff) = parseHeader(data, off)
    if (!compressed) java.util.Arrays.copyOfRange(data, payloadOff, off + len)
    else {
      val inf = new Inflater()
      try {
        inf.setInput(data, payloadOff, off + len - payloadOff)
        val out = new Array[Byte](decLen)
        var done = 0
        while (done < decLen && !inf.finished()) done += inf.inflate(out, done, decLen - done)
        out
      } finally inf.end()
    }
  }
}
object DeflateFilter extends DeflateFilter(6)

/** Zstandard — an EXTENSION code beyond the reference's fixed 1-3 (its
  * filter registry is the sanctioned extension point, chain.clj:26-45):
  * better ratio than lz4 at comparable decode speed, the right default
  * for cold 100 TB archives where storage dominates CPU. Same body
  * framing (raw marker / little-endian length) as every other filter,
  * so chains mix freely and old readers reject the unknown code loudly
  * rather than misreading bytes. */
class ZstdFilter(level: Int = 3) extends ChunkFilter {
  val code: Byte = 4
  val name = "zstd"
  def apply(data: Array[Byte]): Array[Byte] = {
    val max = com.github.luben.zstd.Zstd.compressBound(data.length.toLong).toInt
    val buf = new Array[Byte](max)
    val n = com.github.luben.zstd.Zstd.compressByteArray(
      buf, 0, max, data, 0, data.length, level)
    frame(data, buf, n.toInt)
  }
  def reverse(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val (compressed, decLen, payloadOff) = parseHeader(data, off)
    if (!compressed) java.util.Arrays.copyOfRange(data, payloadOff, off + len)
    else {
      val out = new Array[Byte](decLen)
      val n = com.github.luben.zstd.Zstd.decompressByteArray(
        out, 0, decLen, data, payloadOff, off + len - payloadOff)
      require(n == decLen, s"zstd decoded $n bytes, expected $decLen")
      out
    }
  }
}
object ZstdFilter extends ZstdFilter(3)

/** Filter chain with the reference's chunk framing
  * (reference: src/io/mandoline/filters/chain.clj:1-31):
  *   [headerVersion=0][filterCount][code…][payload]
  * Codes are fixed for the lifetime of a database: lz4=1 lz4hc=2
  * deflate=3, plus extension code zstd=4.
  * Encode applies filters left-to-right; decode reverses right-to-left.
  */
object FilterChain {
  private val byName: Map[String, ChunkFilter] =
    Map("lz4" -> Lz4Filter, "lz4hc" -> Lz4HcFilter, "deflate" -> DeflateFilter,
      "zstd" -> ZstdFilter)
  private val byCode: Map[Byte, ChunkFilter] =
    Map[Byte, ChunkFilter](1.toByte -> Lz4Filter, 2.toByte -> Lz4HcFilter,
      3.toByte -> DeflateFilter, 4.toByte -> ZstdFilter)

  /** The write path's default chain (reference hard-codes ["lz4"] on write,
    * src/io/mandoline/impl/compressed_store.clj:7-30). */
  val DefaultWriteChain: Seq[String] = Seq("lz4")

  def forName(name: String): ChunkFilter =
    byName.getOrElse(name, throw new IllegalArgumentException(s"$name isn't a known filter"))

  def encode(filterNames: Seq[String], raw: Array[Byte]): Array[Byte] = {
    val filters = filterNames.map(forName)
    val payload = filters.foldLeft(raw)((acc, f) => f.apply(acc))
    val out = new Array[Byte](2 + filters.size + payload.length)
    out(0) = 0
    out(1) = filters.size.toByte
    filters.zipWithIndex.foreach { case (f, i) => out(2 + i) = f.code }
    System.arraycopy(payload, 0, out, 2 + filters.size, payload.length)
    out
  }

  /** Auto-detecting decode — reads the chain from the header. */
  def decode(framed: Array[Byte]): Array[Byte] = {
    require(framed(0) == 0, s"unknown chunk header version ${framed(0)}")
    val n = framed(1) & 0xff
    val filters = (0 until n).map(i => byCode.getOrElse(framed(2 + i),
      throw new IllegalArgumentException(s"unknown filter code ${framed(2 + i)}")))
    var off = 2 + n
    var data = framed
    // apply in reverse order; each reverse yields a fresh array starting at 0
    filters.reverse.foreach { f =>
      data = f.reverse(data, off, data.length - off)
      off = 0
    }
    if (off == 0) data else java.util.Arrays.copyOfRange(data, off, data.length)
  }
}
