package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns next to a typed metadata struct; decode / feature-extract /
  * frame-sample run as typed mapPartitions stages (one decoder
  * instantiation per partition — the batch shape a real codec needs).
  *
  * The decode step is REAL for the codec-free formats — PPM (P6) and BMP
  * headers parse with pure JVM code, including body-length validation —
  * and falls back to a deterministic STUB for codec-bound formats
  * (JPEG/PNG/WAV/MP4: this container ships no codecs, so those stay
  * honestly fake). The Spark-side contract — schema, binary transport,
  * partition-wise batching, typed output — is the same either way.
  */
object Multimodal {

  /** Typed media row: payload + extracted metadata. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, n_frames: Long)

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): (Long, Long, Long) // (width, height, nFrames)
  }

  /** Deterministic fake for codec-bound formats: derives dimensions from
    * the payload length so oracles can check the plumbing end to end. */
  object StubDecoder extends MediaDecoder {
    def decode(p: Array[Byte]): (Long, Long, Long) = {
      val n = p.length.toLong
      (n % 640L, (n * 7L) % 480L, n % 10L + 1L)
    }
  }

  /** Real header decoder for the codec-free formats, dispatched on magic
    * bytes: PPM "P6" (ASCII header incl. '#' comments, raster-length
    * validated) and BMP "BM" (little-endian dims at offsets 18/22).
    * Anything else falls back to the stub. Malformed media of a
    * RECOGNIZED format fails loudly — a pipeline should quarantine it,
    * not ingest garbage dimensions. */
  object HeaderDecoder extends MediaDecoder {
    def decode(p: Array[Byte]): (Long, Long, Long) =
      // recognition is by the 2-byte magic alone, so a TRUNCATED file of
      // a recognized format fails loudly inside its parser instead of
      // silently falling through to the stub's fake dimensions
      if (p.length >= 2 && p(0) == 'P'.toByte && p(1) == '6'.toByte) decodePpm(p)
      else if (p.length >= 2 && p(0) == 'B'.toByte && p(1) == 'M'.toByte) decodeBmp(p)
      else StubDecoder.decode(p)

    /** P6: "P6" <ws> width <ws> height <ws> maxval <one ws> raster. */
    private def decodePpm(p: Array[Byte]): (Long, Long, Long) = {
      var i = 2
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"malformed PPM: $msg")
      def skipWs(): Unit = {
        var go = true
        while (go && i < p.length) {
          if (p(i) == '#'.toByte) { // header comment runs to end of line
            while (i < p.length && p(i) != '\n'.toByte) i += 1
          } else if (p(i).toChar.isWhitespace) i += 1
          else go = false
        }
      }
      def int(): Long = {
        skipWs()
        val s = i
        while (i < p.length && p(i) >= '0'.toByte && p(i) <= '9'.toByte) i += 1
        if (i == s) fail(s"expected integer at offset $s")
        new String(p, s, i - s, java.nio.charset.StandardCharsets.US_ASCII).toLong
      }
      val w = int(); val h = int(); val maxval = int()
      if (w <= 0 || h <= 0) fail(s"dimensions ${w}x$h")
      if (maxval <= 0 || maxval > 65535) fail(s"maxval $maxval")
      // exactly ONE whitespace byte separates maxval from the raster —
      // anything else means the raster offset is wrong, so fail
      if (i >= p.length || !p(i).toChar.isWhitespace)
        fail(s"expected a whitespace raster separator at offset $i")
      i += 1
      val bytesPerPixel = if (maxval > 255) 6L else 3L
      if (p.length - i != w * h * bytesPerPixel)
        fail(s"raster is ${p.length - i} bytes, want ${w * h * bytesPerPixel} for ${w}x$h")
      (w, h, 1L)
    }

    /** BMP: dims live in the DIB header after the 14-byte file header,
      * and WHERE depends on the DIB type (its leading int32 size):
      * BITMAPCOREHEADER (12) stores uint16 dims at 18/20; the
      * BITMAPINFOHEADER family (40/52/56/64/108/124) stores int32 dims at
      * 18/22 (top-down images use a negative height). Reading 18/22
      * unconditionally would return garbage for core-header files.
      * The payload must at least reach the declared pixel-data offset —
      * raster LENGTH is not checked (row padding and RLE compression make
      * it header-dependent), unlike PPM's exact check. */
    private def decodeBmp(p: Array[Byte]): (Long, Long, Long) = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"malformed BMP: $msg")
      if (p.length < 26) fail(s"truncated header (${p.length} bytes)")
      val bb = java.nio.ByteBuffer.wrap(p)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val dibSize = bb.getInt(14)
      val (w, h) = dibSize match {
        case 12 =>
          ((bb.getShort(18) & 0xffff).toLong, (bb.getShort(20) & 0xffff).toLong)
        case 40 | 52 | 56 | 64 | 108 | 124 =>
          if (p.length < 14 + dibSize) fail(s"truncated DIB ($dibSize declared)")
          (bb.getInt(18).toLong, math.abs(bb.getInt(22).toLong))
        case other => fail(s"unsupported DIB header size $other")
      }
      if (w <= 0 || h == 0) fail(s"dimensions ${w}x$h")
      val dataOffset = bb.getInt(10).toLong
      if (dataOffset > 0 && p.length < dataOffset)
        fail(s"payload (${p.length} bytes) ends before the declared " +
          s"pixel-data offset $dataOffset")
      (w, h, 1L)
    }
  }

  /** Binary-transport + partition-batched metadata extraction over a
    * (doc_id, payload: binary) frame. */
  def extractMetaBinary(media: DataFrame,
      decoder: MediaDecoder = HeaderDecoder): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder state initialized once per partition (real codecs are
        // expensive to construct; this is the batch shape that matters)
        val d = decoder
        it.map { case (id, payload) =>
          val (w, h, f) = d.decode(payload)
          MediaMeta(id, payload.length.toLong, w, h, f)
        }
      }
  }

  /** Convenience: treat a document's text bytes as the payload. */
  def extractMeta(docs: DataFrame,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaMeta] =
    extractMetaBinary(docs.select(col("doc_id"),
      col("text").cast("binary").as("payload")), decoder)

  /** Deterministic frame sampling: every `stride`-th frame index. */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Long): DataFrame =
    meta.toDF()
      .select(col("doc_id"), explode(sequence(lit(0L), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Aspect-fit resize plan to a `box`×`box` target: output dimensions per
    * media row, integer-exact (`div`, never float scale factors — the same
    * arithmetic is replicated in the DuckDB oracle). A real pipeline hands
    * these to the decoder's scaler; the plan itself is pure codegen
    * columns. */
  def resizePlan(meta: Dataset[MediaMeta], box: Long = 224L): DataFrame =
    meta.toDF()
      .withColumn("out_w", expr(s"(width * ${box}L) div greatest(greatest(width, height), 1L)"))
      .withColumn("out_h", expr(s"(height * ${box}L) div greatest(greatest(width, height), 1L)"))
      // every stride-3 sampled frame count, without materializing the frames
      .withColumn("n_sampled", expr("(n_frames + 2L) div 3L"))
}
