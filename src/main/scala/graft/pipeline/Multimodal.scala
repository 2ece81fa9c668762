package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns next to a typed metadata struct; decode / feature-extract /
  * frame-sample run as typed mapPartitions stages (one decoder
  * instantiation per partition — the batch shape a real codec needs).
  *
  * The decode step is REAL for every format whose metadata the bare
  * JDK can reach: PPM (P6) and BMP headers parse with pure JVM code
  * (body-length validated), PNG/JPEG/GIF route through `javax.imageio`
  * (the readers ship in every JDK 17 — headless-safe, no external
  * codec), WAV dims come from a RIFF chunk walk, and MP4/ISO-BMFF
  * dims + frame counts come from a big-endian box walk
  * (moov/trak/tkhd + stts — header metadata needs no codec). Only
  * UNRECOGNIZED payloads fall back to a clearly-marked deterministic
  * stub. The Spark-side contract — schema, binary transport,
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

  /** Real decoder dispatched on magic bytes: PPM "P6" (ASCII header
    * incl. '#' comments, raster-length validated) and BMP "BM" parse
    * with pure JVM code; PNG/JPEG/GIF decode through `javax.imageio`
    * (JDK-bundled readers, headless-safe); WAV walks the RIFF chunks;
    * MP4/ISO-BMFF walks the box tree for tkhd dims + stts frame count.
    * Anything else (unknown blobs) falls back to the stub.
    * Malformed media of a RECOGNIZED format fails loudly — a pipeline
    * should quarantine it, not ingest garbage dimensions. */
  object HeaderDecoder extends MediaDecoder {
    def decode(p: Array[Byte]): (Long, Long, Long) =
      // recognition is by the magic bytes alone, so a TRUNCATED file of
      // a recognized format fails loudly inside its parser instead of
      // silently falling through to the stub's fake dimensions
      if (p.length >= 2 && p(0) == 'P'.toByte && p(1) == '6'.toByte) decodePpm(p)
      else if (p.length >= 2 && p(0) == 'B'.toByte && p(1) == 'M'.toByte) decodeBmp(p)
      else if (p.length >= 8 && p(0) == 0x89.toByte && p(1) == 'P'.toByte &&
        p(2) == 'N'.toByte && p(3) == 'G'.toByte) decodeImageIo(p, "PNG")
      else if (p.length >= 3 && p(0) == 0xff.toByte && p(1) == 0xd8.toByte &&
        p(2) == 0xff.toByte) decodeImageIo(p, "JPEG")
      else if (p.length >= 4 && p(0) == 'G'.toByte && p(1) == 'I'.toByte &&
        p(2) == 'F'.toByte && p(3) == '8'.toByte) decodeImageIo(p, "GIF")
      else if (p.length >= 12 && ascii(p, 0, 4) == "RIFF" &&
        ascii(p, 8, 4) == "WAVE") decodeWav(p)
      else if (p.length >= 12 && ascii(p, 4, 4) == "ftyp") decodeMp4(p)
      else StubDecoder.decode(p)

    /** MP4/ISO-BMFF: a pure big-endian box walk — no codec needed for
      * header metadata. Width/height come from the first trak whose
      * `tkhd` carries nonzero 16.16 fixed-point dimensions (the video
      * track; audio traks store 0×0), and n_frames is the sum of that
      * trak's `stts` (decoding-time-to-sample) entry counts at
      * moov/trak/mdia/minf/stbl/stts. Box sizes are validated against
      * the enclosing container BEFORE advancing, so a corrupt size can
      * neither overrun the payload nor stall the walk. */
    private def decodeMp4(p: Array[Byte]): (Long, Long, Long) = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"malformed MP4: $msg")
      def u32(off: Int): Long =
        ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
          ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)
      /** Direct children of container bytes [start, end): (type, bodyStart,
        * bodyEnd). Handles size==0 ("to end of container") and size==1
        * (64-bit largesize) per ISO/IEC 14496-12 §4.2. */
      def children(start: Int, end: Int): Vector[(String, Int, Int)] = {
        val out = Vector.newBuilder[(String, Int, Int)]
        var off = start
        while (off < end) {
          if (off + 8 > end) fail(s"truncated box header at $off")
          val typ = ascii(p, off + 4, 4)
          var hdr = 8L
          var sz = u32(off)
          if (sz == 0L) sz = (end - off).toLong // last box: extends to end
          else if (sz == 1L) {
            if (off + 16 > end) fail(s"truncated largesize box at $off")
            sz = (u32(off + 8) << 32) | u32(off + 12); hdr = 16L
          }
          if (sz < hdr || sz > end - off)
            fail(s"box '$typ' at $off: size $sz overruns its container")
          out += ((typ, off + hdr.toInt, off + sz.toInt))
          off += sz.toInt // sz ≥ 8: the walk always advances
        }
        out.result()
      }
      def child(kids: Vector[(String, Int, Int)], typ: String) =
        kids.find(_._1 == typ)
      val moov = child(children(0, p.length), "moov")
        .getOrElse(fail("no moov box"))
      val traks = children(moov._2, moov._3).filter(_._1 == "trak")
      if (traks.isEmpty) fail("moov contains no trak")
      val video = traks.iterator.flatMap { case (_, ts, te) =>
        val kids = children(ts, te)
        val (_, hs, he) = child(kids, "tkhd").getOrElse(fail("trak without tkhd"))
        if (he - hs < 4) fail("truncated tkhd")
        val dimOff = hs + (if ((p(hs) & 0xff) == 1) 88 else 76) // v1 vs v0 layout
        if (he - dimOff < 8) fail("truncated tkhd (no width/height)")
        val w = u32(dimOff) >> 16 // 16.16 fixed-point integer part
        val h = u32(dimOff + 4) >> 16
        if (w > 0 && h > 0) Some((kids, w, h)) else None
      }.nextOption().getOrElse(fail("no video trak (nonzero tkhd dims)"))
      val (kids, w, h) = video
      val stts = (for {
        mdia <- child(kids, "mdia")
        minf <- child(children(mdia._2, mdia._3), "minf")
        stbl <- child(children(minf._2, minf._3), "stbl")
        st <- child(children(stbl._2, stbl._3), "stts")
      } yield st).getOrElse(fail("video trak without stts"))
      val (_, ss, se) = stts
      if (se - ss < 8) fail("truncated stts")
      val n = u32(ss + 4)
      if (8L + n * 8L > se - ss) fail(s"stts entry count $n overruns the box")
      var frames = 0L
      var i = 0
      while (i < n) { frames += u32(ss + 8 + i * 8); i += 1 }
      (w, h, frames)
    }

    private def ascii(p: Array[Byte], off: Int, len: Int): String =
      new String(p, off, len, java.nio.charset.StandardCharsets.US_ASCII)

    /** PNG/JPEG/GIF through the JDK's bundled ImageIO readers. Decodes
      * the full image (not just the header) — which is what a real
      * feature-extract stage pays anyway — and fails loudly on corrupt
      * payloads: ImageIO either throws or, finding no capable reader,
      * returns null. The byte[] is wrapped in an explicit
      * MemoryCacheImageInputStream: ImageIO.read(InputStream) would
      * otherwise route through FileCacheImageInputStream (useCache
      * defaults to true), creating and deleting a TEMP FILE per payload
      * — pure executor-local I/O churn for data already in memory. */
    private def decodeImageIo(p: Array[Byte], fmt: String): (Long, Long, Long) = {
      def fail(msg: String, cause: Throwable): Nothing =
        throw new IllegalArgumentException(s"malformed $fmt: $msg", cause)
      val img =
        try javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(p)))
        catch { // readers throw unchecked on garbage dims, IIOException on
          // corrupt streams — either way: quarantine, don't ingest
          case scala.util.control.NonFatal(e) => fail(e.getMessage, e)
        }
      if (img == null) fail("no JDK reader could decode the payload", null)
      (img.getWidth.toLong, img.getHeight.toLong, 1L)
    }

    /** WAV: a RIFF chunk walk — no codec needed. "Dims" of an audio
      * clip: width = sample rate (Hz), height = channel count,
      * n_frames = sample frames (data bytes / block align). The fmt
      * chunk must appear and be PCM-shaped; chunks are word-aligned. */
    private def decodeWav(p: Array[Byte]): (Long, Long, Long) = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"malformed WAV: $msg")
      val bb = java.nio.ByteBuffer.wrap(p)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var off = 12
      var rate = -1L; var channels = -1L; var blockAlign = -1L; var dataLen = -1L
      while (off + 8 <= p.length) {
        val id = ascii(p, off, 4)
        val sz = bb.getInt(off + 4).toLong & 0xffffffffL
        if (id == "fmt ") {
          if (off + 8 + 16 > p.length) fail(s"truncated fmt chunk at $off")
          channels = (bb.getShort(off + 10) & 0xffff).toLong
          rate = bb.getInt(off + 12).toLong & 0xffffffffL
          blockAlign = (bb.getShort(off + 20) & 0xffff).toLong
        } else if (id == "data") dataLen = sz
        // validate BEFORE advancing: sz is an attacker-controlled u32; a
        // value like 0xFFFFFFF8 advanced via .toInt (= -8, padding 0)
        // would make off += 0 and hang the executor task forever
        if (sz > p.length.toLong - off - 8)
          fail(s"truncated or oversized chunk at $off (size $sz)")
        off += (8L + sz + (sz & 1L)).toInt // chunks are word-aligned
      }
      if (rate <= 0 || channels <= 0 || blockAlign <= 0)
        fail("no usable fmt chunk (rate/channels/block-align)")
      if (dataLen < 0) fail("no data chunk")
      (rate, channels, dataLen / blockAlign)
    }

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

  /** Deterministic synthetic PNG corpus (doc_id, payload) for driving
    * the REAL ImageIO decode end-to-end: per doc, a
    * (doc_id % 64 + 1) × (doc_id % 48 + 1) RGB image with
    * deterministic pixels, ENCODED to genuine PNG bytes by the JDK
    * writer in the same partition-batched shape the decoder runs in.
    * An oracle checks the encode→decode roundtrip by recomputing the
    * dimensions arithmetically — the payload itself (CRCs, zlib
    * streams) never crosses engines. */
  /** Deterministic minimal-box MP4s (ftyp + moov with an audio-shaped
    * zero-dim trak FOLLOWED by the video trak, so track selection is
    * exercised), built in partition batches like [[syntheticPngs]].
    * Dims/frames derive arithmetically from doc_id so an oracle can
    * recompute them without parsing. */
  def syntheticMp4s(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        (id, buildMp4((id % 128 + 16).toInt, (id * 3 % 96 + 16).toInt,
          (id % 24 + 1).toInt))
      }
    }.toDF("doc_id", "payload")
  }

  /** One minimal ISO-BMFF file: the exact box set decodeMp4 needs. */
  private[graft] def buildMp4(w: Int, h: Int, frames: Int): Array[Byte] = {
    def box(typ: String, body: Array[Byte]*): Array[Byte] = {
      val n = 8 + body.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(n) // big-endian by default
      bb.putInt(n).put(typ.getBytes("US-ASCII"))
      body.foreach(bb.put)
      bb.array()
    }
    def tkhd(width: Int, height: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(0)                 // version 0 + flags
      b.putInt(0).putInt(0)       // creation, modification
      b.putInt(1).putInt(0)       // track id, reserved
      b.putInt(0)                 // duration
      b.putLong(0L)               // reserved
      b.putShort(0).putShort(0).putShort(0).putShort(0) // layer/alt/vol/res
      b.putInt(0x00010000).putInt(0).putInt(0)          // unity matrix
      b.putInt(0).putInt(0x00010000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      b.putInt(width << 16).putInt(height << 16)        // 16.16 fixed-point
      box("tkhd", b.array())
    }
    // two stts entries when frames > 1 so entry summation is exercised
    val sttsBody = {
      val e = if (frames > 1) Seq((1, 500), (frames - 1, 500))
        else Seq((frames, 500))
      val b = java.nio.ByteBuffer.allocate(8 + e.size * 8)
      b.putInt(0).putInt(e.size)
      e.foreach { case (c, d) => b.putInt(c).putInt(d) }
      b.array()
    }
    val videoTrak = box("trak", tkhd(w, h),
      box("mdia", box("minf", box("stbl", box("stts", sttsBody)))))
    val audioTrak = box("trak", tkhd(0, 0)) // non-video: 0×0 dims, no stbl
    box("ftyp", "isom".getBytes("US-ASCII"), Array[Byte](0, 0, 0, 0)) ++
      box("moov", audioTrak, videoTrak)
  }

  def syntheticPngs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      // one PNG encoder per partition: ImageIO.write's convenience form
      // does a registry lookup AND a FileCacheImageOutputStream temp
      // file per image (useCache defaults to true) — for an in-memory
      // encode that is a file create/delete per row, executor-local
      // I/O that would also hammer local disk on a real cluster
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val encoded = it.map { id =>
        val w = (id % 64 + 1).toInt
        val h = (id % 48 + 1).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        // direct raster fill: setRGB pays a per-pixel ColorModel
        // round-trip; for TYPE_INT_RGB the backing int array stores the
        // same packed 0xRRGGBB words
        val px = img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferInt].getData
        var y = 0
        var i = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            px(i) = (x * 31 + y * 7 + id.toInt) & 0xffffff
            i += 1
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        try {
          writer.setOutput(ios)
          writer.write(img)
          ios.flush()
        } finally ios.close() // releases the memory-cache buffers per row
        (id, bos.toByteArray)
      }
      // dispose() the shared writer exactly once, on whichever comes
      // first: iterator exhaustion (the happy path) or TASK COMPLETION —
      // a consumer that stops early (limit/take) or a failed task never
      // drains the iterator, and the exhaustion hook alone would leak
      // the writer's native resources on those paths
      val disposed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def disposeOnce(): Unit =
        if (disposed.compareAndSet(false, true)) writer.dispose()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => disposeOnce()))
      new Iterator[(Long, Array[Byte])] {
        def hasNext: Boolean = {
          val h = encoded.hasNext
          if (!h) disposeOnce()
          h
        }
        def next(): (Long, Array[Byte]) = encoded.next()
      }
    }.toDF("doc_id", "payload")
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

  /** One minimal PCM16 mono WAV: RIFF → fmt (16-byte PCM) → a junk LIST
    * chunk (the walker must skip unknown chunks) → data (LE int16
    * samples). */
  private[graft] def buildWav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(12 + 24 + 12 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 24 + 12 + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                    // PCM, mono
      .putInt(rate).putInt(rate * 2)              // sample rate, byte rate
      .putShort(2).putShort(16)                   // block align, bits
    bb.put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("INFO".getBytes("US-ASCII"))           // chunk the walker skips
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Synthetic PCM16 WAV per document — rate and samples derived from
    * (doc_id, n_chars) so the DuckDB oracle can recompute the extracted
    * features closed-form while the Spark side genuinely parses bytes. */
  def syntheticWavs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)].mapPartitions { it =>
        it.map { case (id, nc) =>
          val rate = (8000L * (1L + id % 3L)).toInt
          val n = (nc % 300L + 50L).toInt
          val samples = Array.tabulate(n)(i =>
            ((nc * 131L + i * 17L) % 4096L - 2048L).toShort)
          (id, buildWav(rate, samples))
        }
      }.toDF("doc_id", "payload")
  }

  /** Typed audio row: header metadata + sample-level integer features. */
  final case class AudioMeta(doc_id: Long, sample_rate: Long,
      n_channels: Long, n_samples: Long, duration_ms: Long,
      energy: Long, peak: Long)

  /** Audio feature extraction over PCM16 WAV payloads: a real RIFF chunk
    * walk (unknown chunks skipped, sizes validated) locates fmt + data,
    * then the samples decode as little-endian int16 and reduce row-LOCALLY
    * to integer features — Σ|s| (energy) and max|s| (peak) — so the only
    * shuffle a downstream agg pays is over one feature row per clip, never
    * samples. duration_ms is integer-exact (n·1000 div rate). */
  def audioStats(media: DataFrame): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          def fail(msg: String): Nothing =
            throw new IllegalArgumentException(s"malformed WAV: $msg")
          if (p.length < 12 || !(p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
              p(3) == 'F')) fail("no RIFF header")
          val bb = java.nio.ByteBuffer.wrap(p)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var off = 12
          var rate = -1L; var channels = -1L; var bits = -1L
          var dataOff = -1; var dataLen = -1
          while (off + 8 <= p.length) {
            val idc = new String(p, off, 4, "US-ASCII")
            val sz = bb.getInt(off + 4).toLong & 0xffffffffL
            if (sz > p.length.toLong - off - 8)
              fail(s"truncated or oversized chunk at $off (size $sz)")
            if (idc == "fmt ") {
              if (sz < 16) fail(s"short fmt chunk ($sz)")
              channels = (bb.getShort(off + 10) & 0xffff).toLong
              rate = bb.getInt(off + 12).toLong & 0xffffffffL
              bits = (bb.getShort(off + 22) & 0xffff).toLong
            } else if (idc == "data") { dataOff = off + 8; dataLen = sz.toInt }
            off += (8L + sz + (sz & 1L)).toInt
          }
          if (rate <= 0 || channels != 1 || bits != 16)
            fail(s"unsupported format (rate=$rate ch=$channels bits=$bits)")
          if (dataOff < 0) fail("no data chunk")
          val n = dataLen / 2
          var i = 0; var energy = 0L; var peak = 0L
          while (i < n) {
            val s = math.abs(bb.getShort(dataOff + i * 2).toLong)
            energy += s; if (s > peak) peak = s
            i += 1
          }
          AudioMeta(id, rate, channels, n.toLong,
            n.toLong * 1000L / rate, energy, peak)
        }
      }
  }

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
