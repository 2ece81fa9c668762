package graft.spark.source

import graft.core.{DType, Slab, Slice}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.io.{BufferedOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** SQL row-level DML (`UPDATE`, `MERGE INTO`, predicate `DELETE`) for the
  * versioned dense-array store, via DataSourceV2's delta-based
  * `SupportsRowLevelOperations` path.
  *
  * The delta protocol maps exactly onto the store's overlay write algebra
  * (SURVEY §2.3; reference write semantics io/mandoline.clj:188-210):
  *
  *  - row identity IS the dimension coordinate (`rowId = dims`) — a dense
  *    array has one row per in-extent coordinate, so Spark's matched/not-
  *    matched machinery needs no synthetic metadata columns;
  *  - an UPDATE delta is a cell write at the (possibly moved) coordinate;
  *    when an assignment moves a dimension value, the vacated coordinate
  *    gets a fill write (delete) and the destination the new value;
  *  - a DELETE delta is a fill write — same "deleted reads as fill" rule
  *    the rectangular metadata-only `DELETE` fast path commits, so the two
  *    paths are observationally identical where both apply;
  *  - INSERT deltas (MERGE NOT MATCHED) only fire for coordinates the
  *    target scan did not produce. The scan materializes fill cells for
  *    every in-extent coordinate of the requested slice, so in-extent
  *    source rows always MATCH (their current value may be fill);
  *    out-of-extent inserts fail with the coordinate named, like any
  *    other out-of-bounds write.
  *
  * Rectangular `DELETE` keeps the scan-free metadata path: Spark's
  * `OptimizeMetadataOnlyDeleteFromTable` converts the row-level plan back
  * to `SupportsDelete.deleteWhere` whenever `canDeleteWhere` accepts the
  * predicate, so only genuinely value-dependent predicates pay for a scan.
  *
  * Scale path (100 TB discipline): per-task [[GraftDeltaWriter]]s sort and
  * coalesce their cells into contiguous run-slabs and stage them as
  * length-prefixed binary files on the store's filesystem (rotated at
  * 128 MiB); nothing data-sized crosses the driver. Commit parses the
  * staged runs distributedly (`binaryFile` source) and routes them through
  * the ordinary one-shuffle `SparkVersionWriter.writeRows` merge, then the
  * MVCC commit — so DML inherits ingest's chunk ownership, content dedup,
  * zone-map stats, and crash atomicity (an uncommitted version is invisible;
  * abort deletes the staging dir).
  */
private[source] class GraftRowLevelOperationBuilder(
    options: Map[String, String], info: RowLevelOperationInfo)
    extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftRowLevelOperation(options, info.command)
}

private[source] class GraftRowLevelOperation(
    options: Map[String, String], cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  private lazy val resolved = GraftSource.resolve(options)

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(resolved, o.asScala.toMap)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new GraftDeltaWriteBuilder(resolved, info)

  override def rowId(): Array[NamedReference] =
    resolved.dims.map(d => Expressions.column(d)).toArray

  // update() receives (id, newRow) directly: a value-only update is ONE
  // cell write; a dimension-moving update becomes fill-at-old +
  // value-at-new inside the writer. Representing updates as
  // delete+insert instead would put a fill write and a value write at
  // the SAME coordinate with equal seq, leaving the outcome to the
  // byte-order tie-break.
  override def representUpdateAsDeleteAndInsert(): Boolean = false

  override def description(): String =
    s"graft delta $cmd ${resolved.dataset}/${resolved.variable}"
}

private[source] class GraftDeltaWriteBuilder(r: Resolved, info: LogicalWriteInfo)
    extends DeltaWriteBuilder {
  override def build(): DeltaWrite = new GraftDeltaWrite(r, info)
}

private[source] class GraftDeltaWrite(r: Resolved, info: LogicalWriteInfo)
    extends DeltaWrite {
  override def toBatch(): DeltaBatchWrite = new GraftDeltaBatchWrite(r, info)
  override def description(): String =
    s"graft delta write ${r.dataset}/${r.variable}"
}

private[source] final case class GraftDeltaCommitMessage(
    files: Seq[String], records: Long) extends WriterCommitMessage

private[source] class GraftDeltaBatchWrite(r: Resolved, info: LogicalWriteInfo)
    extends DeltaBatchWrite {

  private val stagingDir: String = graft.spark.StoreFs.child(
    graft.spark.StoreFs.child(
      graft.spark.StoreFs.child(r.store.root, r.dataset), "_delta_staging"),
    info.queryId)

  override def createBatchWriterFactory(p: PhysicalWriteInfo): DeltaWriterFactory = {
    graft.spark.StoreFs.mkdirs(stagingDir)
    val dims = r.dims
    val rowSchema = info.schema()
    val idSchema = info.rowIdSchema().orElse(null)
    require(idSchema != null, "graft delta write: missing rowId schema")
    val varSlice = r.meta.varSlice(r.variable)
    // a DELETE-only write has an EMPTY row schema (deltas carry just the
    // rowId); the row-side ordinals are never consulted then
    def rowOrd(name: String): Int =
      if (rowSchema.fieldNames.contains(name)) rowSchema.fieldIndex(name) else -1
    GraftDeltaWriterFactory(
      stagingDir,
      rowDimOrds = dims.map(rowOrd).toArray,
      rowValueOrd = rowOrd("value"),
      idDimOrds = dims.map(d => idSchema.fieldIndex(d)).toArray,
      dtName = r.meta.dtype(r.variable).name,
      fill = r.meta.fill(r.variable),
      lo = varSlice.start.toArray, hi = varSlice.stop.toArray,
      hconf = graft.spark.StoreFs.broadcastConf())
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case m: GraftDeltaCommitMessage => m }
    val files = msgs.flatMap(_.files)
    val total = msgs.map(_.records).sum
    try {
      if (total == 0L) return // nothing matched: commit no version
      val spark = r.store.spark
      import spark.implicits._
      val slabRows = spark.read.format("binaryFile").load(files: _*)
        .select("content").as[Array[Byte]]
        .flatMap(GraftDeltaFormat.parse)
        .toDF("start", "stop", "bytes", "seq")
      val vs = r.store.versions(r.dataset)
      require(vs.nonEmpty, s"dataset ${r.dataset} has no committed versions")
      val w = r.store.addVersion(r.dataset, r.store.metadata(r.dataset, vs.head._2))
      w.writeRows(r.variable, slabRows)
      w.finishVersion()
      ()
    } finally cleanup()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit = graft.spark.StoreFs.deleteTree(stagingDir)
}

/** Staged-fragment binary format: per run-slab,
  * `[rank:int][start:rank longs][stop:rank longs][len:int][bytes]`,
  * all big-endian. One file holds any number of runs back to back. */
private[source] object GraftDeltaFormat {
  def parse(content: Array[Byte]): Iterator[(Array[Long], Array[Long], Array[Byte], Long)] = {
    val bb = ByteBuffer.wrap(content)
    new Iterator[(Array[Long], Array[Long], Array[Byte], Long)] {
      def hasNext: Boolean = bb.remaining() > 0
      def next(): (Array[Long], Array[Long], Array[Byte], Long) = {
        val rank = bb.getInt
        val start = Array.fill(rank)(bb.getLong)
        val stop = Array.fill(rank)(bb.getLong)
        val bytes = new Array[Byte](bb.getInt)
        bb.get(bytes)
        (start, stop, bytes, 0L)
      }
    }
  }
}

private[source] final case class GraftDeltaWriterFactory(
    stagingDir: String, rowDimOrds: Array[Int], rowValueOrd: Int,
    idDimOrds: Array[Int], dtName: String, fill: Double,
    lo: Array[Long], hi: Array[Long],
    // the DRIVER session's Hadoop conf (broadcast: the factory
    // deserializes per task), shipped so executor-side staged writes
    // resolve the store's FileSystem with spark.hadoop.* settings (s3a
    // credentials/endpoint) instead of executor classpath defaults
    hconf: org.apache.spark.broadcast.Broadcast[graft.spark.SerializableHadoopConf])
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] = {
    graft.spark.StoreFs.installExecutorConf(hconf.value)
    new GraftDeltaWriter(this, partitionId, taskId)
  }
}

/** Per-task delta writer: buffers (coordinate, cell-bytes) pairs, and at
  * each flush sorts them, coalesces contiguous last-axis runs (same
  * policy as `GraftCellIngest`), and appends the runs to a staged binary
  * file. Memory is bounded by the flush threshold; file size by rotation. */
private[source] class GraftDeltaWriter(f: GraftDeltaWriterFactory,
    partitionId: Int, taskId: Long) extends DeltaWriter[InternalRow] {

  private val rank = f.rowDimOrds.length
  private val dt = DType(f.dtName)
  private val es = dt.size
  private val fillBytes: Array[Byte] =
    if (rank == 0) Slab.empty(dt, Slice(Vector.empty, Vector.empty), f.fill).bytes
    else Slab.empty(dt,
      Slice(Vector.fill(rank)(0L), 1L +: Vector.fill(rank - 1)(1L)), f.fill).bytes

  private val FlushCells = 1 << 18
  private val RotateBytes = 128L << 20

  private val buf = new ArrayBuffer[(Array[Long], Array[Byte])](1024)
  private val files = new ArrayBuffer[String]
  private var out: DataOutputStream = null
  private var outBytes = 0L
  private var records = 0L

  private def cellValueBytes(row: InternalRow): Array[Byte] = {
    val o = f.rowValueOrd
    if (row.isNullAt(o))
      throw new IllegalArgumentException(
        "graft DML: null in column 'value' — dense arrays cannot hold null cells")
    val bb = ByteBuffer.allocate(es)
    dt match {
      case DType.BYTE => bb.put(row.getByte(o))
      case DType.SHORT => bb.putShort(row.getShort(o))
      case DType.CHAR => bb.putShort(row.getInt(o).toShort)
      case DType.INT => bb.putInt(row.getInt(o))
      case DType.LONG => bb.putLong(row.getLong(o))
      case DType.FLOAT => bb.putFloat(row.getFloat(o))
      case DType.DOUBLE => bb.putDouble(row.getDouble(o))
    }
    bb.array()
  }

  private def coordsOf(row: InternalRow, ords: Array[Int]): Array[Long] = {
    val c = new Array[Long](rank)
    var i = 0
    while (i < rank) {
      if (row.isNullAt(ords(i)))
        throw new IllegalArgumentException(
          "graft DML: null dimension coordinate — dense arrays cannot hold null coordinates")
      c(i) = row.getLong(ords(i))
      if (c(i) < f.lo(i) || c(i) >= f.hi(i))
        throw new IndexOutOfBoundsException(
          s"graft DML: cell ${c.toSeq} outside the variable extent " +
            s"[${f.lo.toSeq} … ${f.hi.toSeq})")
      i += 1
    }
    c
  }

  private def add(coord: Array[Long], bytes: Array[Byte]): Unit = {
    buf += ((coord, bytes))
    if (buf.length >= FlushCells) flush()
  }

  override def insert(row: InternalRow): Unit =
    add(coordsOf(row, f.rowDimOrds), cellValueBytes(row))

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    val oldC = coordsOf(id, f.idDimOrds)
    val newC = coordsOf(row, f.rowDimOrds)
    if (!java.util.Arrays.equals(oldC, newC)) add(oldC, fillBytes.clone())
    add(newC, cellValueBytes(row))
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    add(coordsOf(id, f.idDimOrds), fillBytes.clone())

  private def ensureOut(): Unit = {
    if (out != null && outBytes >= RotateBytes) { out.close(); out = null }
    if (out == null) {
      val p = graft.spark.StoreFs.child(f.stagingDir,
        s"part-$partitionId-$taskId-${files.length}.bin")
      out = new DataOutputStream(new BufferedOutputStream(
        graft.spark.StoreFs.createStream(p), 1 << 16))
      files += p
      outBytes = 0L
    }
  }

  private def writeRun(start: Array[Long], len: Int,
      bytes: java.io.ByteArrayOutputStream): Unit = {
    ensureOut()
    out.writeInt(rank)
    var i = 0
    while (i < rank) { out.writeLong(start(i)); i += 1 }
    i = 0
    while (i < rank) {
      out.writeLong(if (i == rank - 1) start(i) + len else start(i) + 1)
      i += 1
    }
    val b = bytes.toByteArray
    out.writeInt(b.length)
    out.write(b)
    outBytes += 4L + 16L * rank + 4L + b.length
    records += 1
  }

  private def flush(): Unit = {
    if (buf.isEmpty) return
    val sorted = buf.sortWith { (a, b) =>
      val c = java.util.Arrays.compare(a._1, b._1)
      c < 0
    }
    if (rank == 0) {
      // scalar variable: last write in task order wins locally; emit one run
      ensureOut()
      out.writeInt(0); out.writeInt(es); out.write(sorted.last._2)
      outBytes += 8L + es; records += 1
    } else {
      var runStart: Array[Long] = null
      var runLen = 0
      var runBytes: java.io.ByteArrayOutputStream = null
      def continues(c: Array[Long]): Boolean = {
        if (runStart == null || runLen >= GraftCellIngest.MaxRunCells) return false
        var i = 0
        while (i < rank - 1) { if (c(i) != runStart(i)) return false; i += 1 }
        c(rank - 1) == runStart(rank - 1) + runLen
      }
      sorted.foreach { case (c, vb) =>
        if (continues(c)) { runBytes.write(vb); runLen += 1 }
        else {
          if (runStart != null) writeRun(runStart, runLen, runBytes)
          runStart = c
          runBytes = new java.io.ByteArrayOutputStream(64)
          runBytes.write(vb)
          runLen = 1
        }
      }
      if (runStart != null) writeRun(runStart, runLen, runBytes)
    }
    buf.clear()
  }

  override def commit(): WriterCommitMessage = {
    flush()
    if (out != null) { out.close(); out = null }
    GraftDeltaCommitMessage(files.toSeq, records)
  }

  override def abort(): Unit = {
    if (out != null) { out.close(); out = null }
    files.foreach(graft.spark.StoreFs.deleteIfExists)
  }

  override def close(): Unit = if (out != null) { out.close(); out = null }
}
