package graft.api

import graft.core.{Slab, Slice}
import graft.engine.Engine
import graft.meta.DatasetMeta
import graft.store._

/** Porcelain API — the analog of the reference's public surface
  * (reference: src/io/mandoline.clj:73-321): create/destroy/list datasets,
  * version time travel, variable readers/writers, writer tokens for
  * multi-process ingest.
  */
final class GraftStore(val backend: Backend,
    chunkCacheSize: Int = 1000, writeChain: Seq[String] = Seq("lz4")) {

  private def wrapRead(cs: ChunkStore): ChunkStore =
    new CachingChunkStore(new CompressedChunkStore(cs, writeChain), chunkCacheSize)
  private def wrapWrite(cs: ChunkStore): ChunkStore =
    new CompressedChunkStore(cs, writeChain)

  /** V1 create (reference: src/io/mandoline.clj:274-278). */
  def create(name: String): Unit = backend.createDataset(name)
  /** V8 destroy (reference: impl/protocol.clj:113-115). */
  def destroy(name: String): Unit = backend.destroyDataset(name)
  /** V7 list (reference: src/io/mandoline.clj:73-74). */
  def listDatasets: Seq[String] = backend.listDatasets
  def datasetExists(name: String): Boolean = listDatasets.contains(name)

  /** V4 versions, reverse-chronological (reference: io/mandoline.clj:76-79). */
  def versions(name: String): Seq[VersionRecord] = backend.connect(name).versions(false)

  /** V6 metadata at a version (default latest)
    * (reference: io/mandoline.clj:85-91). */
  def metadata(name: String): DatasetMeta = reader(name).onLastVersion().meta
  def metadata(name: String, versionId: Long): DatasetMeta =
    backend.connect(name).metadata(versionId)

  def reader(name: String): DatasetReader = new DatasetReader(this, backend.connect(name))
  def writer(name: String): DatasetWriter = new DatasetWriter(this, backend.connect(name))

  private[api] def mkReadStore(conn: Connection): ChunkStore = wrapRead(conn.chunkStore())
  private[api] def mkWriteStore(conn: Connection): ChunkStore = wrapWrite(conn.chunkStore())
}

/** Version-pinnable reader (V5 time travel,
  * reference: src/io/mandoline.clj:117-141). */
final class DatasetReader(store: GraftStore, conn: Connection) {
  def versions: Seq[VersionRecord] = conn.versions(false)

  def onVersion(versionId: Long): PinnedReader =
    new PinnedReader(store, conn, conn.metadata(versionId))

  /** Negative n counts from the end; 0 = latest
    * (reference: src/io/mandoline/impl.clj:53-67). */
  def onNthVersion(n: Int): PinnedReader = {
    val vs = versions
    val idx = if (n < 0) vs.size + n else n
    require(idx >= 0 && idx < vs.size, s"no version at index $n (have ${vs.size})")
    onVersion(vs(idx).versionId)
  }

  def onLastVersion(): PinnedReader = onNthVersion(0)

  /** Latest version with timestamp ≤ ts
    * (reference: src/io/mandoline/impl.clj:72-75,121-125). */
  def onTimestamp(tsMillis: Long): PinnedReader = {
    val vs = versions.filter(_.timestamp <= tsMillis)
    require(vs.nonEmpty, s"no version at or before $tsMillis")
    onVersion(vs.head.versionId)
  }
}

final class PinnedReader(store: GraftStore, conn: Connection, val meta: DatasetMeta) {
  def variableReader(varName: String): Engine.VariableReader =
    Engine.VariableReader(meta, varName,
      conn.index(varName, meta), store.mkReadStore(conn))

  /** R1 get-slice (reference: src/io/mandoline.clj:260-270). */
  def getSlice(varName: String, request: Slice, checkBounds: Boolean = true): Slab =
    Engine.getSlice(variableReader(varName), request, checkBounds)

  /** R2 stream (reference: src/io/mandoline.clj:223-258). */
  def stream(varName: String, request: Slice, checkBounds: Boolean = true): Iterator[Slab] =
    Engine.stream(variableReader(varName), request, checkBounds)
}

final class DatasetWriter(store: GraftStore, conn: Connection) {

  /** V2 add-version: parent must be the current latest; validates and
    * inherits/freezes metadata; stamps the new version id
    * (reference: src/io/mandoline.clj:143-158, dataset.clj:96-122). */
  def addVersion(meta: DatasetMeta): VersionWriter = {
    val vs = conn.versions(false)
    val parentMeta = vs.headOption.map(v => conn.metadata(v.versionId))
    DatasetMeta.validate(meta)
    val inherited = parentMeta match {
      case Some(p) => DatasetMeta.inherit(meta, p)
      case None => meta.copy(parent = None)
    }
    new VersionWriter(store, conn, DatasetMeta.newVersion(inherited), parentMeta)
  }
}

/** An in-flight (uncommitted) version. Its metadata JSON doubles as the
  * multi-process writer token (reference: src/io/mandoline.clj:160-176 —
  * token = the metadata itself). */
final class VersionWriter(store: GraftStore, conn: Connection,
    val meta: DatasetMeta, val parentMeta: Option[DatasetMeta]) {

  /** V9 writer token round-trip. */
  def token: String = meta.toJson

  def variableWriter(varName: String): VariableWriter =
    new VariableWriter(
      store.mkWriteStore(conn),
      conn.index(varName, meta),
      parentMeta.map(pm => conn.index(varName, pm)))

  /** W8 write + close in one call. */
  def write(varName: String, slabs: IterableOnce[Slab]): Unit = {
    val w = variableWriter(varName)
    try w.write(slabs) finally w.close()
  }

  /** V3 finish-version: re-check the parent is still latest, then commit;
    * linear history enforced (reference: src/io/mandoline.clj:292-310,
    * pinned by test/linear_versions.clj:61-67). */
  def finishVersion(): Long = {
    val latest = conn.versions(false).headOption.map(_.versionId)
    if (latest != meta.parent)
      throw new IllegalStateException(
        s"version ${meta.versionId.get} has parent ${meta.parent.getOrElse("none")}, " +
          s"but the latest version is ${latest.getOrElse("none")}")
    conn.writeVersion(meta)
    meta.versionId.get
  }
}

object VersionWriter {
  /** Reconstruct an in-flight writer from its token in another process
    * (reference: token->dataset-writer, src/io/mandoline.clj:160-176). */
  def fromToken(store: GraftStore, datasetName: String, token: String): VersionWriter = {
    val conn = store.backend.connect(datasetName)
    val meta = DatasetMeta.fromJson(token)
    val parentMeta = meta.parent.map(conn.metadata)
    new VersionWriter(store, conn, meta, parentMeta)
  }
}

/** W8 porcelain writer (reference: src/io/mandoline.clj:280-290),
  * Closeable like the reference's VariableWriter. */
final class VariableWriter(chunkStore: ChunkStore, index: Index,
    parentIndex: Option[Index]) extends AutoCloseable {
  def write(slabs: IterableOnce[Slab]): Unit =
    Engine.writeVariable(chunkStore, index, parentIndex, slabs)
  def close(): Unit = { index.flush(); parentIndex.foreach(_.flush()) }
}
