package graft.store

import graft.meta.DatasetMeta

/** Storage protocols — the Scala analog of the reference's four protocols
  * (reference: src/io/mandoline/impl/protocol.clj:3-123).
  */

/** Per-variable, per-version coordinate→hash index with CAS writes
  * (reference: impl/protocol.clj:3-21). */
trait Index {
  def varName: String
  /** The version token this index writes/reads under. */
  def meta: DatasetMeta
  def versionId: Long = meta.versionId.get

  /** Hash at `coord` for this version, falling back to the greatest
    * *committed* version < this one — uncommitted intermediates are
    * skipped (reference: src/io/mandoline/backend/mem.clj:32-49). */
  def chunkAt(coord: Vector[Long]): Option[String]

  /** Hash at `coord` for exactly this version, committed or not
    * (reference: mem.clj:50-52 2-arity chunk-at). */
  def chunkAtExact(coord: Vector[Long]): Option[String]

  /** Compare-and-set: succeed only when the current entry for this version
    * equals `oldHash` (None = absent) (reference: mem.clj:54-66). */
  def writeIndex(coord: Vector[Long], oldHash: Option[String], newHash: String): Boolean

  def flush(): Unit = ()
}

/** Content-addressed blob store hash → (bytes, refcount)
  * (reference: impl/protocol.clj:23-42). */
trait ChunkStore {
  def readChunk(hash: String): Array[Byte]
  def chunkRefs(hash: String): Long
  def writeChunk(hash: String, refCount: Long, bytes: Array[Byte]): Unit
  def updateChunkRefs(hash: String, delta: Long): Unit

  protected def validateWrite(hash: String, bytes: Array[Byte]): Unit = {
    if (hash == null || hash.isEmpty)
      throw new IllegalArgumentException("hash must be a non-empty string")
    if (bytes == null || bytes.length == 0)
      throw new IllegalArgumentException("Chunk has no remaining bytes")
  }
}

final case class VersionRecord(timestamp: Long, versionId: Long, meta: Option[DatasetMeta])

/** Per-dataset connection (reference: impl/protocol.clj:44-103). */
trait Connection {
  def dataset: String
  def index(varName: String, meta: DatasetMeta): Index
  def chunkStore(): ChunkStore
  /** Commit a version: only committed versions appear in `versions`
    * (reference: finish-version, src/io/mandoline.clj:292-310). */
  def writeVersion(meta: DatasetMeta): Unit
  def metadata(versionId: Long): DatasetMeta
  /** Reverse-chronological (reference: impl/protocol.clj:95-103). */
  def versions(withMetadata: Boolean = false): Seq[VersionRecord]
  def getStats: Map[String, Long] = Map.empty
}

/** Store root: create/destroy/list/connect datasets
  * (reference: impl/protocol.clj:105-123). */
trait Backend {
  def createDataset(name: String): Unit
  def destroyDataset(name: String): Unit
  def listDatasets: Seq[String]
  def connect(name: String): Connection
}

/** Decorates a ChunkStore with the filter chain: encode on write (default
  * chain ["lz4"]), auto-detect on read
  * (reference: src/io/mandoline/impl/compressed_store.clj:7-30). */
final class CompressedChunkStore(inner: ChunkStore,
    writeChain: Seq[String] = graft.filters.FilterChain.DefaultWriteChain)
    extends ChunkStore {
  import graft.filters.FilterChain
  def readChunk(hash: String): Array[Byte] = FilterChain.decode(inner.readChunk(hash))
  def chunkRefs(hash: String): Long = inner.chunkRefs(hash)
  def writeChunk(hash: String, refCount: Long, bytes: Array[Byte]): Unit = {
    validateWrite(hash, bytes)
    inner.writeChunk(hash, refCount, FilterChain.encode(writeChain, bytes))
  }
  def updateChunkRefs(hash: String, delta: Long): Unit = inner.updateChunkRefs(hash, delta)
}

/** Read-through LRU cache of (decompressed-layer) chunk bytes, populated on
  * read miss only (reference: src/io/mandoline/impl/cache.clj:77-113).
  * The write-side index cache is intentionally NOT replicated — the
  * reference disables it as unsafe for concurrent ingests
  * (reference: src/io/mandoline/impl.clj:143-156). */
final class CachingChunkStore(inner: ChunkStore, maxEntries: Int = 1000)
    extends ChunkStore {
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Array[Byte]](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Array[Byte]]): Boolean =
        size() > maxEntries
    })
  def readChunk(hash: String): Array[Byte] = {
    val hit = cache.get(hash)
    if (hit != null) hit
    else {
      val v = inner.readChunk(hash)
      cache.put(hash, v)
      v
    }
  }
  def chunkRefs(hash: String): Long = inner.chunkRefs(hash)
  def writeChunk(hash: String, refCount: Long, bytes: Array[Byte]): Unit =
    inner.writeChunk(hash, refCount, bytes)
  def updateChunkRefs(hash: String, delta: Long): Unit = inner.updateChunkRefs(hash, delta)
}
