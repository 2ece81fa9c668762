package graft.store

import graft.meta.DatasetMeta
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** In-memory backend for development and testing — the analog of the
  * reference's atom-based backend (reference: src/io/mandoline/backend/mem.clj).
  * Chunks are shared across all datasets of a store root
  * (reference: mem.clj:15-17).
  */
object MemBackend {
  private val roots = TrieMap.empty[String, MemBackend]
  def forRoot(root: String): MemBackend = roots.getOrElseUpdate(root, new MemBackend)
  def destroyRoot(root: String): Unit = roots.remove(root)
  def reset(): Unit = roots.clear()
}

final class MemBackend extends Backend {
  private[graft] val chunks = TrieMap.empty[String, (Long, Array[Byte])]
  private[graft] val datasets = TrieMap.empty[String, MemDataset]

  def createDataset(name: String): Unit = {
    if (name == null || name.trim.isEmpty)
      throw new IllegalArgumentException("dataset name must be a non-empty string")
    if (datasets.putIfAbsent(name, new MemDataset).isDefined)
      throw new IllegalStateException(s"""dataset with name "$name" already exists.""")
  }
  def destroyDataset(name: String): Unit = { datasets.remove(name); () }
  def listDatasets: Seq[String] = datasets.keys.toSeq
  def connect(name: String): Connection = {
    val ds = datasets.getOrElse(name,
      throw new IllegalArgumentException(s"""dataset with name "$name" does not exist."""))
    new MemConnection(this, name, ds)
  }
}

final class MemDataset {
  // committed versions only (write-version happens at commit)
  val versions = TrieMap.empty[Long, (Long, String)] // vid -> (timestamp, metaJson)
  // (varName, coord) -> versionId -> hash, versions scanned descending
  val indices = TrieMap.empty[(String, Vector[Long]), java.util.concurrent.ConcurrentSkipListMap[java.lang.Long, String]]
}

final class MemConnection(backend: MemBackend, val dataset: String, ds: MemDataset)
    extends Connection {

  def index(varName: String, meta: DatasetMeta): Index =
    new MemIndex(ds, varName, meta, () => ds.versions.keySet.toSet)

  def chunkStore(): ChunkStore = new MemChunkStore(backend)

  def writeVersion(meta: DatasetMeta): Unit =
    // commit timestamps are STRICTLY monotonic per dataset (like version
    // ids, DatasetMeta.newVersion): two commits in one millisecond would
    // otherwise make onTimestamp resolution ambiguous between them
    ds.synchronized {
      val prev = ds.versions.values.iterator.map(_._1).foldLeft(0L)(math.max)
      ds.versions.put(meta.versionId.get,
        (math.max(System.currentTimeMillis(), prev + 1), meta.toJson))
    }

  def metadata(versionId: Long): DatasetMeta =
    DatasetMeta.fromJson(ds.versions(versionId)._2)

  def versions(withMetadata: Boolean): Seq[VersionRecord] =
    ds.versions.toSeq
      .sortBy { case (vid, (ts, _)) => (ts, vid) }
      .reverse
      .map { case (vid, (ts, json)) =>
        VersionRecord(ts, vid, if (withMetadata) Some(DatasetMeta.fromJson(json)) else None)
      }
}

final class MemIndex(ds: MemDataset, val varName: String, val meta: DatasetMeta,
    committed: () => Set[Long]) extends Index {

  private def cell(coord: Vector[Long]) =
    ds.indices.getOrElseUpdate((varName, coord),
      new java.util.concurrent.ConcurrentSkipListMap[java.lang.Long, String](
        java.util.Comparator.reverseOrder[java.lang.Long]))

  def chunkAtExact(coord: Vector[Long]): Option[String] =
    Option(ds.indices.get((varName, coord)).map(_.get(Long.box(versionId))).orNull)

  def chunkAt(coord: Vector[Long]): Option[String] =
    ds.indices.get((varName, coord)).flatMap { m =>
      Option(m.get(Long.box(versionId))).orElse {
        // fall back to the greatest committed version < target
        // (reference: mem.clj:32-49 find-index-lower-than)
        val c = committed()
        m.entrySet().asScala
          .find(e => e.getKey < versionId && c.contains(e.getKey))
          .map(_.getValue)
      }
    }

  def writeIndex(coord: Vector[Long], oldHash: Option[String], newHash: String): Boolean = {
    val m = cell(coord)
    oldHash match {
      case None => m.putIfAbsent(Long.box(versionId), newHash) == null
      case Some(old) => m.replace(Long.box(versionId), old, newHash)
    }
  }
}

final class MemChunkStore(backend: MemBackend) extends ChunkStore {
  def readChunk(hash: String): Array[Byte] =
    backend.chunks.getOrElse(hash,
      throw new IllegalArgumentException(s"No chunk was found for hash $hash"))._2
  def chunkRefs(hash: String): Long =
    backend.chunks.getOrElse(hash,
      throw new IllegalArgumentException(s"No chunk was found for hash $hash"))._1
  def writeChunk(hash: String, refCount: Long, bytes: Array[Byte]): Unit = {
    validateWrite(hash, bytes)
    backend.chunks.put(hash, (refCount, bytes))
  }
  def updateChunkRefs(hash: String, delta: Long): Unit = {
    val _ = backend.chunks.updateWith(hash) {
      case Some((r, b)) => Some((r + delta, b))
      case None => throw new IllegalArgumentException(s"No chunk was found for hash $hash")
    }
  }
}
