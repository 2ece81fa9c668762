package graft

import graft.store._
import graft.meta.{DatasetMeta, VariableDef}
import org.scalatest.funsuite.AnyFunSuite

/** Protocol conformance laws — the analog of the reference's generative
  * suites (src/io/mandoline/test/protocol/chunk_store.clj:69-392 and
  * protocol/schema.clj:43-343), parameterized by Backend so any new
  * backend can re-run them (the suites-are-the-conformance-spec pattern).
  */
abstract class BackendLaws(name: String, mkBackend: () => Backend) extends AnyFunSuite {

  private val rnd = new scala.util.Random(7)
  private def randHash(): String =
    (1 to (30 + rnd.nextInt(20))).map(_ => "0123456789abcdef"(rnd.nextInt(16))).mkString
  private def randBytes(): Array[Byte] = {
    val b = new Array[Byte](1 + rnd.nextInt(40000)); rnd.nextBytes(b); b
  }

  private def freshConn(): Connection = {
    val b = mkBackend()
    b.createDataset("laws")
    b.connect("laws")
  }

  test(s"$name: chunk write/read round trip, idempotent overwrite") {
    val cs = freshConn().chunkStore()
    for (_ <- 1 to 25) {
      val (h, bytes, ref) = (randHash(), randBytes(), rnd.nextInt(10000).toLong)
      cs.writeChunk(h, ref, bytes)
      assert(java.util.Arrays.equals(cs.readChunk(h), bytes))
      assert(cs.chunkRefs(h) == ref)
      cs.writeChunk(h, ref, bytes) // idempotent re-write
      assert(java.util.Arrays.equals(cs.readChunk(h), bytes))
    }
  }

  test(s"$name: invalid chunk writes rejected (empty hash / empty bytes)") {
    val cs = freshConn().chunkStore()
    intercept[IllegalArgumentException] { cs.writeChunk("", 0, Array[Byte](1)) }
    intercept[IllegalArgumentException] { cs.writeChunk(null, 0, Array[Byte](1)) }
    intercept[IllegalArgumentException] { cs.writeChunk(randHash(), 0, Array.empty[Byte]) }
    intercept[IllegalArgumentException] { cs.writeChunk(randHash(), 0, null) }
  }

  test(s"$name: missing chunk reads throw IllegalArgumentException") {
    val cs = freshConn().chunkStore()
    intercept[IllegalArgumentException] { cs.readChunk("deadbeef") }
    intercept[IllegalArgumentException] { cs.chunkRefs("deadbeef") }
    intercept[IllegalArgumentException] { cs.updateChunkRefs("deadbeef", 1) }
  }

  test(s"$name: refcount updates are additive") {
    val cs = freshConn().chunkStore()
    val h = randHash()
    cs.writeChunk(h, 0, randBytes())
    val deltas = Seq.fill(20)(rnd.nextInt(100).toLong - 50)
    deltas.foreach(cs.updateChunkRefs(h, _))
    assert(cs.chunkRefs(h) == deltas.sum)
  }

  test(s"$name: concurrent chunk writes are safe (multi-thread law)") {
    val cs = freshConn().chunkStore()
    val entries = Seq.fill(64)((randHash(), randBytes()))
    val threads = entries.grouped(8).map { group =>
      new Thread(() => group.foreach { case (h, b) => cs.writeChunk(h, 0, b) })
    }.toSeq
    threads.foreach(_.start()); threads.foreach(_.join())
    entries.foreach { case (h, b) => assert(java.util.Arrays.equals(cs.readChunk(h), b)) }
  }

  test(s"$name: schema laws — create/list/connect/destroy") {
    val b = mkBackend()
    assert(b.listDatasets.isEmpty)
    intercept[IllegalArgumentException] { b.connect("missing") }
    intercept[IllegalArgumentException] { b.createDataset("") }
    intercept[IllegalArgumentException] { b.createDataset("  ") }
    b.createDataset("a"); b.createDataset("b")
    assert(b.listDatasets.toSet == Set("a", "b"))
    intercept[IllegalStateException] { b.createDataset("a") } // exactly-once
    b.destroyDataset("a")
    assert(b.listDatasets.toSet == Set("b"))
    b.destroyDataset("a") // idempotent
    b.destroyDataset("nonexistent")
  }

  test(s"$name: index CAS law — stale oldHash loses") {
    val conn = freshConn()
    val meta = DatasetMeta.newVersion(DatasetMeta(
      dimensions = Map("x" -> 4L), chunkDimensions = Map("x" -> 2L),
      variables = Map("v" -> VariableDef("int", Vector("x"), 0.0))))
    val idx = conn.index("v", meta)
    val coord = Vector(0L)
    assert(idx.writeIndex(coord, None, "h1"))
    assert(!idx.writeIndex(coord, None, "h2"))           // absent-expectation fails
    assert(idx.writeIndex(coord, Some("h1"), "h2"))      // correct CAS succeeds
    assert(!idx.writeIndex(coord, Some("h1"), "h3"))     // stale CAS fails
    assert(idx.chunkAtExact(coord).contains("h2"))
  }
}

class MemBackendLaws extends BackendLaws("mem", () => new MemBackend)

/** Chunk-cache behavior pinned from the reference
  * (src/io/mandoline/impl/cache.clj:77-113, test/impl/cache_test.clj):
  * read-through, populated on read miss only, LRU-evicting. */
class ChunkCacheSpec extends AnyFunSuite {
  import graft.store.{CachingChunkStore, ChunkStore}

  private class CountingStore extends ChunkStore {
    val m = scala.collection.mutable.Map.empty[String, Array[Byte]]
    var reads = 0
    def readChunk(h: String): Array[Byte] = { reads += 1; m(h) }
    def chunkRefs(h: String): Long = 0
    def writeChunk(h: String, r: Long, b: Array[Byte]): Unit = { validateWrite(h, b); m(h) = b }
    def updateChunkRefs(h: String, d: Long): Unit = ()
  }

  test("read-through cache: second read served from cache; LRU evicts") {
    val inner = new CountingStore
    val cached = new CachingChunkStore(inner, maxEntries = 2)
    (1 to 3).foreach(i => cached.writeChunk(s"h$i", 0, Array(i.toByte)))
    cached.readChunk("h1"); cached.readChunk("h1")
    assert(inner.reads == 1) // second hit cached
    cached.readChunk("h2"); cached.readChunk("h3") // evicts h1 (cap 2)
    cached.readChunk("h1")
    assert(inner.reads == 4) // h1 was evicted → re-read
    // writes do NOT populate the cache (read-miss only, cache.clj:77-113)
    cached.writeChunk("h9", 0, Array(9.toByte))
    cached.readChunk("h9")
    assert(inner.reads == 5)
  }
}
