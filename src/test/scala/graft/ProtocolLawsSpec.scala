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
    // empty-hash taxonomy (chunk_store.clj:206-215, 236-244): reads and
    // ref queries on "" throw like any other absent hash
    intercept[IllegalArgumentException] { cs.readChunk("") }
    intercept[IllegalArgumentException] { cs.chunkRefs("") }
    intercept[IllegalArgumentException] { cs.updateChunkRefs("", 1) }
  }

  test(s"$name: reads are pure — repeated read-chunk/chunk-refs return " +
      "equal results with no write side effects (chunk_store.clj:185-244)") {
    val cs = freshConn().chunkStore()
    val (h, bytes, ref) = (randHash(), randBytes(), 42L)
    cs.writeChunk(h, ref, bytes)
    val reads = Seq.fill(3)(cs.readChunk(h))
    assert(reads.forall(java.util.Arrays.equals(_, bytes)))
    val refs = Seq.fill(3)(cs.chunkRefs(h))
    assert(refs.forall(_ == ref))
  }

  test(s"$name: refcount updates are additive; negative deltas allowed " +
      "(chunk_store.clj:147-162)") {
    val cs = freshConn().chunkStore()
    val h = randHash()
    cs.writeChunk(h, 0, randBytes())
    val deltas = Seq.fill(20)(rnd.nextInt(100).toLong - 50)
    var expected = 0L
    deltas.foreach { d =>
      val before = cs.chunkRefs(h)
      cs.updateChunkRefs(h, d)
      assert(cs.chunkRefs(h) - before == d,
        "each update changes the count by exactly its delta")
      expected += d
    }
    assert(cs.chunkRefs(h) == expected,
      "shuffled deltas accumulate to their sum")
  }

  test(s"$name: concurrent chunk writes are safe and idempotent incl. " +
      "refcounts (chunk_store.clj:293-317: 3 writers per chunk)") {
    val cs = freshConn().chunkStore()
    val entries = Seq.fill(48)((randHash(), randBytes(), rnd.nextInt(10000).toLong))
    // three competing writers of the SAME (hash, ref, bytes) tuple each
    val work = scala.util.Random.shuffle(entries.flatMap(e => Seq(e, e, e)))
    val threads = work.grouped(work.size / 8 + 1).map { group =>
      new Thread(() => group.foreach { case (h, b, r) => cs.writeChunk(h, r, b) })
    }.toSeq
    threads.foreach(_.start()); threads.foreach(_.join())
    entries.foreach { case (h, b, r) =>
      assert(java.util.Arrays.equals(cs.readChunk(h), b))
      assert(cs.chunkRefs(h) == r, "triple concurrent write must not accumulate refs")
    }
  }

  test(s"$name: concurrent update-chunk-refs are additive " +
      "(chunk_store.clj:319-352)") {
    val cs = freshConn().chunkStore()
    val hashes = Seq.fill(16)(randHash())
    hashes.foreach(h => cs.writeChunk(h, 0, randBytes()))
    val updates = scala.util.Random.shuffle(
      hashes.flatMap(h => Seq.fill(6)((h, rnd.nextInt(200).toLong - 100))))
    val expected = updates.groupBy(_._1).map { case (h, us) => h -> us.map(_._2).sum }
    val threads = updates.grouped(updates.size / 8 + 1).map { group =>
      new Thread(() => group.foreach { case (h, d) => cs.updateChunkRefs(h, d) })
    }.toSeq
    threads.foreach(_.start()); threads.foreach(_.join())
    expected.foreach { case (h, sum) => assert(cs.chunkRefs(h) == sum) }
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

/** The Spark-native store's refcount contract: every chunk row is written
  * with ref = −1, exactly the reference production write path's convention
  * (impl.clj:253-254 "fixme implement ref-counting" / ref-count -1, and
  * s3.clj write-chunk ignores ref-count). GC is mark-and-sweep vacuum
  * (exercised in VacuumAndFunctionsSpec), not refcounting — the additive-
  * refcount laws above bind protocol backends (mem), not this layout. */
class SparkChunkLayoutLaws extends AnyFunSuite {
  test("spark store chunk rows always carry ref = -1 (impl.clj:254)") {
    val spark = SparkTestSession.spark
    val root = java.nio.file.Files.createTempDirectory("graft-reflaw").toString
    val store = new graft.spark.SparkStore(spark, root)
    store.create("ds")
    val meta = DatasetMeta(
      dimensions = Map("x" -> 8L), chunkDimensions = Map("x" -> 2L),
      variables = Map("v" -> VariableDef("int", Vector("x"), 0.0)))
    val w = store.addVersion("ds", meta)
    w.write("v", Seq(graft.core.Slab.fromDoubles(graft.core.DType.INT,
      graft.core.Slice(Seq(0L), Seq(8L)), (1 to 8).map(_.toDouble))))
    w.finishVersion()
    val refs = spark.read.parquet(store.chunksDir).select("ref")
      .collect().map(_.getLong(0)).toSet
    assert(refs == Set(-1L))
  }
}

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
