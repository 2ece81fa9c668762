package graft

import graft.api._
import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import graft.store.MemBackend
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end behavioral suites mirroring the reference's backend-agnostic
  * test library (src/io/mandoline/test/): entire_flow, grow, shrink,
  * overwrite, nan, scalar, failed_ingest, linear_versions, token,
  * concurrency overlap ordering, dedup.
  */
class FlowSpec extends AnyFunSuite {

  private def freshStore(): GraftStore = new GraftStore(new MemBackend)

  /** FIXTURES.md F1 (reference: resources/test-foobar.json). */
  private def foobarMeta = DatasetMeta(
    dimensions = Map("x" -> 10L, "y" -> 11L, "z" -> 12L, "time" -> 13L),
    chunkDimensions = Map("x" -> 2L, "y" -> 2L, "z" -> 2L, "time" -> 2L),
    variables = Map(
      "foo" -> VariableDef("short", Vector("x", "y", "time"), -3.0),
      "bar" -> VariableDef("int", Vector("x", "y", "z", "time"), -99.0),
      "baz" -> VariableDef("char", Vector("z"), 0.0),
      "scalar" -> VariableDef("int", Vector(), 0.0,
        Some("""{"comments":"i am a scalar!"}"""))))

  private def randomSlab(dtype: DType, slice: Slice, seed: Long): Slab = {
    val rnd = new scala.util.Random(seed)
    Slab.fromDoubles(dtype, slice,
      Seq.fill(slice.volume.toInt)(rnd.nextInt(1000).toDouble))
  }
  private def constSlab(dtype: DType, slice: Slice, v: Double): Slab =
    Slab.empty(dtype, slice, v)

  test("entire flow: write two slabs, read merged + fill corner (entire_flow.clj)") {
    val store = freshStore()
    store.create("foobar")
    val vw = store.writer("foobar").addVersion(foobarMeta)
    // foo: random slab [0 0 0]→[3 5 8] + constant-1 slab [3 5 8]→[10 10 10]
    val s1 = randomSlab(DType.SHORT, Slice(Seq(0L, 0L, 0L), Seq(3L, 5L, 8L)), 1)
    val s2 = constSlab(DType.SHORT, Slice(Seq(3L, 5L, 8L), Seq(10L, 10L, 10L)), 1.0)
    vw.write("foo", Seq(s1, s2))
    val v1 = vw.finishVersion()

    val r = store.reader("foobar").onLastVersion()
    // full-variable read assembles both slabs + fill elsewhere
    val full = r.getSlice("foo", Slice(Seq(0L, 0L, 0L), Seq(10L, 11L, 13L)))
    assert(full.valueAt(Seq(0L, 0L, 0L)) == s1.valueAt(Seq(0L, 0L, 0L)))
    assert(full.valueAt(Seq(2L, 4L, 7L)) == s1.valueAt(Seq(2L, 4L, 7L)))
    assert(full.valueAt(Seq(5L, 7L, 9L)) == 1.0)
    // unwritten corner reads back fill (entire_flow.clj:211-213)
    assert(full.valueAt(Seq(9L, 10L, 12L)) == -3.0)
    // windowed read crossing both slabs + fill
    val win = r.getSlice("foo", Slice(Seq(2L, 4L, 6L), Seq(6L, 8L, 11L)))
    assert(win.valueAt(Seq(2L, 4L, 7L)) == s1.valueAt(Seq(2L, 4L, 7L)))
    assert(win.valueAt(Seq(4L, 6L, 9L)) == 1.0)
    assert(win.valueAt(Seq(2L, 7L, 10L)) == -3.0)
    assert(store.versions("foobar").map(_.versionId) == Seq(v1))
  }

  test("bounds check: request crossing variable extent throws (stream, io/mandoline.clj:244-249)") {
    val store = freshStore()
    store.create("ds")
    val vw = store.writer("ds").addVersion(foobarMeta)
    vw.finishVersion()
    val r = store.reader("ds").onLastVersion()
    intercept[IndexOutOfBoundsException] {
      r.getSlice("foo", Slice(Seq(0L, 0L, 0L), Seq(11L, 11L, 13L)))
    }
    // checkBounds=false allows it
    val s = r.getSlice("foo", Slice(Seq(0L, 0L, 0L), Seq(11L, 11L, 13L)), checkBounds = false)
    assert(s.valueAt(Seq(10L, 0L, 0L)) == -3.0)
  }

  test("strided (step>1) read through Engine.stream/getSlice: lattice-" +
      "exact values, fill at unwritten lattice points, whole chunks " +
      "skipped when step exceeds the chunk extent (the reference " +
      "deprecates strided reads, slice.clj:81-102; here first-class)") {
    val store = freshStore()
    store.create("foobar")
    val vw = store.writer("foobar").addVersion(foobarMeta)
    // write only [0,6)x[0,8)x[0,9): lattice points beyond read fill
    val s1 = randomSlab(DType.SHORT, Slice(Seq(0L, 0L, 0L), Seq(6L, 8L, 9L)), 7)
    vw.write("foo", Seq(s1))
    vw.finishVersion()
    val r = store.reader("foobar").onLastVersion()
    val strided = Slice(Vector(1L, 0L, 2L), Vector(10L, 11L, 13L),
      Vector(3L, 2L, 5L)) // x:{1,4,7} y:{0,2,..,10} z:{2,7,12}
    val got = r.getSlice("foo", strided)
    assert(got.slice == strided && got.volume == strided.volume)
    val written = s1.slice
    strided.iter.foreach { c =>
      val co = c.toIndexedSeq
      val expect =
        if ((0 until 3).forall(i => co(i) >= written.start(i) &&
            co(i) < written.stop(i))) s1.valueAt(co)
        else -3.0 // fill
      assert(got.valueAt(co) == expect, s"at ${co.mkString(",")}")
    }
    // stream yields one slab per lattice-bearing chunk, each clipped to
    // the lattice — and chunk skipping is real: step 3 on the 2-extent x
    // axis touches x-chunks {0,2,3} only (x=1,4,7), never x-chunk 1
    val slabs = r.stream("foo", strided).toVector
    assert(slabs.nonEmpty && slabs.forall(_.slice.step == strided.step))
    val grid = foobarMeta.chunkGridSlice("foo")
    val touched = graft.core.ChunkGrid.toChunkCoordinates(strided, grid)
    assert(slabs.size == touched.size)
    assert(!touched.exists(_(0) == 1L), "x-chunk 1 holds no lattice point")
    val boxChunks = graft.core.ChunkGrid.toChunkCoordinates(
      Slice(strided.start, strided.stop), grid)
    assert(touched.size < boxChunks.size, "stride must skip chunks")
    // round trip: strided getSlice == step-1 getSlice sampled on the lattice
    val full = r.getSlice("foo", Slice(Seq(0L, 0L, 0L), Seq(10L, 11L, 13L)))
    strided.iter.foreach { c =>
      assert(got.valueAt(c.toIndexedSeq) == full.valueAt(c.toIndexedSeq))
    }
  }

  test("char variable round trip (entire_flow.clj:24-27)") {
    val store = freshStore()
    store.create("ds")
    val vw = store.writer("ds").addVersion(foobarMeta)
    vw.write("baz", Seq(
      constSlab(DType.CHAR, Slice(Seq(0L), Seq(10L)), 'a'.toDouble),
      constSlab(DType.CHAR, Slice(Seq(10L), Seq(12L)), 'b'.toDouble)))
    vw.finishVersion()
    val got = store.reader("ds").onLastVersion()
      .getSlice("baz", Slice(Seq(0L), Seq(12L)))
    assert(got.valueAt(Seq(0L)) == 'a'.toDouble)
    assert(got.valueAt(Seq(9L)) == 'a'.toDouble)
    assert(got.valueAt(Seq(11L)) == 'b'.toDouble)
  }

  test("scalar (0-d) variable write/read (scalar.clj:40-50)") {
    val store = freshStore()
    store.create("ds")
    val vw = store.writer("ds").addVersion(foobarMeta)
    val empty = Slice(Seq.empty[Long], Seq.empty[Long])
    vw.write("scalar", Seq(Slab.fromDoubles(DType.INT, empty, Seq(42.0))))
    vw.finishVersion()
    val got = store.reader("ds").onLastVersion().getSlice("scalar", empty)
    assert(got.valueAt(Nil) == 42.0)
  }

  test("time travel: v1 vs v2 discrepant data; nth/timestamp resolution (entire_flow.clj:87-125,192-293)") {
    val store = freshStore()
    store.create("ds")
    val w1 = store.writer("ds").addVersion(foobarMeta)
    w1.write("foo", Seq(constSlab(DType.SHORT, Slice(Seq(0L, 0L, 0L), Seq(10L, 11L, 13L)), 7.0)))
    val v1 = w1.finishVersion()

    val w2 = store.writer("ds").addVersion(foobarMeta)
    w2.write("foo", Seq(constSlab(DType.SHORT, Slice(Seq(2L, 2L, 2L), Seq(4L, 4L, 4L)), 9.0)))
    val v2 = w2.finishVersion()

    val reader = store.reader("ds")
    val probe = Slice(Seq(2L, 2L, 2L), Seq(4L, 4L, 4L))
    assert(reader.onVersion(v1).getSlice("foo", probe).valueAt(Seq(3L, 3L, 3L)) == 7.0)
    assert(reader.onVersion(v2).getSlice("foo", probe).valueAt(Seq(3L, 3L, 3L)) == 9.0)
    // structural sharing: untouched cells inherited from v1
    assert(reader.onVersion(v2).getSlice("foo",
      Slice(Seq(8L, 8L, 8L), Seq(9L, 9L, 9L))).valueAt(Seq(8L, 8L, 8L)) == 7.0)
    // versions reverse-chronological; nth from end
    assert(reader.versions.map(_.versionId) == Seq(v2, v1))
    assert(reader.onNthVersion(0).meta.versionId.contains(v2))
    assert(reader.onNthVersion(-1).meta.versionId.contains(v1))
    assert(reader.onNthVersion(1).meta.versionId.contains(v1))
    // timestamp resolution: latest ≤ ts
    val ts1 = store.versions("ds").find(_.versionId == v1).get.timestamp
    assert(reader.onTimestamp(ts1).meta.versionId.contains(v1))
  }

  test("overwrite single cell in v2 (overwrite.clj:19-21)") {
    val store = freshStore()
    val meta = DatasetMeta(
      dimensions = Map("x" -> 10L, "y" -> 11L, "z" -> 12L),
      chunkDimensions = Map("x" -> 2L, "y" -> 2L, "z" -> 2L),
      variables = Map("foo" -> VariableDef("short", Vector("x", "y", "z"), -3.0)))
    store.create("ds")
    val w1 = store.writer("ds").addVersion(meta)
    w1.write("foo", Seq(randomSlab(DType.SHORT, Slice(Seq(0L, 0L, 0L), Seq(10L, 11L, 12L)), 5)))
    val v1 = w1.finishVersion()
    val w2 = store.writer("ds").addVersion(meta)
    w2.write("foo", Seq(constSlab(DType.SHORT, Slice(Seq(4L, 4L, 4L), Seq(5L, 5L, 5L)), 123.0)))
    val v2 = w2.finishVersion()
    val r = store.reader("ds")
    assert(r.onVersion(v2).getSlice("foo", Slice(Seq(4L, 4L, 4L), Seq(5L, 5L, 5L))).valueAt(Seq(4L, 4L, 4L)) == 123.0)
    // neighbors in same chunk untouched
    val v1Val = r.onVersion(v1).getSlice("foo", Slice(Seq(4L, 4L, 5L), Seq(5L, 5L, 6L))).valueAt(Seq(4L, 4L, 5L))
    assert(r.onVersion(v2).getSlice("foo", Slice(Seq(4L, 4L, 5L), Seq(5L, 5L, 6L))).valueAt(Seq(4L, 4L, 5L)) == v1Val)
  }

  test("grow: child version re-dimensions larger; old data retained; bounds per version (grow.clj)") {
    val store = freshStore()
    val v1meta = DatasetMeta(
      dimensions = Map("x" -> 4L, "y" -> 5L, "z" -> 6L),
      chunkDimensions = Map("x" -> 2L, "y" -> 2L, "z" -> 2L),
      variables = Map("foo" -> VariableDef("short", Vector("x", "y", "z"), -3.0)))
    store.create("ds")
    val w1 = store.writer("ds").addVersion(v1meta)
    w1.write("foo", Seq(constSlab(DType.SHORT, Slice(Seq(0L, 0L, 0L), Seq(4L, 5L, 6L)), 5.0)))
    val v1 = w1.finishVersion()
    // v2 grows dims to 10×10×10 (chunk dims frozen)
    val v2meta = v1meta.copy(dimensions = Map("x" -> 10L, "y" -> 10L, "z" -> 10L))
    val w2 = store.writer("ds").addVersion(v2meta)
    w2.write("foo", Seq(constSlab(DType.SHORT, Slice(Seq(6L, 6L, 6L), Seq(8L, 8L, 8L)), 9.0)))
    val v2 = w2.finishVersion()
    val r = store.reader("ds")
    val full2 = r.onVersion(v2).getSlice("foo", Slice(Seq(0L, 0L, 0L), Seq(10L, 10L, 10L)))
    assert(full2.valueAt(Seq(1L, 1L, 1L)) == 5.0) // retained from v1
    assert(full2.valueAt(Seq(7L, 7L, 7L)) == 9.0) // new
    assert(full2.valueAt(Seq(9L, 9L, 9L)) == -3.0) // fill in grown region
    // v1 bounds still enforced (grow.clj:61-66)
    intercept[IndexOutOfBoundsException] {
      r.onVersion(v1).getSlice("foo", Slice(Seq(0L, 0L, 0L), Seq(10L, 10L, 10L)))
    }
  }

  test("shrink: child re-dimensions smaller; bounds enforced (shrink.clj)") {
    val store = freshStore()
    val v1meta = DatasetMeta(
      dimensions = Map("x" -> 20L, "y" -> 20L, "z" -> 20L),
      chunkDimensions = Map("x" -> 2L, "y" -> 2L, "z" -> 2L),
      variables = Map("foo" -> VariableDef("short", Vector("x", "y", "z"), -3.0)))
    store.create("ds")
    val w1 = store.writer("ds").addVersion(v1meta)
    w1.write("foo", Seq(constSlab(DType.SHORT, Slice(Seq(0L, 0L, 0L), Seq(20L, 20L, 20L)), 5.0)))
    w1.finishVersion()
    val v2meta = v1meta.copy(dimensions = Map("x" -> 10L, "y" -> 11L, "z" -> 12L))
    val w2 = store.writer("ds").addVersion(v2meta)
    val v2 = w2.finishVersion()
    val r = store.reader("ds")
    val s = r.onVersion(v2).getSlice("foo", Slice(Seq(0L, 0L, 0L), Seq(10L, 11L, 12L)))
    assert(s.valueAt(Seq(9L, 10L, 11L)) == 5.0)
    intercept[IndexOutOfBoundsException] {
      r.onVersion(v2).getSlice("foo", Slice(Seq(0L, 0L, 0L), Seq(20L, 20L, 20L)))
    }
  }

  test("schema evolution: v3 adds dimension q and variable bork (entire_flow.clj:61-75)") {
    val store = freshStore()
    store.create("ds")
    store.writer("ds").addVersion(foobarMeta).finishVersion()
    val v3meta = foobarMeta.copy(
      dimensions = foobarMeta.dimensions + ("q" -> 14L),
      chunkDimensions = foobarMeta.chunkDimensions + ("q" -> 2L),
      variables = foobarMeta.variables +
        ("bork" -> VariableDef("float", Vector("x", "y", "q"), Double.NaN)))
    val w = store.writer("ds").addVersion(v3meta)
    w.write("bork", Seq(constSlab(DType.FLOAT, Slice(Seq(0L, 0L, 0L), Seq(2L, 2L, 2L)), 1.5)))
    w.finishVersion()
    val r = store.reader("ds").onLastVersion()
    val s = r.getSlice("bork", Slice(Seq(0L, 0L, 0L), Seq(10L, 11L, 14L)))
    assert(s.valueAt(Seq(1L, 1L, 1L)) == 1.5)
    assert(s.valueAt(Seq(9L, 9L, 13L)).isNaN) // NaN fill round trip (nan.clj:39-50)
  }

  test("NaN fill only legal for float/double (nan.clj:97-124, dataset_test.clj)") {
    for (bad <- Seq("short", "int", "long", "byte", "char")) {
      val m = DatasetMeta(
        dimensions = Map("x" -> 5L), chunkDimensions = Map("x" -> 2L),
        variables = Map("v" -> VariableDef(bad, Vector("x"), Double.NaN)))
      intercept[IllegalArgumentException] { DatasetMeta.validate(m) }
    }
    for (ok <- Seq("float", "double")) {
      DatasetMeta.validate(DatasetMeta(
        dimensions = Map("x" -> 5L), chunkDimensions = Map("x" -> 2L),
        variables = Map("v" -> VariableDef(ok, Vector("x"), Double.NaN))))
    }
  }

  test("invalid metadata matrix (invalid_metadata.clj:9-37, dataset_test.clj:50-59)") {
    val valid = foobarMeta
    def bad(m: DatasetMeta): Unit =
      intercept[IllegalArgumentException] { DatasetMeta.validate(m) }
    // unknown shape name
    bad(valid.copy(variables = valid.variables +
      ("foo" -> VariableDef("short", Vector("nope"), -3.0))))
    // unsupported types (incl. boolean/string/unsigned, dataset_test.clj:50-59)
    for (t <- Seq("boolean", "string", "uint", "ushort", "ulong", "decimal"))
      bad(valid.copy(variables = valid.variables +
        ("foo" -> VariableDef(t, Vector("x"), 0.0))))
    // chunk-dimensions keyset mismatch
    bad(valid.copy(chunkDimensions = valid.chunkDimensions - "x"))
    bad(valid.copy(chunkDimensions = valid.chunkDimensions + ("extra" -> 2L)))
    // frozen across versions (invalid_metadata.clj:39-61)
    val parent = DatasetMeta.newVersion(valid)
    def badChild(m: DatasetMeta): Unit =
      intercept[IllegalArgumentException] { DatasetMeta.inherit(m, parent) }
    badChild(valid.copy(chunkDimensions = valid.chunkDimensions.map { case (k, v) => (k, v + 1) }))
    badChild(valid.copy(variables = valid.variables +
      ("foo" -> VariableDef("int", Vector("x", "y", "time"), -3.0)))) // type change
    badChild(valid.copy(variables = valid.variables +
      ("foo" -> VariableDef("short", Vector("y", "x", "time"), -3.0)))) // permuted shape
    badChild(valid.copy(variables = valid.variables +
      ("foo" -> VariableDef("short", Vector("x", "y", "time"), -4.0)))) // fill change
  }

  test("uncommitted version invisible to readers (failed_ingest.clj:26-150)") {
    val store = freshStore()
    store.create("ds")
    val w1 = store.writer("ds").addVersion(foobarMeta)
    w1.write("foo", Seq(constSlab(DType.SHORT, Slice(Seq(0L, 0L, 0L), Seq(10L, 11L, 13L)), 7.0)))
    val v1 = w1.finishVersion()
    // start v2, write, but do NOT commit
    val w2 = store.writer("ds").addVersion(foobarMeta)
    w2.write("foo", Seq(constSlab(DType.SHORT, Slice(Seq(0L, 0L, 0L), Seq(10L, 11L, 13L)), 8.0)))
    // latest still v1; reads see v1 data
    assert(store.versions("ds").map(_.versionId) == Seq(v1))
    val got = store.reader("ds").onLastVersion().getSlice("foo", Slice(Seq(0L, 0L, 0L), Seq(1L, 1L, 1L)))
    assert(got.valueAt(Seq(0L, 0L, 0L)) == 7.0)
  }

  test("linear history: second child of same parent throws (linear_versions.clj:61-67)") {
    val store = freshStore()
    store.create("ds")
    val w1 = store.writer("ds").addVersion(foobarMeta)
    w1.finishVersion()
    val w2a = store.writer("ds").addVersion(foobarMeta)
    val w2b = store.writer("ds").addVersion(foobarMeta)
    w2a.finishVersion()
    intercept[IllegalStateException] { w2b.finishVersion() }
  }

  test("writer token round trip enables multi-writer ingest (token.clj:10-31, script.clj:54-83)") {
    val store = freshStore()
    store.create("ds")
    val w = store.writer("ds").addVersion(foobarMeta)
    val token = w.token
    // "another process": reconstruct from token, write disjoint region
    val w2 = VersionWriter.fromToken(store, "ds", token)
    assert(w2.meta.versionId == w.meta.versionId)
    assert(w2.parentMeta.isEmpty)
    w2.write("foo", Seq(constSlab(DType.SHORT, Slice(Seq(0L, 0L, 0L), Seq(5L, 11L, 13L)), 1.0)))
    w.write("foo", Seq(constSlab(DType.SHORT, Slice(Seq(5L, 0L, 0L), Seq(10L, 11L, 13L)), 2.0)))
    w.finishVersion()
    val got = store.reader("ds").onLastVersion().getSlice("foo", Slice(Seq(0L, 0L, 0L), Seq(10L, 11L, 13L)))
    assert(got.valueAt(Seq(0L, 0L, 0L)) == 1.0 && got.valueAt(Seq(9L, 0L, 0L)) == 2.0)
  }

  test("overlap ordering: last writer wins across 9 overlapping slabs ×100 (concurrency.clj:75-160)") {
    val store = freshStore()
    val meta = DatasetMeta(
      dimensions = Map("x" -> 50L, "y" -> 50L),
      chunkDimensions = Map("x" -> 7L, "y" -> 7L),
      variables = Map("foo" -> VariableDef("short", Vector("x", "y"), 0.0)))
    store.create("ds")
    val w = store.writer("ds").addVersion(meta)
    // nine 3×3 slabs values 1..9 all overlapping around [5 5]→[10 10],
    // applied in ORDER (sequential writes pin last-writer-wins determinism)
    val slabs = (1 to 9).map { v =>
      val ox = 4 + (v - 1) % 3
      val oy = 4 + (v - 1) / 3
      constSlab(DType.SHORT, Slice(Seq(ox.toLong, oy.toLong), Seq(ox + 3L, oy + 3L)), v.toDouble)
    }
    w.write("foo", slabs)
    w.finishVersion()
    val got = store.reader("ds").onLastVersion().getSlice("foo", Slice(Seq(0L, 0L), Seq(50L, 50L)))
    // slab 9 covers [6 6]→[9 9] and was written last → wins there
    assert(got.valueAt(Seq(8L, 8L)) == 9.0)
    assert(got.valueAt(Seq(6L, 6L)) == 9.0)
    // cell covered only by slab 1
    assert(got.valueAt(Seq(4L, 4L)) == 1.0)
    // untouched cell = fill
    assert(got.valueAt(Seq(20L, 20L)) == 0.0)
  }

  test("content dedup: constant variable stores O(1) distinct blobs (impl_test.clj:17-39)") {
    val backend = new MemBackend
    val store = new GraftStore(backend)
    val meta = DatasetMeta(
      dimensions = Map("x" -> 100L, "y" -> 100L),
      chunkDimensions = Map("x" -> 2L, "y" -> 2L), // 2500 chunks
      variables = Map("foo" -> VariableDef("short", Vector("x", "y"), -3.0)))
    store.create("ds")
    val w = store.writer("ds").addVersion(meta)
    w.write("foo", Seq(constSlab(DType.SHORT, Slice(Seq(0L, 0L), Seq(100L, 100L)), 5.0)))
    w.finishVersion()
    // all 2500 chunks identical → exactly 1 stored blob
    assert(backend.chunks.size == 1)
  }

  test("lots of tiny slices: 100 single-column writes, then grow (concurrency.clj:27-29)") {
    val store = freshStore()
    val meta = DatasetMeta(
      dimensions = Map("x" -> 50L, "y" -> 100L),
      chunkDimensions = Map("x" -> 5L, "y" -> 5L),
      variables = Map("foo" -> VariableDef("short", Vector("x", "y"), -3.0)))
    store.create("ds")
    val w = store.writer("ds").addVersion(meta)
    // one slab per y-column, each a 50×1 stripe valued y
    w.write("foo", (0 until 100).map(y =>
      constSlab(DType.SHORT, Slice(Seq(0L, y.toLong), Seq(50L, y + 1L)), y.toDouble)))
    w.finishVersion()
    val got = store.reader("ds").onLastVersion().getSlice("foo", Slice(Seq(0L, 0L), Seq(50L, 100L)))
    assert(got.valueAt(Seq(0L, 0L)) == 0.0)
    assert(got.valueAt(Seq(49L, 99L)) == 99.0)
    assert(got.valueAt(Seq(25L, 42L)) == 42.0)
    // v2 grows y 100→110; old columns retained, new region fill
    val w2 = store.writer("ds").addVersion(meta.copy(
      dimensions = Map("x" -> 50L, "y" -> 110L)))
    w2.finishVersion()
    val g2 = store.reader("ds").onLastVersion().getSlice("foo", Slice(Seq(0L, 0L), Seq(50L, 110L)))
    assert(g2.valueAt(Seq(10L, 99L)) == 99.0)
    assert(g2.valueAt(Seq(10L, 105L)) == -3.0)
  }

  test("CAS retry under contention: concurrent writers to the same chunk, disjoint cells (concurrency.clj)") {
    val store = freshStore()
    val meta = DatasetMeta(
      dimensions = Map("x" -> 16L),
      chunkDimensions = Map("x" -> 16L), // ONE chunk → maximal contention
      variables = Map("foo" -> VariableDef("int", Vector("x"), -1.0)))
    store.create("ds")
    val vw = store.writer("ds").addVersion(meta)
    // 16 threads, each writes its own single cell through its own writer —
    // all updates target the same chunk, exercising the CAS retry loop
    val threads = (0 until 16).map { i =>
      new Thread(() => {
        val w = VersionWriter.fromToken(store, "ds", vw.token)
        w.write("foo", Seq(Slab.fromDoubles(DType.INT,
          Slice(Seq(i.toLong), Seq(i + 1L)), Seq(i * 10.0))))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    vw.finishVersion()
    val got = store.reader("ds").onLastVersion().getSlice("foo", Slice(Seq(0L), Seq(16L)))
    (0 until 16).foreach(i => assert(got.valueAt(Seq(i.toLong)) == i * 10.0, s"cell $i"))
  }

  test("entire flow with caches disabled (with-and-without-caches, test/utils.clj:166-169)") {
    val store = new GraftStore(new MemBackend, chunkCacheSize = 0)
    store.create("ds")
    val vw = store.writer("ds").addVersion(foobarMeta)
    vw.write("foo", Seq(
      randomSlab(DType.SHORT, Slice(Seq(0L, 0L, 0L), Seq(3L, 5L, 8L)), 11),
      constSlab(DType.SHORT, Slice(Seq(3L, 5L, 8L), Seq(10L, 10L, 10L)), 1.0)))
    vw.finishVersion()
    val got = store.reader("ds").onLastVersion()
      .getSlice("foo", Slice(Seq(0L, 0L, 0L), Seq(10L, 11L, 13L)))
    assert(got.valueAt(Seq(5L, 7L, 9L)) == 1.0)
    assert(got.valueAt(Seq(9L, 10L, 12L)) == -3.0)
  }

  test("metadata JSON round trip incl literal NaN and extra attributes (utils.clj:106-122)") {
    val m = foobarMeta.copy(
      variables = foobarMeta.variables +
        ("nanvar" -> VariableDef("double", Vector("x"), Double.NaN)),
      extra = Some("""{"custom-key":{"nested":true}}"""))
    val json = m.toJson
    assert(json.contains("NaN") && !json.contains("\"NaN\""))
    val back = DatasetMeta.fromJson(json)
    assert(back.dimensions == m.dimensions)
    assert(back.chunkDimensions == m.chunkDimensions)
    assert(back.variables("nanvar").fillValue.isNaN)
    assert(back.variables("scalar").attributes.exists(_.contains("i am a scalar!")))
    assert(back.extra.exists(_.contains("custom-key")))
    assert(back.variables("foo") == m.variables("foo"))
  }
}
