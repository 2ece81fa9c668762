package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Pinned vectors from the reference's pure unit tests
  * (test/io/mandoline/slice_test.clj, chunk_test.clj, slab_test.clj). */
class CoreSpec extends AnyFunSuite {

  test("slice defaults: stop=start+1, step=1 (slice_test)") {
    val s = Slice.of(0, 0, 0)
    assert(s.stop == Vector(1L, 1L, 1L) && s.step == Vector(1L, 1L, 1L))
  }

  test("slice shape honors step") {
    assert(Slice(Vector(0L, 0L, 0L), Vector(4L, 5L, 2L), Vector(2L, 2L, 2L)).shape
      == Vector(2, 3, 1))
  }

  test("slice parity mismatch throws") {
    intercept[IllegalArgumentException] {
      Slice(Vector(0L), Vector(1L, 2L), Vector(1L))
    }
  }

  test("contains: a inside b") {
    val big = Slice(Seq(0L, 0L), Seq(10L, 10L))
    val small = Slice(Seq(2L, 3L), Seq(5L, 7L))
    assert(small.isContainedIn(big))
    assert(!big.isContainedIn(small))
    // rank-0 contains rank-0
    assert(Slice(Seq.empty[Long], Seq.empty[Long]).isContainedIn(Slice(Seq.empty[Long], Seq.empty[Long])))
  }

  test("intersection: step-1, max/min, throws when disjoint (slice_test)") {
    val a = Slice(Seq(0L, 0L), Seq(5L, 5L))
    val b = Slice(Seq(3L, 2L), Seq(9L, 4L))
    assert(a.intersect(b) == Slice(Seq(3L, 2L), Seq(5L, 4L)))
    intercept[IllegalArgumentException] {
      a.intersect(Slice(Seq(5L, 5L), Seq(6L, 6L)))
    }
  }

  test("intersectLattice: strided slice clipped to a step-1 box — start " +
      "aligned UP to the lattice, step preserved; Opt answers None when " +
      "no lattice point lies in the box") {
    val s = Slice(Vector(1L, 0L), Vector(20L, 10L), Vector(3L, 4L))
    // box [5,13)x[2,9): x lattice {1,4,7,10,13,16,19} ∩ [5,13) = {7,10};
    // y lattice {0,4,8} ∩ [2,9) = {4,8}
    assert(s.intersectLattice(Slice(Seq(5L, 2L), Seq(13L, 9L))) ==
      Slice(Vector(7L, 4L), Vector(13L, 9L), Vector(3L, 4L)))
    // step-1 receiver degenerates to plain intersection
    val p = Slice(Seq(0L, 0L), Seq(5L, 5L))
    assert(p.intersectLattice(Slice(Seq(3L, 2L), Seq(9L, 4L))) ==
      Slice(Seq(3L, 2L), Seq(5L, 4L)))
    // box strictly between two lattice points: None / throws
    assert(s.intersectLatticeOpt(Slice(Seq(5L, 0L), Seq(7L, 10L))).isEmpty)
    intercept[IllegalArgumentException] {
      s.intersectLattice(Slice(Seq(5L, 0L), Seq(7L, 10L)))
    }
    // box must be step-1
    intercept[IllegalArgumentException] {
      s.intersectLattice(Slice(Vector(0L, 0L), Vector(9L, 9L), Vector(2L, 2L)))
    }
  }

  test("mergeFrom on strided slabs: per-cell lattice gather; step and " +
      "lattice alignment enforced") {
    import graft.core.DType
    // response lattice x {0,3,6,9}, chunk-clip slabs carry sub-lattices
    val resp = Slab.empty(DType.LONG,
      Slice(Vector(0L), Vector(10L), Vector(3L)), -1.0)
    val c1 = Slab.fromDoubles(DType.LONG,
      Slice(Vector(0L), Vector(4L), Vector(3L)), Seq(10.0, 13.0)) // {0,3}
    val c2 = Slab.fromDoubles(DType.LONG,
      Slice(Vector(6L), Vector(10L), Vector(3L)), Seq(16.0, 19.0)) // {6,9}
    resp.mergeFrom(c1).mergeFrom(c2)
    assert(Seq(0L, 3L, 6L, 9L).map(x => resp.valueAt(Seq(x))) ==
      Seq(10.0, 13.0, 16.0, 19.0))
    // mismatched step refuses
    intercept[IllegalArgumentException] {
      resp.mergeFrom(Slab.fromDoubles(DType.LONG,
        Slice(Vector(0L), Vector(4L), Vector(2L)), Seq(1.0, 2.0)))
    }
    // off-lattice start refuses (same step, shifted origin)
    intercept[IllegalArgumentException] {
      resp.mergeFrom(Slab.fromDoubles(DType.LONG,
        Slice(Vector(1L), Vector(5L), Vector(3L)), Seq(1.0, 2.0)))
    }
  }

  test("translate re-origins") {
    val origin = Slice(Seq(2L, 2L), Seq(9L, 9L))
    val s = Slice(Seq(3L, 4L), Seq(5L, 6L))
    assert(s.translate(origin) == Slice(Seq(1L, 2L), Seq(3L, 4L)))
  }

  test("iter is row-major, last dim fastest (slice_test)") {
    val coords = Slice(Seq(0L, 0L), Seq(2L, 2L)).iter.map(_.toVector).toVector
    assert(coords == Vector(Vector(0L, 0L), Vector(0L, 1L), Vector(1L, 0L), Vector(1L, 1L)))
  }

  test("to-chunk-coordinate: floor-div cartesian (chunk_test.clj:11-24)") {
    val grid = Slice(Vector(0L, 0L), Vector(10L, 10L), Vector(4L, 4L))
    val slice = Slice(Seq(2L, 3L), Seq(9L, 5L))
    assert(ChunkGrid.toChunkCoordinates(slice, grid) ==
      Vector(Vector(0L, 0L), Vector(0L, 1L), Vector(1L, 0L), Vector(1L, 1L), Vector(2L, 0L), Vector(2L, 1L)))
  }

  test("from-chunk-coordinate overhangs the edge (chunk_test.clj:26-33, variable.clj:58-74)") {
    val grid = Slice(Vector(0L), Vector(10L), Vector(4L))
    assert(ChunkGrid.fromChunkCoordinate(grid, Seq(2L)) == Slice(Seq(8L), Seq(12L)))
  }

  test("scalar (rank-0) slices work (scalar.clj:11-18)") {
    val s = Slice(Seq.empty[Long], Seq.empty[Long])
    assert(s.volume == 1L && s.iter.toSeq.map(_.toVector) == Seq(Vector.empty))
    val grid = Slice(Vector.empty[Long], Vector.empty[Long], Vector.empty[Long])
    assert(ChunkGrid.toChunkCoordinates(s, grid) == Vector(Vector.empty))
  }

  test("chunk id is 40 hex chars of SHA-1 (chunk_test.clj:35-45)") {
    val slab = Slab.fromDoubles(DType.SHORT, Slice(Seq(0L), Seq(3L)), Seq(1, 2, 3))
    val h = slab.contentHash
    assert(h.length == 40 && h.matches("[0-9a-f]{40}"))
    // deterministic
    assert(h == Slab.fromDoubles(DType.SHORT, Slice(Seq(0L), Seq(3L)), Seq(1, 2, 3)).contentHash)
  }

  test("slab subset/intersect/merge (slab_test.clj:25-52)") {
    val base = Slab.fromDoubles(DType.INT, Slice(Seq(0L, 0L), Seq(3L, 3L)),
      Seq(0, 1, 2, 3, 4, 5, 6, 7, 8))
    val sub = base.subset(Slice(Seq(1L, 1L), Seq(3L, 2L)))
    assert(sub.valueAt(Seq(1L, 1L)) == 4.0 && sub.valueAt(Seq(2L, 1L)) == 7.0)
    intercept[IllegalArgumentException] {
      base.subset(Slice(Seq(2L, 2L), Seq(5L, 5L))) // not contained
    }
    // intersect clips
    val clipped = base.intersectWith(Slice(Seq(2L, 0L), Seq(9L, 2L)))
    assert(clipped.slice == Slice(Seq(2L, 0L), Seq(3L, 2L)))
    assert(clipped.valueAt(Seq(2L, 0L)) == 6.0)
    // merge: last writer wins per cell
    val overlay = Slab.fromDoubles(DType.INT, Slice(Seq(1L, 1L), Seq(2L, 2L)), Seq(99))
    base.mergeFrom(overlay)
    assert(base.valueAt(Seq(1L, 1L)) == 99.0 && base.valueAt(Seq(0L, 0L)) == 0.0)
  }

  test("strided subset: reference's pinned vectors (slab_test.clj:25-52)") {
    // x: short slab on [7,13)×[3,8), values row-major
    val x = Slab.fromDoubles(DType.SHORT, Slice(Seq(7L, 3L), Seq(13L, 8L)),
      Seq(1, 2, 3, 4, 5, 2, 3, 4, 5, 6, 3, 4, 5, 6, 7, 4, 5, 6, 7, 8,
        5, 6, 7, 8, 9, 6, 7, 8, 9, 0))
    def vals(s: Slab): Seq[Double] =
      s.slice.iter.map(c => s.valueAt(c.toIndexedSeq)).toSeq
    // u: step-1 view
    val u = x.subset(Slice(Vector(7L, 3L), Vector(10L, 5L), Vector(1L, 1L)))
    assert(vals(u) == Seq(1, 2, 2, 3, 3, 4).map(_.toDouble))
    // v: step [2,1] view → x ∈ {8,10}, y ∈ {4,5}
    val v = x.subset(Slice(Vector(8L, 4L), Vector(12L, 6L), Vector(2L, 1L)))
    assert(vals(v) == Seq(3, 4, 5, 6).map(_.toDouble))
    // w: step [2,2] view → (7,3), (7,5)
    val w = x.subset(Slice(Vector(7L, 3L), Vector(9L, 7L), Vector(2L, 2L)))
    assert(vals(w) == Seq(1, 3).map(_.toDouble))
    // non-overlapping view rejected
    intercept[IllegalArgumentException] {
      x.subset(Slice(Vector(0L, 0L), Vector(2L, 3L), Vector(1L, 1L)))
    }
    // strided slab, view with DIFFERENT steps rejected
    val z = Slab.fromDoubles(DType.SHORT,
      Slice(Vector(0L, 0L), Vector(12L, 10L), Vector(2L, 2L)),
      Seq(1, 2, 3, 4, 5, 2, 3, 4, 5, 6, 3, 4, 5, 6, 7, 4, 5, 6, 7, 8,
        5, 6, 7, 8, 9, 6, 7, 8, 9, 0))
    intercept[IllegalArgumentException] {
      z.subset(Slice(Vector(8L, 4L), Vector(12L, 6L), Vector(2L, 1L)))
    }
    // strided slab, EQUAL-step sub-view gathers on the lattice
    val z2 = z.subset(Slice(Vector(2L, 2L), Vector(5L, 5L), Vector(2L, 2L)))
    assert(vals(z2) == Seq(z.valueAt(Seq(2L, 2L)), z.valueAt(Seq(2L, 4L)),
      z.valueAt(Seq(4L, 2L)), z.valueAt(Seq(4L, 4L))))
  }

  test("fill init, all types, incl NaN (slab/empty)") {
    for (t <- DType.all if t != DType.CHAR) {
      val s = Slab.empty(t, Slice(Seq(0L), Seq(4L)), -3.0)
      assert(s.valueAt(Seq(2L)) == -3.0, t.name)
    }
    val f = Slab.empty(DType.FLOAT, Slice(Seq(0L), Seq(4L)), Double.NaN)
    assert(f.valueAt(Seq(0L)).isNaN)
    val c = Slab.empty(DType.CHAR, Slice(Seq(0L), Seq(2L)), 'a'.toDouble)
    assert(c.valueAt(Seq(1L)) == 97.0)
  }

  test("big-endian round trip for every type") {
    for (t <- DType.all) {
      val vals = Seq(0.0, 1.0, 65.0, 100.0)
      val s = Slab.fromDoubles(t, Slice(Seq(0L), Seq(4L)), vals)
      assert(vals.indices.forall(i => s.valueAt(Seq(i.toLong)) == vals(i)), t.name)
    }
    // negative values for signed types
    for (t <- Seq(DType.BYTE, DType.SHORT, DType.INT, DType.LONG, DType.FLOAT, DType.DOUBLE)) {
      val s = Slab.fromDoubles(t, Slice(Seq(0L), Seq(1L)), Seq(-3.0))
      assert(s.valueAt(Seq(0L)) == -3.0, t.name)
    }
  }
}
