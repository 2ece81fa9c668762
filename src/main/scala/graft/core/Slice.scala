package graft.core

/** Hyperslab selector: per-axis start (inclusive) / stop (exclusive) / step,
  * NumPy-like (reference: src/io/mandoline/slice.clj:6-32). step > 1 is
  * representable but — matching the reference's hot path
  * (slice.clj:104-126, get-intersection precondition) — intersection is
  * only defined for step-1 slices.
  *
  * A rank-0 slice (empty vectors) selects a scalar variable
  * (reference: src/io/mandoline/test/scalar.clj:11-18).
  */
final case class Slice(start: Vector[Long], stop: Vector[Long], step: Vector[Long]) {
  require(start.size == stop.size && stop.size == step.size,
    s"Start, stop and step do not all have the same parity ($start $stop $step)")

  def rank: Int = start.size

  /** Extent per axis, honoring step (reference: slice.clj:37-41). */
  def shape: Vector[Int] = {
    var i = 0
    val b = Vector.newBuilder[Int]
    while (i < rank) {
      val n = stop(i) - start(i)
      require(n > 0, s"slice has non-positive extent on axis $i: $this")
      b += (((n + step(i) - 1) / step(i)).toInt)
      i += 1
    }
    b.result()
  }

  /** Number of selected cells (1 for rank 0). */
  def volume: Long = shape.foldLeft(1L)(_ * _.toLong)

  /** True when every axis has positive extent (a constructible slice may
    * still be empty, e.g. start == stop — callers reject those early
    * rather than crashing deep inside executor tasks). */
  def nonEmpty: Boolean = (0 until rank).forall(i => stop(i) > start(i))

  def stepIsOne: Boolean = step.forall(_ == 1L)

  /** True when `this` lies inside `outer` (reference `contains a b`
    * with a=this, b=outer — slice.clj:46-59; steps are ignored there too). */
  def isContainedIn(outer: Slice): Boolean =
    if (rank != outer.rank) false
    else (0 until rank).forall(i => start(i) >= outer.start(i) && stop(i) <= outer.stop(i))

  /** Step-1 intersection; throws if disjoint
    * (reference: slice.clj:104-126). */
  def intersect(that: Slice): Slice = {
    require(stepIsOne && that.stepIsOne && rank == that.rank,
      s"intersection requires equal-rank step-1 slices: $this $that")
    if (this == that) this
    else {
      val s = Vector.tabulate(rank)(i => math.max(start(i), that.start(i)))
      val e = Vector.tabulate(rank)(i => math.min(stop(i), that.stop(i)))
      if ((0 until rank).exists(i => e(i) - s(i) <= 0))
        throw new IllegalArgumentException(s"The slices do not intersect: $this $that")
      Slice(s, e, step)
    }
  }

  /** Intersection of THIS (possibly strided) slice with a STEP-1 box:
    * the sub-lattice of this slice's selected points that fall inside
    * the box, i.e. start aligned UP to the stride lattice, stop clipped,
    * step preserved. Step-1 receivers degenerate to [[intersect]].
    * Throws if no lattice point lies in the box (mirrors [[intersect]]).
    *
    * This is the per-chunk clip of the strided READ path: the reference
    * deprecates whole-request strided reads (slice.clj:81-102) and keeps
    * its hot path step-1 (slice.clj:104-126); here a strided request
    * stays first-class by clipping the request lattice to each chunk box
    * and gathering (Slab.subset handles the strided view). */
  def intersectLattice(box: Slice): Slice =
    intersectLatticeOpt(box).getOrElse(throw new IllegalArgumentException(
      s"No lattice point of $this lies in $box"))

  /** [[intersectLattice]] that answers None instead of throwing when no
    * lattice point lies in the box — the chunk-skip test of the strided
    * read paths. */
  def intersectLatticeOpt(box: Slice): Option[Slice] = {
    require(box.stepIsOne && rank == box.rank,
      s"intersectLattice requires an equal-rank step-1 box: $this $box")
    val s = Vector.tabulate(rank) { i =>
      val lo = math.max(start(i), box.start(i))
      // smallest lattice point >= lo (lattice: start + k*step, k >= 0)
      start(i) + ((lo - start(i) + step(i) - 1) / step(i)) * step(i)
    }
    val e = Vector.tabulate(rank)(i => math.min(stop(i), box.stop(i)))
    if ((0 until rank).exists(i => e(i) - s(i) <= 0)) None
    else Some(Slice(s, e, step))
  }

  def intersects(that: Slice): Boolean =
    rank == that.rank &&
      (0 until rank).forall(i =>
        math.min(stop(i), that.stop(i)) - math.max(start(i), that.start(i)) > 0)

  /** Re-origin relative to `newOrigin` (reference: slice.clj:128-134). */
  def translate(newOrigin: Slice): Slice = {
    require(rank == newOrigin.rank)
    Slice(
      Vector.tabulate(rank)(i => start(i) - newOrigin.start(i)),
      Vector.tabulate(rank)(i => stop(i) - newOrigin.start(i)),
      step)
  }

  /** Row-major (last-dim-fastest) iteration of all selected coordinates
    * (reference: slice.clj:136-142). Rank 0 yields one empty coordinate. */
  def iter: Iterator[Array[Long]] = {
    val sh = if (rank == 0) Array.empty[Int] else shape.toArray
    val n = volume
    new Iterator[Array[Long]] {
      private var idx = 0L
      def hasNext: Boolean = idx < n
      def next(): Array[Long] = {
        val c = new Array[Long](rank)
        var rem = idx
        var i = rank - 1
        while (i >= 0) {
          val k = rem % sh(i)
          c(i) = start(i) + k * step(i)
          rem /= sh(i)
          i -= 1
        }
        idx += 1
        c
      }
    }
  }
}

object Slice {
  /** Constructor with the reference's defaults: stop = start+1, step = 1
    * (reference: slice.clj:8-32). */
  def apply(start: Seq[Long]): Slice =
    Slice(start.toVector, start.map(_ + 1).toVector, Vector.fill(start.size)(1L))
  def apply(start: Seq[Long], stop: Seq[Long]): Slice =
    Slice(start.toVector, stop.toVector, Vector.fill(start.size)(1L))
  def of(start: Long*): Slice = apply(start)
  def box(start: Seq[Long], stop: Seq[Long]): Slice = apply(start, stop)
}
