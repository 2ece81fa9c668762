package graft.core

/** An n-D array paired with its coordinates: the unit of reads and writes
  * (reference: src/io/mandoline/slab.clj:10-12).
  *
  * Data is a flat row-major **big-endian** byte buffer — the exact
  * serialization `ucar.ma2.Array.getDataAsByteBuffer` produces, so chunk
  * SHA-1s (reference: src/io/mandoline/chunk.clj:35-45) hash these bytes
  * directly and all merge operations are type-agnostic byte-run copies.
  *
  * Hot-path slices (chunks, requests) are step-1, like the reference's
  * fast paths (slice.clj:104-126); strided (step>1) views are supported
  * by `subset` via a gather, pinned to the reference's
  * test/io/mandoline/slab_test.clj:25-52 semantics.
  */
final case class Slab(dtype: DType, slice: Slice, bytes: Array[Byte]) {
  def shape: Vector[Int] = if (slice.rank == 0) Vector.empty else slice.shape
  def volume: Long = slice.volume

  // cached per-slab (offsetOf runs once per cell in the exploded hot loop)
  @transient private lazy val shapeArr: Array[Int] =
    if (slice.rank == 0) Array.empty else slice.shape.toArray
  @transient private lazy val startArr: Array[Long] = slice.start.toArray
  @transient private lazy val stepArr: Array[Long] = slice.step.toArray

  /** Byte offset of a global coordinate inside this slab's buffer
    * (strided slabs index their lattice: (coord − start) / step). */
  def offsetOf(coord: Seq[Long]): Int = {
    var lin = 0L
    val sh = shapeArr
    val st = startArr
    val sp = stepArr
    var i = 0
    while (i < sh.length) {
      lin = lin * sh(i) + (coord(i) - st(i)) / sp(i)
      i += 1
    }
    (lin * dtype.size).toInt
  }

  def valueAt(coord: Seq[Long]): Double = dtype.get(bytes, offsetOf(coord))

  /** Copy of the region `view` (must be contained in this slab's slice).
    * Step-1 views of step-1 slabs copy contiguous runs; strided views
    * gather cell-by-cell. A strided view of a strided slab requires EQUAL
    * steps, like the reference (slab_test.clj:49-52 pins the mismatch
    * error); off-lattice coordinates are rejected.
    * (reference: slab.clj:70-84 `subset`). */
  def subset(view: Slice): Slab = {
    require(view.isContainedIn(slice),
      s"subset slice $view is not contained in slab slice $slice")
    if (view == slice) this
    else if (view.stepIsOne && slice.stepIsOne) {
      val out = Slab.empty(dtype, view)
      Slab.copyRegion(this, out, view)
      out
    } else {
      require(slice.stepIsOne || slice.step == view.step,
        s"subset: step sizes are different (slab ${slice.step}, view ${view.step})")
      val es = dtype.size
      val out = Slab.empty(dtype, view)
      var off = 0
      view.iter.foreach { c =>
        var i = 0
        while (i < c.length) {
          require((c(i) - slice.start(i)) % slice.step(i) == 0,
            s"subset: coordinate ${c.toSeq} off the slab's step lattice $slice")
          i += 1
        }
        System.arraycopy(bytes, offsetOf(c.toIndexedSeq), out.bytes, off, es)
        off += es
      }
      out
    }
  }

  /** `subset` after intersecting with an arbitrary overlapping slice;
    * identity when fully inside (reference: slab.clj:86-94). */
  def intersectWith(view: Slice): Slab =
    if (slice.isContainedIn(view)) this
    else subset(slice.intersect(view))

  /** Last-writer-wins overlay: clip `src` to this slab's slice and copy its
    * cells over this slab's buffer IN PLACE; returns this slab
    * (reference: slab.clj:115-121 `merge` + 96-113 `copy-into`).
    *
    * Strided slabs (the strided READ path's response/chunk-clip pairs)
    * merge by per-cell lattice gather: both sides must share the step
    * vector and sit on the same lattice — copyRegion's contiguous-run
    * copy is only valid at step 1. */
  def mergeFrom(src: Slab): Slab = {
    require(src.dtype == dtype, s"type mismatch: ${src.dtype} vs $dtype")
    val clipped = src.intersectWith(slice)
    if (clipped.slice.stepIsOne && slice.stepIsOne)
      Slab.copyRegion(clipped, this, clipped.slice)
    else {
      require(clipped.slice.step == slice.step,
        s"mergeFrom: step mismatch (${clipped.slice.step} vs ${slice.step})")
      var i = 0
      while (i < slice.rank) {
        require((clipped.slice.start(i) - slice.start(i)) % slice.step(i) == 0,
          s"mergeFrom: ${clipped.slice} is off this slab's lattice $slice")
        i += 1
      }
      val es = dtype.size
      clipped.slice.iter.foreach { c =>
        val co = c.toIndexedSeq
        System.arraycopy(clipped.bytes, clipped.offsetOf(co),
          bytes, offsetOf(co), es)
      }
    }
    this
  }

  def contentHash: String = Sha1.hex(bytes)

  /** Zone-map statistics over every cell of this slab — computed once at
    * ingest and stored beside the chunk's index row, so envelope-covered
    * aggregates and value-predicate chunk skipping never touch the blob.
    * Integral dtypes (byte/char/short/int/long) carry exact long min/max/
    * sum; float dtypes carry double min/max over non-NaN cells plus the
    * NaN count (Spark's aggregate ordering treats NaN as greatest, so
    * `max = if (nanCnt > 0) NaN else dmax`, and min over non-NaN matches
    * Spark's min whenever any non-NaN cell exists). IEEE `<`/`>` is used
    * for float comparisons, so a slab holding both zeros may report either
    * -0.0 or 0.0 as its min — callers that need bit-exactness must decode. */
  def stats: SlabStats = {
    val n = volume.toInt
    val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    dtype match {
      case DType.FLOAT | DType.DOUBLE =>
        var dmin = Double.PositiveInfinity
        var dmax = Double.NegativeInfinity
        var nan = 0L
        var some = false
        var i = 0
        while (i < n) {
          val v = if (dtype == DType.FLOAT) bb.getFloat(i * 4).toDouble else bb.getDouble(i * 8)
          if (java.lang.Double.isNaN(v)) nan += 1
          else {
            if (!some || v < dmin) dmin = v
            if (!some || v > dmax) dmax = v
            some = true
          }
          i += 1
        }
        SlabStats(n, None, None, None,
          if (some) Some(dmin) else None, if (some) Some(dmax) else None, nan)
      case _ =>
        // one megamorphic dispatch per slab, not per cell
        val read: Int => Long = dtype match {
          case DType.BYTE => i => bytes(i).toLong
          case DType.CHAR => i => (bb.getShort(i * 2) & 0xffff).toLong
          case DType.SHORT => i => bb.getShort(i * 2).toLong
          case DType.INT => i => bb.getInt(i * 4).toLong
          case _ => i => bb.getLong(i * 8)
        }
        var lmin = Long.MaxValue
        var lmax = Long.MinValue
        var lsum = 0L
        var overflow = false
        var i = 0
        while (i < n) {
          val v = read(i)
          if (v < lmin) lmin = v
          if (v > lmax) lmax = v
          if (!overflow) {
            try lsum = Math.addExact(lsum, v)
            catch { case _: ArithmeticException => overflow = true }
          }
          i += 1
        }
        if (n == 0) SlabStats(0, None, None, None, None, None, 0)
        else SlabStats(n, Some(lmin), Some(lmax),
          if (overflow) None else Some(lsum), None, None, 0)
    }
  }

  override def equals(o: Any): Boolean = o match {
    case s: Slab =>
      s.dtype == dtype && s.slice == slice &&
        java.util.Arrays.equals(s.bytes, bytes)
    case _ => false
  }
  override def hashCode: Int =
    31 * (31 * dtype.hashCode + slice.hashCode) + java.util.Arrays.hashCode(bytes)
}

/** Per-chunk zone-map row: cell count, exact integral min/max/sum (null
  * for float dtypes), float min/max over non-NaN cells (null for integral
  * dtypes or all-NaN slabs), and the NaN cell count. */
final case class SlabStats(cnt: Long,
    lmin: Option[Long], lmax: Option[Long], lsum: Option[Long],
    dmin: Option[Double], dmax: Option[Double], nan: Long)

object Slab {
  /** Fill-initialized slab (reference: slab.clj:47-68). */
  def empty(dtype: DType, slice: Slice, fill: Double): Slab = {
    val n = slice.volume
    require(n * dtype.size <= Int.MaxValue, s"slab too large: $slice")
    val bytes = new Array[Byte]((n * dtype.size).toInt)
    if (fill != 0.0 || java.lang.Double.doubleToRawLongBits(fill) != 0L) {
      // write one cell then replicate the pattern (fast fill)
      dtype.put(bytes, 0, fill)
      var filled = dtype.size
      val total = bytes.length
      while (filled < total) {
        val chunk = math.min(filled, total - filled)
        System.arraycopy(bytes, 0, bytes, filled, chunk)
        filled += chunk
      }
    }
    Slab(dtype, slice, bytes)
  }

  /** Zero-initialized slab. */
  def empty(dtype: DType, slice: Slice): Slab = {
    val n = slice.volume
    require(n * dtype.size <= Int.MaxValue, s"slab too large: $slice")
    Slab(dtype, slice, new Array[Byte]((n * dtype.size).toInt))
  }

  /** Build a slab from doubles in row-major order (test/helper path). */
  def fromDoubles(dtype: DType, slice: Slice, values: Seq[Double]): Slab = {
    require(values.size == slice.volume, s"${values.size} values for $slice")
    val s = empty(dtype, slice)
    var i = 0
    values.foreach { v => dtype.put(s.bytes, i * dtype.size, v); i += 1 }
    s
  }

  /** Element-wise diff-fold for the commit-time torn-write repair: every
    * element where `row` differs from `base` is copied into `state`
    * (mutated in place). All three buffers are full-chunk decoded
    * buffers of equal length. Comparing per ELEMENT (not per byte) keeps
    * a cell atomic — a byte-granular fold could stitch half of one
    * writer's value to half of another's. An element written with a
    * value equal to its base is a no-op by definition, so missing it is
    * harmless. */
  def applyDiff(dtype: DType, base: Array[Byte], row: Array[Byte],
      state: Array[Byte]): Unit = {
    require(base.length == row.length && row.length == state.length,
      s"applyDiff: buffer lengths differ (${base.length}/${row.length}/${state.length})")
    val w = dtype.size
    var off = 0
    while (off < row.length) {
      var i = 0
      var same = true
      while (same && i < w) {
        if (row(off + i) != base(off + i)) same = false
        i += 1
      }
      if (!same) System.arraycopy(row, off, state, off, w)
      off += w
    }
  }

  /** Copy the cells of region `region` (must be inside both slabs' slices)
    * from `src` to `dst`. Contiguous runs along the last axis are copied
    * with System.arraycopy. */
  private[core] def copyRegion(src: Slab, dst: Slab, region: Slice): Unit = {
    val rank = region.rank
    val es = src.dtype.size
    if (rank == 0) {
      System.arraycopy(src.bytes, src.offsetOf(Nil), dst.bytes, dst.offsetOf(Nil), es)
      return
    }
    val rShape = region.shape
    val runLen = rShape(rank - 1)
    val runBytes = runLen * es
    // iterate over all outer coordinates (all axes but the last)
    val outer = new Array[Long](rank)
    var i = 0
    while (i < rank) { outer(i) = region.start(i); i += 1 }
    val nOuter = rShape.take(rank - 1).foldLeft(1L)(_ * _.toLong)
    var it = 0L
    while (it < nOuter) {
      val so = src.offsetOf(outer.toIndexedSeq)
      val dof = dst.offsetOf(outer.toIndexedSeq)
      System.arraycopy(src.bytes, so, dst.bytes, dof, runBytes)
      // increment outer coordinate (last-but-one axis fastest)
      var ax = rank - 2
      var carry = true
      while (ax >= 0 && carry) {
        outer(ax) += 1
        if (outer(ax) >= region.stop(ax)) { outer(ax) = region.start(ax); ax -= 1 }
        else carry = false
      }
      it += 1
    }
  }
}
