package graft.core

/** Chunk-grid coordinate math (reference: src/io/mandoline/chunk.clj:11-33).
  * The chunk grid of a variable is expressed — as in the reference — as a
  * Slice whose `step` holds the per-axis chunk extent and whose
  * `start`/`stop` hold the variable extent
  * (reference: src/io/mandoline/variable.clj:49-56).
  */
object ChunkGrid {

  /** All chunk-grid coordinates covered by `slice`
    * (reference: chunk.clj:11-25 — per-axis distinct floor(x/extent) over
    * the stepped range, cartesian product, row-major order). */
  def toChunkCoordinates(slice: Slice, grid: Slice): Vector[Vector[Long]] = {
    require(slice.rank == grid.rank)
    if (slice.rank == 0) return Vector(Vector.empty)
    val perAxis: Vector[Vector[Long]] = Vector.tabulate(slice.rank) { i =>
      val ext = grid.step(i)
      if (slice.step(i) == 1L) {
        val lo = Math.floorDiv(slice.start(i), ext)
        val hi = Math.floorDiv(slice.stop(i) - 1, ext)
        (lo to hi).toVector
      } else {
        // stepped range: walk it (rare path; reference does the same walk)
        (slice.start(i) until slice.stop(i) by slice.step(i))
          .map(Math.floorDiv(_, ext)).distinct.toVector
      }
    }
    cartesian(perAxis)
  }

  /** Chunk coordinate → its data-space slice. NOT cropped at the variable
    * edge — boundary chunks overhang and hold fill in the overhang
    * (reference: chunk.clj:27-33, variable.clj:58-74). */
  def fromChunkCoordinate(grid: Slice, coord: Seq[Long]): Slice = {
    require(coord.size == grid.rank)
    Slice(
      Vector.tabulate(grid.rank)(i => coord(i) * grid.step(i)),
      Vector.tabulate(grid.rank)(i => (coord(i) + 1) * grid.step(i)))
  }

  private def cartesian(axes: Vector[Vector[Long]]): Vector[Vector[Long]] =
    axes.foldLeft(Vector(Vector.empty[Long])) { (acc, axis) =>
      acc.flatMap(prefix => axis.map(prefix :+ _))
    }
}
