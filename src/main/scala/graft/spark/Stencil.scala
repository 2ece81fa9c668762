package graft.spark

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Moving-window (stencil) aggregates along one axis of a dense array —
  * rolling sums/means, smoothing kernels, finite differences. The
  * distributed-array problem here is the CHUNK BOUNDARY: a window of
  * radius `r` centered near the edge of a chunk needs up to `r` cells
  * from the neighboring chunk, which lives in a different scan partition.
  *
  * This is solved with the classic HALO EXCHANGE: every cell within `r`
  * of a chunk face is duplicated to the neighboring chunk's group (only
  * the halo bands replicate — a fraction 2r/chunkExtent of the data), and
  * the window then runs entirely inside each (other-coords, chunk) group:
  * one shuffle keyed by the target chunk, local sort, sliding frame.
  * Rows are emitted only for centers the group OWNS (halo rows exist to
  * complete their neighbors' windows, never as centers), so every output
  * cell is produced exactly once with its full window. Windows are
  * clipped at the variable bounds (fewer cells near the edges — `n_win`
  * reports the actual window population, so the caller can compute means
  * or renormalize kernels).
  *
  * At 100 TB: shuffle volume = data + halo (bounded by the 2r/chunkExtent
  * fraction), parallelism = (other-coords × chunks) groups, and no group
  * ever exceeds chunkExtent + 2r cells — there is no global sort and no
  * skew, regardless of array shape. Requires r < chunkExtent (halo from
  * the ADJACENT chunk only), which holds for any sane smoothing radius.
  */
object Stencil {

  /** Rolling sum/count along `axis` with symmetric radius `radius`:
    * output (dims…, v_sum, n_win) where v_sum sums `value` over
    * [d−r, d+r] ∩ bounds along the axis (other coordinates fixed). */
  def rollingAxis(spark: SparkSession, root: String, dataset: String,
      variable: String, version: Option[Long] = None,
      axis: String, radius: Int): DataFrame = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    val store = new SparkStore(spark, root)
    val vid = version.getOrElse {
      val vs = store.versions(dataset)
      require(vs.nonEmpty, s"dataset $dataset has no committed versions")
      vs.head._2
    }
    val meta = store.metadata(dataset, vid)
    val dims = meta.variables(variable).shape
    require(dims.contains(axis), s"variable $variable has no axis '$axis'")
    val ext = meta.chunkDimensions(axis)
    require(radius < ext,
      s"radius $radius must be < the chunk extent $ext of '$axis' " +
        "(halo exchange reaches only the adjacent chunk)")
    val nChunks = (meta.dimensions(axis) + ext - 1) / ext
    val df = spark.read.format("graft")
      .option("root", root).option("dataset", dataset)
      .option("variable", variable).option("version", vid.toString)
      .option("chunked", "true").load()
    // each cell's target groups: its own chunk, plus the left/right
    // neighbor when the cell sits in that neighbor's halo band
    val c = col(s"_chunk_$axis")
    val pos = col(axis) - c * ext
    val targets = array_compact(array(
      c,
      when(pos < radius && c > 0, c - 1),
      when(pos >= ext - radius && c < nChunks - 1, c + 1)))
    val others = dims.filterNot(_ == axis)
    val tagged = df.select(
      (dims.map(col) :+ col("value") :+ c.as("own") :+
        explode(targets).as("tc")): _*)
    val w = Window
      .partitionBy((others.map(col) :+ col("tc")): _*)
      .orderBy(col(axis))
      .rangeBetween(-radius.toLong, radius.toLong)
    tagged
      .withColumn("v_sum", sum("value").over(w))
      .withColumn("n_win", count(lit(1)).over(w))
      .filter(col("own") === col("tc"))
      .select((dims.map(col) :+ col("v_sum") :+ col("n_win")): _*)
  }

  private final case class Cell2(x1: Long, x2: Long, v: Long, own: Boolean)

  /** 2-D neighborhood stencil over an integer-typed 2-D variable: for
    * every cell, the sum and population of the (2r+1)×(2r+1) box around
    * it, clipped at the array bounds. Output (dim1, dim2, v_sum, n_win).
    *
    * The halo exchange generalizes [[rollingAxis]] to both axes: each
    * cell duplicates into the neighboring chunk's group per axis
    * independently, so the two explodes' cross product covers face AND
    * corner neighbors (≤ 9 targets at r < extent, but only halo-band
    * cells replicate — a ~2r/extent fraction per axis). Each
    * (chunk₁, chunk₂) group then holds its own cells plus a full halo
    * ring and computes every owned cell's box locally from a hash map —
    * one shuffle, group size ≤ (ext₁+2r)·(ext₂+2r), no global sort, and
    * SQL windows (which are 1-D) are never bent around a 2-D frame.
    *
    * A declarative alternative — union (2r+1)² shifted copies and
    * groupBy(cell) — stays in whole-stage codegen but shuffles (2r+1)²×
    * the data; the halo form shuffles ~1× and is the 100 TB answer. */
  def boxSum2d(spark: SparkSession, root: String, dataset: String,
      variable: String, version: Option[Long] = None,
      radius: Int): DataFrame = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    val store = new SparkStore(spark, root)
    val vid = version.getOrElse {
      val vs = store.versions(dataset)
      require(vs.nonEmpty, s"dataset $dataset has no committed versions")
      vs.head._2
    }
    val meta = store.metadata(dataset, vid)
    val dims = meta.variables(variable).shape
    require(dims.length == 2,
      s"boxSum2d needs a 2-D variable; $variable has shape $dims")
    val Vector(a1, a2) = dims
    val (ext1, ext2) = (meta.chunkDimensions(a1), meta.chunkDimensions(a2))
    require(radius < ext1 && radius < ext2,
      s"radius $radius must be < both chunk extents ($ext1, $ext2)")
    val n1 = (meta.dimensions(a1) + ext1 - 1) / ext1
    val n2 = (meta.dimensions(a2) + ext2 - 1) / ext2
    val df = spark.read.format("graft")
      .option("root", root).option("dataset", dataset)
      .option("variable", variable).option("version", vid.toString)
      .option("chunked", "true").load()
    val (c1, c2) = (col(s"_chunk_$a1"), col(s"_chunk_$a2"))
    val pos1 = col(a1) - c1 * ext1
    val pos2 = col(a2) - c2 * ext2
    val t1 = array_compact(array(c1,
      when(pos1 < radius && c1 > 0, c1 - 1),
      when(pos1 >= ext1 - radius && c1 < n1 - 1, c1 + 1)))
    val t2 = array_compact(array(c2,
      when(pos2 < radius && c2 > 0, c2 - 1),
      when(pos2 >= ext2 - radius && c2 < n2 - 1, c2 + 1)))
    import spark.implicits._
    val tagged = df
      .select(col(a1), col(a2), col("value").cast("long").as("v"),
        c1.as("own1"), c2.as("own2"), explode(t1).as("tc1"), t2.as("t2s"))
      .select(col(a1), col(a2), col("v"), col("own1"), col("own2"),
        col("tc1"), explode(col("t2s")).as("tc2"))
    val r = radius
    tagged
      .select(col("tc1"), col("tc2"), col(a1).as("x1"), col(a2).as("x2"),
        col("v"), (col("own1") === col("tc1") && col("own2") === col("tc2")).as("own"))
      .groupByKey(row => (row.getLong(0), row.getLong(1)))
      .flatMapGroups { (_: (Long, Long), it: Iterator[org.apache.spark.sql.Row]) =>
        val cells = it.map(row =>
          Cell2(row.getLong(2), row.getLong(3), row.getLong(4),
            row.getBoolean(5))).toArray
        val m = new scala.collection.mutable.HashMap[(Long, Long), Long]
        cells.foreach(c => m((c.x1, c.x2)) = c.v)
        cells.iterator.filter(_.own).map { c =>
          var s = 0L; var n = 0L
          var d1 = -r
          while (d1 <= r) {
            var d2 = -r
            while (d2 <= r) {
              m.get((c.x1 + d1, c.x2 + d2)).foreach { v => s += v; n += 1 }
              d2 += 1
            }
            d1 += 1
          }
          (c.x1, c.x2, s, n)
        }
      }
      .toDF(a1, a2, "v_sum", "n_win")
  }
}
