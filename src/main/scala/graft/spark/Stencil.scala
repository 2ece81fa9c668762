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
}
