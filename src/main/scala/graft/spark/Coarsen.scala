package graft.spark

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Block pooling (downsampling) of a dense array variable: every
  * `factors(d)`-sized block along each axis reduces to one output cell
  * carrying sum/count/min/max (mean = sum/count, left to the caller so
  * everything stays integer-exact for integer dtypes). The array-engine
  * analog of xarray's `coarsen` — hourly → 8-hourly rollups, image
  * pyramids, climate re-gridding.
  *
  * Scale shape: the read is the `chunked=true` DSv2 scan, whose reported
  * KeyGroupedPartitioning keys every input partition by its chunk
  * coordinate. When every factor divides its axis's chunk extent, each
  * pooled block lies ENTIRELY inside one chunk, so grouping by
  * (`_chunk_*`, block) is satisfied by the scan's own partitioning and the
  * whole rollup runs WITHOUT ANY EXCHANGE (CoarsenSpec pins the plan) —
  * at 100 TB the aggregation is embarrassingly parallel over chunks.
  * Misaligned factors fall back to a two-stage aggregate: the same
  * shuffle-free per-chunk partial first, then a final combine keyed by the
  * block alone — the exchange moves only pooled partials (≤ one row per
  * (chunk, straddling block)), never cells.
  */
object Coarsen {

  def coarsen(spark: SparkSession, root: String, dataset: String,
      variable: String, version: Option[Long] = None,
      factors: Map[String, Long]): DataFrame = {
    val store = new SparkStore(spark, root)
    val vid = version.getOrElse {
      val vs = store.versions(dataset)
      require(vs.nonEmpty, s"dataset $dataset has no committed versions")
      vs.head._2
    }
    val meta = store.metadata(dataset, vid)
    val dims = meta.variables(variable).shape
    require(dims.nonEmpty, "coarsen needs at least one dimension")
    dims.foreach { d =>
      val f = factors.getOrElse(d, 1L)
      require(f >= 1L, s"coarsen factor for '$d' must be >= 1, got $f")
    }
    val aligned = dims.forall { d =>
      meta.chunkDimensions(d) % factors.getOrElse(d, 1L) == 0L
    }
    val df = spark.read.format("graft")
      .option("root", root).option("dataset", dataset)
      .option("variable", variable).option("version", vid.toString)
      .option("chunked", "true").load()
    def block(d: String): Column =
      expr(s"$d div ${factors.getOrElse(d, 1L)}").as(s"${d}_c")
    val blockCols = dims.map(block)
    val aggs = Seq(sum("value").as("v_sum"), count(lit(1)).as("n_cells"),
      min("value").as("v_min"), max("value").as("v_max"))
    if (aligned) {
      // one shuffle-free aggregate: (chunk, block) ≡ block when factors
      // divide the chunk extents, so each group closes inside its chunk
      val keys = dims.map(d => col(s"_chunk_$d")) ++ blockCols
      df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
        .select(dims.map(d => col(s"${d}_c")) ++
          Seq(col("v_sum"), col("n_cells"), col("v_min"), col("v_max")): _*)
    } else {
      // straddling blocks: per-chunk partials (still exchange-free), then
      // a final combine over the pooled partials only
      val keys = dims.map(d => col(s"_chunk_$d")) ++ blockCols
      df.groupBy(keys: _*)
        .agg(sum("value").as("p_sum"), count(lit(1)).as("p_cnt"),
          min("value").as("p_min"), max("value").as("p_max"))
        .groupBy(dims.map(d => col(s"${d}_c")): _*)
        .agg(sum("p_sum").as("v_sum"), sum("p_cnt").as("n_cells"),
          min("p_min").as("v_min"), max("p_max").as("v_max"))
    }
  }
}
