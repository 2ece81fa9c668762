package graft.streaming

import graft.spark.SparkStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained coarsened MATERIALIZED VIEW of an array
  * variable: `dst` holds the block-pooled (sum, count) rollup of `src`,
  * and `maintain` advances it by exactly the versions committed since the
  * last run — the array-store analog of incremental view maintenance.
  *
  * Why it composes for free: the graft streaming source already delivers
  * version deltas as RESOLVED chunk-granular cell batches (changed chunks
  * at their end-of-range state), and when every pooling factor divides its
  * axis's chunk extent, a changed chunk covers only WHOLE rollup blocks —
  * so re-aggregating just the delta batch yields complete, correct values
  * for every affected block, and writing them as an ordinary overlay
  * version updates the view without touching unaffected blocks. The
  * checkpoint carries the resume offset, so a view can lag arbitrarily
  * and catch up in one `availableNow` pass.
  *
  * At 100 TB: maintenance cost is O(changed chunks), not O(view) — the
  * full-recompute alternative re-reads the entire variable per refresh.
  * Each refresh commits one version per view variable (`sum`, `cnt`),
  * giving the view its own MVCC history (time travel over past states of
  * the rollup works like any other variable).
  */
object Rollup {

  /** Advance (creating if absent) the rollup view. Blocks until all
    * currently-committed src versions are folded in. */
  def maintain(spark: SparkSession, root: String,
      srcDataset: String, srcVar: String, dstDataset: String,
      factors: Map[String, Long], checkpoint: String): Unit = {
    val store = new SparkStore(spark, root)
    val vs = store.versions(srcDataset)
    require(vs.nonEmpty, s"dataset $srcDataset has no committed versions")
    val meta = store.metadata(srcDataset, vs.head._2)
    val dims = meta.variables(srcVar).shape
    require(dims.nonEmpty, "rollup needs at least one dimension")
    dims.foreach { d =>
      val f = factors.getOrElse(d, 1L)
      require(f >= 1L, s"factor for '$d' must be >= 1, got $f")
      require(meta.chunkDimensions(d) % f == 0L,
        s"factor $f must divide the chunk extent ${meta.chunkDimensions(d)} " +
          s"of '$d' — otherwise a changed chunk straddles rollup blocks " +
          "and the delta batch alone could not rebuild them")
    }
    // the view's full definition (BOTH variables) goes into the first
    // write's `metadata` — the bare DSv2 write path creates a dataset
    // whole, it does not evolve variables in
    val dstMeta = graft.meta.DatasetMeta(
      dimensions = dims.map { d =>
        val f = factors.getOrElse(d, 1L)
        d -> (meta.dimensions(d) + f - 1) / f
      }.toMap,
      chunkDimensions = dims.map { d =>
        val f = factors.getOrElse(d, 1L)
        d -> math.max(1L, meta.chunkDimensions(d) / f)
      }.toMap,
      variables = Map(
        "sum" -> graft.meta.VariableDef("long", dims, 0.0),
        "cnt" -> graft.meta.VariableDef("long", dims, 0.0))).toJson
    val q = FileFeed.withLocalCheckpoints(spark, checkpoint) {
      spark.readStream.format("graft")
      .option("root", root).option("dataset", srcDataset)
      .option("variable", srcVar).load()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val blockCols = dims.map(d =>
            expr(s"$d div ${factors.getOrElse(d, 1L)}").as(d))
          val rolled = batch.groupBy(blockCols: _*)
            .agg(sum("value").as("sum"), count(lit(1)).as("cnt"))
            .persist()
          try {
            // one overlay version per view variable (the DSv2 write is
            // per-variable); create-if-absent on both
            Seq("sum", "cnt").foreach { v =>
              rolled.select((dims.map(col) :+ col(v).as("value")): _*)
                .write.format("graft").option("root", root)
                .option("dataset", dstDataset).option("variable", v)
                .option("create", "true").option("metadata", dstMeta)
                .mode("append").save()
            }
          } finally { rolled.unpersist(); () }
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    }
    q.awaitTermination()
  }
}
