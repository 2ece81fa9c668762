package graft.streaming

import graft.core.{DType, Slab, Slice}
import graft.meta.{DatasetMeta, VariableDef}
import graft.spark.SparkStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming ingest into the versioned array store.
  *
  * The reference has no stream processor (SURVEY §2.6) — its closest
  * semantic is versioned append + timestamp time travel. This extension
  * makes that explicit: each micro-batch of a streaming aggregation is
  * committed as a NEW IMMUTABLE VERSION of an array variable, so
  * `onTimestamp(t)` time-travels through stream progress, and late data
  * (handled by the watermark upstream) simply lands in a later version.
  *
  * Scale shape: the aggregation runs distributed with watermarked state;
  * only the per-batch delta of dense cells crosses to the versioned
  * writer (one shuffle per batch, reference write-path semantics
  * unchanged).
  */
object StreamingIngest {

  /** Watermarked per-hour event counts from a streaming events frame
    * (columns: ts timestamp, …). */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        (unix_timestamp(col("w.start")) / 3600L).cast("long").as("ah"),
        col("cnt"))

  /** Sink: every micro-batch snapshot becomes one committed version of
    * variable `n` (long, fill −1) of `dsName`. `h0` re-origins absolute
    * epoch-hours to array coordinates; `hours` is the variable extent. */
  def versionedSink(store: SparkStore, dsName: String, h0: Long, hours: Long)(
      counts: DataFrame): StreamingQuery = {
    if (!store.datasetExists(dsName)) {
      store.create(dsName)
    }
    val meta = DatasetMeta(
      dimensions = Map("h" -> hours),
      chunkDimensions = Map("h" -> 64L),
      variables = Map("n" -> VariableDef("long", Vector("h"), -1.0)))
    counts.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cells = batch.collect().map(r => (r.getLong(0) - h0, r.getLong(1)))
          .filter { case (h, _) => h >= 0 && h < hours }
        if (cells.nonEmpty) {
          val lo = cells.map(_._1).min
          val hi = cells.map(_._1).max + 1
          val dense = Array.fill[Double]((hi - lo).toInt)(0.0)
          cells.foreach { case (h, c) => dense((h - lo).toInt) = c.toDouble }
          val w = store.addVersion(dsName, meta)
          w.write("n", Seq(Slab.fromDoubles(DType.LONG,
            Slice(Seq(lo), Seq(hi)), dense.toIndexedSeq)))
          w.finishVersion()
        }
        ()
      }
      .start()
  }
}
