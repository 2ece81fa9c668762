package graft.streaming

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

  /** Sink: every micro-batch DELTA becomes one committed version of
    * variable `n` (long, fill −1) of `dsName`. `h0` re-origins absolute
    * epoch-hours to array coordinates; `hours` is the variable extent.
    *
    * Update mode + watermark: each batch carries only the windows whose
    * aggregate changed; those cells are encoded as single-cell slab rows
    * ON THE EXECUTORS and routed through the distributed `writeRows`
    * plan — no driver-side collect anywhere, so an arbitrarily large
    * micro-batch ingests at write-path scale. The MVCC resolve overlays
    * versions per coordinate, so latest-readers see the cumulative state
    * and `onVersion`/`onTimestamp` time-travel through stream progress. */
  def versionedSink(store: SparkStore, dsName: String, h0: Long, hours: Long)(
      counts: DataFrame): StreamingQuery = {
    if (!store.datasetExists(dsName)) {
      store.create(dsName)
    }
    val meta = DatasetMeta(
      dimensions = Map("h" -> hours),
      chunkDimensions = Map("h" -> 64L),
      variables = Map("n" -> VariableDef("long", Vector("h"), -1.0)))
    // No explicit checkpoint location: Spark manages one under
    // spark.sql.streaming.checkpointLocation when the session sets it,
    // else under the local tmp dir. Route the NIO manager decision
    // through the root that will ACTUALLY be used — a session pointing
    // checkpoints at an object store must keep the default manager
    // (withLocalCheckpoints only switches for file: roots).
    val ckptRoot = counts.sparkSession.conf
      .getOption("spark.sql.streaming.checkpointLocation")
      .getOrElse(System.getProperty("java.io.tmpdir", "/tmp"))
    FileFeed.withLocalCheckpoints(counts.sparkSession, ckptRoot) {
    counts.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import batch.sparkSession.implicits._
        val slabRows = batch
          .select((col("ah") - h0).as("h"), col("cnt"))
          .filter(col("h") >= 0 && col("h") < hours)
          .as[(Long, Long)]
          .mapPartitions { it =>
            it.map { case (h, cnt) =>
              // one cell per changed window: big-endian long payload
              // (DType.LONG wire format), disjoint cells → seq 0 for all
              val b = java.nio.ByteBuffer.allocate(8)
              b.putLong(cnt)
              (Array(h), Array(h + 1), b.array(), 0L)
            }
          }
          .toDF("start", "stop", "bytes", "seq")
          .persist()
        try {
          if (slabRows.limit(1).count() > 0) {
            val w = store.addVersion(dsName, meta)
            w.writeRows("n", slabRows)
            w.finishVersion()
            ()
          }
        } finally slabRows.unpersist()
        ()
      }
      .start()
    }
  }

  /** PRODUCTION twin of the MemoryStream-replayed versioned ingest: the
    * hourly-count stream reads a real FILE landing zone
    * ([[FileFeed.sliced]], `nBatches` time-ordered slices, one file per
    * micro-batch) and every real micro-batch's delta commits one version
    * through [[versionedSink]] — the gate where streaming exactly-once
    * meets the store's own commit protocol, exercised on the path a
    * deployment runs instead of a driver-fed replay. Returns the number
    * of committed versions; callers assert it equals `nBatches` (each
    * event-time slice is non-empty, so each real micro-batch must land
    * exactly one version — no-data micro-batches carry no changed
    * windows and must not commit). */
  def hourlyVersionedStreamFile(eventsWithTsS: DataFrame, store: SparkStore,
      dsName: String, h0: Long, hours: Long, nBatches: Int,
      workDir: String): Int = {
    val feed = FileFeed.sliced(
      eventsWithTsS.select(col("ts_s").cast("long")), "ts_s",
      nBatches, workDir)
    // generous watermark: a bounded gate feed must never drop state
    // mid-run (the twin shares the batch oracle exactly)
    val q = versionedSink(store, dsName, h0, hours)(
      hourlyCounts(feed.select(col("ts_s").cast("timestamp").as("ts")),
        watermark = "9600 hours"))
    try q.processAllAvailable() finally q.stop()
    try org.apache.spark.sql.graft.StateStoreHygiene.unloadAll()
    catch { case _: Throwable => () }
    store.versions(dsName).size
  }
}
