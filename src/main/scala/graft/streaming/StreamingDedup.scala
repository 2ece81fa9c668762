package graft.streaming

import graft.pipeline.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for continuous training-data ingest:
  * drop any document whose normalized-content fingerprint was already
  * seen, with state BOUNDED by an event-time watermark.
  *
  * `dropDuplicatesWithinWatermark` keys state by fingerprint and evicts
  * entries once the watermark passes them — so a 100 TB/day firehose
  * holds state proportional to the dedup horizon, not the stream's
  * lifetime (an unbounded `dropDuplicates` would OOM the state store).
  * Exactly-once dedup across the whole corpus belongs to the batch
  * operators (Dedup.*); this is the ingest-time guard that keeps
  * retries, replays, and near-in-time duplicates out of the pipeline. */
object StreamingDedup {

  /** `docs` must be a streaming frame with (ts: timestamp, text: string)
    * columns; returns the deduplicated stream with an `fp` column. */
  def byFingerprint(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fp")
}
