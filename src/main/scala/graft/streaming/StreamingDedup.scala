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

  final case class SDoc(ts: java.sql.Timestamp, text: String)

  /** Deterministic micro-batch replay of `byFingerprint` for the oracle
    * gate: documents arrive in doc_id order with synthetic event times
    * doc_id seconds apart, the horizon covers the whole corpus spread, so
    * within-watermark dedup must equal GLOBAL exact dedup — exactly one
    * surviving row per distinct fingerprint (which row survives is the
    * state store's pick, so the gate pins the fp SET, not the doc ids). */
  def byFingerprintReplay(docs: DataFrame, nBatches: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val rows = docs.select("doc_id", "text").collect()
      .sortBy(_.getLong(0))
      // +1 day offset: a ts of exactly epoch 0 equals the state store's
      // INITIAL watermark and is discarded as late before first-seen
      // emission (observed: doc_id 0 silently vanished from the output)
      .map(r => SDoc(new java.sql.Timestamp((r.getLong(0) + 86400L) * 1000L),
        r.getString(1)))
    import spark.implicits._
    val horizon = s"${rows.length + 86400} seconds"
    val out = Replay.run(spark, rows.toIndexedSeq, nBatches) { ds =>
      byFingerprint(ds.toDF(), horizon)
    }
    out.select(col("fp")).orderBy("fp")
  }
}
