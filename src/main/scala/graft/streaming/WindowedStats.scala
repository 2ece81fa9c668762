package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked event-time window aggregation for continuous ingest
  * monitoring: per-window, per-key counts and byte totals over a document
  * (or event) stream — the canonical Structured Streaming shape
  * (readStream → withWatermark → groupBy(window, key) → agg).
  *
  * Scale design: state is one row per open (window, key); the watermark
  * CLOSES windows once event time passes `horizon` beyond their end, so
  * the state store holds O(active windows × keys), never stream-lifetime
  * history. Append output mode emits each window exactly once, when it
  * closes — the right contract for downstream sinks that must not see
  * partial aggregates (e.g. `StreamingIngest.versionedSink` committing a
  * stats variable per window). Late rows beyond the horizon are dropped
  * by construction, making replays and out-of-order firehose arrivals
  * safe. */
object WindowedStats {

  /** `docs` must be a streaming frame with (ts: timestamp, lang: string,
    * text: string); returns one row per closed (window, lang):
    * (window_start, window_end, lang, n_docs, n_chars). */
  def perWindow(docs: DataFrame, windowLength: String = "1 minute",
      horizon: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", horizon)
      .groupBy(window(col("ts"), windowLength), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("n_chars"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("lang"), col("n_docs"), col("n_chars"))
}
