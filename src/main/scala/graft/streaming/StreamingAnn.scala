package graft.streaming

import graft.pipeline.Similarity
import org.apache.spark.sql.DataFrame

/** Streaming ANN index maintenance: a `foreachBatch` sink that keeps a
  * persistent IVF index (built once with `Similarity.ivfBuild`) current
  * as new vectors arrive — each micro-batch is assigned to the frozen
  * coarse centroids and committed as a fresh index generation, so the
  * serving path (`ivfQueryVectors`) always answers over everything
  * ingested so far WITHOUT ever re-scanning the base corpus.
  *
  * Exactly-once under Structured Streaming's at-least-once foreachBatch
  * contract: the committed batchId rides the index's atomic meta swap
  * (`Similarity.ivfAppendBatch`), so a re-delivered batch after a sink
  * failure is detected and skipped — no duplicate inverted-list rows.
  * The corpus fingerprint stays incrementally exact across appends
  * (order-free XOR composition), so a batch consumer of the full corpus
  * still attests the index with `ivfQuery`'s staleness check.
  *
  * Recall note: centroids are FROZEN at build time (the standard IVF
  * append tradeoff) — schedule a periodic `ivfBuild` rebuild when the
  * appended fraction grows large enough for the vector distribution to
  * drift. */
object StreamingAnn {

  /** foreachBatch function maintaining the index at `path`. The stream
    * must carry (vec_id, embedding) with corpus-unique vec_ids.
    *
    * {{{
    * vectors.writeStream
    *   .foreachBatch(StreamingAnn.indexSink(path))
    *   .option("checkpointLocation", ckpt)
    *   .start()
    * }}}
    */
  def indexSink(path: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      if (!batch.isEmpty) { Similarity.ivfAppendBatch(batch, path, batchId); () }
    }
}
