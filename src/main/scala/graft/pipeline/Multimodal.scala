package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns next to a typed metadata struct; decode / feature-extract /
  * frame-sample run as typed mapPartitions stages (one decoder
  * instantiation per partition — the batch shape a real codec needs).
  *
  * The decode step itself is STUBBED with a deterministic fake (this
  * container ships no image/audio codecs); the Spark-side contract —
  * schema, binary transport, partition-wise batching, typed output — is
  * real and tested.
  */
object Multimodal {

  /** Typed media row: payload + extracted metadata. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, n_frames: Long)

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Stub decoder: a real implementation would parse the container header
    * (JPEG/PNG/WAV/MP4). The fake derives deterministic dimensions from
    * the payload length so oracles can check the plumbing end to end. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): (Long, Long, Long) // (width, height, nFrames)
  }
  object StubDecoder extends MediaDecoder {
    def decode(p: Array[Byte]): (Long, Long, Long) = {
      val n = p.length.toLong
      (n % 640L, (n * 7L) % 480L, n % 10L + 1L)
    }
  }

  /** Binary-transport + partition-batched metadata extraction. */
  def extractMeta(docs: DataFrame, decoder: MediaDecoder = StubDecoder): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder state initialized once per partition (real codecs are
        // expensive to construct; this is the batch shape that matters)
        val d = decoder
        it.map { case (id, payload) =>
          val (w, h, f) = d.decode(payload)
          MediaMeta(id, payload.length.toLong, w, h, f)
        }
      }
  }

  /** Deterministic frame sampling: every `stride`-th frame index. */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Long): DataFrame =
    meta.toDF()
      .select(col("doc_id"), explode(sequence(lit(0L), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Aspect-fit resize plan to a `box`×`box` target: output dimensions per
    * media row, integer-exact (`div`, never float scale factors — the same
    * arithmetic is replicated in the DuckDB oracle). A real pipeline hands
    * these to the decoder's scaler; the plan itself is pure codegen
    * columns. */
  def resizePlan(meta: Dataset[MediaMeta], box: Long = 224L): DataFrame =
    meta.toDF()
      .withColumn("out_w", expr(s"(width * ${box}L) div greatest(greatest(width, height), 1L)"))
      .withColumn("out_h", expr(s"(height * ${box}L) div greatest(greatest(width, height), 1L)"))
      // every stride-3 sampled frame count, without materializing the frames
      .withColumn("n_sampled", expr("(n_frames + 2L) div 3L"))
}
