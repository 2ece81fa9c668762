package graft

import graft.pipeline.Similarity
import graft.streaming.StreamingAnn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming IVF index maintenance: micro-batches append to a built
  * index exactly once; the serving path covers everything ingested. */
class StreamingAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("foreachBatch sink appends each micro-batch exactly once; index serves the union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft-sann").toString
    Similarity.ivfBuild(base, path, nCentroids = 16)
    // stream two micro-batches of new vectors: copies of corpus vectors
    // under fresh ids (so rank-1 lookups are pinned by construction)
    val baseRows = base.filter(col("vec_id") < 6)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream.foreachBatch(StreamingAnn.indexSink(path))
      .outputMode("append").start()
    try {
      input.addData(baseRows.take(3).map { case (i, v) => (i + 800000L, v) }.toSeq)
      q.processAllAvailable()
      input.addData(baseRows.drop(3).map { case (i, v) => (i + 800000L, v) }.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // all six streamed vectors are served: querying each copy without
    // self-exclusion finds the ORIGINAL corpus vector at rank 1 (cos
    // exactly 1, id tie-break) — proving both generations are read
    val queries = (0L until 6L).map(i => (i + 800000L, baseRows(i.toInt)._2))
      .toDF("query_id", "embedding")
    val got = Similarity.ivfQueryVectors(queries, path, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for (i <- 0L until 6L)
      assert(got(i + 800000L) == i, s"copy ${i + 800000L} -> ${got(i + 800000L)}")
    // the grown corpus attests exactly (incremental XOR fingerprint)
    val full = base.select("vec_id", "embedding").unionByName(
      (0L until 6L).map(i => (i + 800000L, baseRows(i.toInt)._2))
        .toDF("vec_id", "embedding"))
    assert(Similarity.ivfQuery(full, path, k = 1, nQueries = 2).count() > 0)
    // re-delivery of an already-committed batchId is skipped (the
    // at-least-once foreachBatch contract must not duplicate rows)
    val redelivered = (0L until 3L).map(i => (i + 800000L, baseRows(i.toInt)._2))
      .toDF("vec_id", "embedding")
    assert(!Similarity.ivfAppendBatch(redelivered, path, batchId = 0L))
    assert(Similarity.ivfQuery(full, path, k = 1, nQueries = 2).count() > 0,
      "index changed on a re-delivered batch")
  }
}
