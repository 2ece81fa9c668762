package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Watermark-bounded streaming dedup: duplicates within the horizon are
  * dropped, across batches; normalization-equal texts count as dups. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("byFingerprint drops within-horizon duplicates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = StreamingDedup.byFingerprint(
        input.toDF().toDF("ts", "text"), horizon = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      def t(ms: Long) = new Timestamp(ms)
      // batch 1: two distinct docs + an exact dup + a normalization dup
      input.addData(
        (t(1000), "Hello, World!"), (t(2000), "other doc"),
        (t(3000), "Hello, World!"), (t(4000), "hello   world"))
      out.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
      // batch 2: a dup of batch 1 (still within the horizon) is dropped;
      // a genuinely new doc passes
      input.addData((t(60000), "other doc"), (t(61000), "brand new"))
      out.processAllAvailable()
      val texts = spark.table("dedup_out").select("text").as[String]
        .collect().sorted
      assert(texts.toSeq == Seq("Hello, World!", "brand new", "other doc"))
    } finally out.stop()
  }
}
