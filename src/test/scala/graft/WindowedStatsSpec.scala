package graft

import graft.streaming.WindowedStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Watermarked tumbling-window aggregation: append mode emits each
  * (window, lang) exactly once when the watermark closes it; late rows
  * beyond the horizon are dropped. */
class WindowedStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("perWindow emits closed windows once; late data beyond horizon dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val out = WindowedStats.perWindow(
        input.toDF().toDF("ts", "lang", "text"),
        windowLength = "1 minute", horizon = "2 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      def t(s: Long) = new Timestamp(s * 1000)
      // window [0, 60): 2 en docs + 1 de doc
      input.addData((t(10), "en", "abc"), (t(20), "en", "defgh"), (t(30), "de", "xy"))
      out.processAllAvailable()
      // nothing closed yet: watermark is max(ts) - 2min < 0
      assert(spark.table("win_out").count() == 0)
      // advance event time far enough to close the first window
      input.addData((t(400), "en", "later"))
      out.processAllAvailable()
      val rows = spark.table("win_out")
        .select("window_start", "lang", "n_docs", "n_chars")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000,
          r.getString(1), r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2))
      assert(rows.toSeq == Seq((0L, "de", 1L, 2L), (0L, "en", 2L, 8L)))
      // a straggler for the long-closed first window is dropped, not
      // re-emitted and not merged into a new window
      input.addData((t(15), "en", "too late"))
      out.processAllAvailable()
      assert(spark.table("win_out").count() == 2)
    } finally out.stop()
  }
}
