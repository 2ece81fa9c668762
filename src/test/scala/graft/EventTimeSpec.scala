package graft

import graft.queries.EventTime
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Pins EventTime.secondsCol for every `ts` physical type the driver's
  * generator has shipped (nanos-INT64 in rounds ≤6, micros-TIMESTAMP_NTZ
  * from round 7) plus UTC-adjusted TIMESTAMP — a regeneration flipping the
  * type again must not break the q_arr/asof/sessions gate family again. */
class EventTimeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // 2021-03-04T05:06:07.890123 UTC = 1614834367.890123 s since epoch
  private val epochS = 1614834367L

  test("legacy nanos-as-long → whole seconds via exact integer div") {
    val df = spark.createDataFrame(
      List(Row(epochS * 1000000000L + 890123456L), Row(0L),
        // 2^53 ns boundary — double arithmetic would round this wrong
        Row(9007199254740993L)).asJava,
      StructType(Seq(StructField("ts", LongType))))
    val out = df.select(EventTime.secondsCol(df).as("s"))
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(epochS, 0L, 9007199L))
  }

  test("TIMESTAMP_NTZ micros → same seconds, independent of session tz") {
    val df = spark.createDataFrame(
      List(Row(java.time.LocalDateTime.of(2021, 3, 4, 5, 6, 7, 890123000))).asJava,
      StructType(Seq(StructField("ts", TimestampNTZType))))
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      // deliberately non-UTC: the NTZ branch must not consult session tz
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      val out = df.select(EventTime.secondsCol(df).as("s")).collect()
      assert(out.head.getLong(0) == epochS)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("UTC-adjusted TIMESTAMP → unix_micros seconds") {
    val df = spark.createDataFrame(
      List(Row(java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(epochS, 890123000L)))).asJava,
      StructType(Seq(StructField("ts", TimestampType))))
    val out = df.select(EventTime.secondsCol(df).as("s")).collect()
    assert(out.head.getLong(0) == epochS)
  }

  test("legacy TIMESTAMP(NANOS) parquet: readEvents falls back to the " +
      "nanosAsLong conf and secondsCol truncates exactly") {
    // pinned fixture written by pyarrow with version=2.6 ns timestamps —
    // the physical type the driver's generator shipped in rounds ≤ 6
    val dir = "src/test/resources/events_nanos"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    try {
      val ev = EventTime.eventsWithSeconds(spark, dir)
      assert(ev.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType) // nanos surfaced as raw long
      val got = ev.orderBy("event_id").select("ts_s")
        .collect().map(_.getLong(0)).toSeq
      // row 3 is base + 0.999999999s: .890123456 + that crosses the
      // second boundary → epochS+1; sub-second parts truncate
      assert(got == Seq(epochS, 0L, epochS + 1))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  test("eventsWithSeconds reads the driver's current events.parquet") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val ev = EventTime.eventsWithSeconds(spark, sfDir)
    val r = ev.selectExpr("min(ts_s)", "max(ts_s)", "count(*)").collect()(0)
    assert(r.getLong(2) > 0)
    // sanity: epochs in a plausible range (year 2000..2100), whole seconds
    assert(r.getLong(0) > 946684800L && r.getLong(1) < 4102444800L)
  }
}
