package graft

import graft.operators.TimeSeries
import org.scalatest.funsuite.AnyFunSuite

/** Rolling range-frame stats ≡ naive per-row scan; gap-fill produces a
  * complete hour grid with correct zero-fill and forward carry. */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("rollingStats ≡ naive trailing-window scan, ties included") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      (rnd.nextInt(3).toLong, i.toLong,
        rnd.nextInt(50).toLong * 60, // coarse grid forces ts ties
        math.round(rnd.nextDouble() * 10000) / 100.0)
    }
    val got = TimeSeries
      .rollingStats(rows.toDF("user_id", "event_id", "ts_s", "value"), 600L)
      .select("event_id", "n_win", "sum_value_win")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    rows.foreach { case (u, id, ts, _) =>
      val win = rows.filter(r => r._1 == u && r._3 >= ts - 600 && r._3 <= ts)
      val sum = win.map(r => BigDecimal(r._4).setScale(2)).sum
      assert(got(id) == ((win.size.toLong, sum.toDouble)),
        s"event $id: got ${got(id)}, want (${win.size}, $sum)")
    }
  }

  test("resampleHourlyForwardFill: full grid, zero-filled silent hours, " +
      "carried sums") {
    import spark.implicits._
    val rows = Seq(
      (1L, 0L * 3600 + 10, 1.5), (1L, 0L * 3600 + 20, 2.5), // hour 0: sum 4.0
      (1L, 3L * 3600 + 5, 10.0), // hours 1-2 silent, hour 3: sum 10.0
      (2L, 5L * 3600, 7.0) // single-hour user: exactly one row
    ).toDF("user_id", "ts_s", "value")
    val got = TimeSeries.resampleHourlyForwardFill(rows)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 2L, 4.0), (1L, 3600L, 0L, 4.0), (1L, 7200L, 0L, 4.0),
      (1L, 10800L, 1L, 10.0), (2L, 18000L, 1L, 7.0)))
  }
}
