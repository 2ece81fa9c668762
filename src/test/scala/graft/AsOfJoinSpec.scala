package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics: most recent right row with (ts, tie) <= left's,
  * per key; nulls when no prior right row; left columns preserved. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("joinAsOf: picks the latest prior-or-equal right row per key; " +
      "null when none; extra left columns survive") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L, "p1"), // after right rows at 50, 90 → matches 90
      (1L, 50L, 11L, "p2"),  // equal ts to right id 2 < 11 → matches it
      (1L, 10L, 12L, "p3"),  // before all right rows → null
      (2L, 100L, 13L, "p4")  // key 2 has no right rows → null
    ).toDF("k", "ts", "id", "tag")
    val right = Seq(
      (1L, 50L, 2L, 777L),
      (1L, 90L, 3L, 888L)
    ).toDF("k", "ts", "id", "payload")
    val got = AsOfJoin.joinAsOf(left, right, "k", "ts", "id", Seq("payload"))
      .collect().map(r => (r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    assert(got == Set(
      (10L, "p1", 888L), (11L, "p2", 777L), (12L, "p3", -1L), (13L, "p4", -1L)))
  }

  test("joinAsOf: null carried field in the MATCHED right row stays null — " +
      "no stale carry from an older right row") {
    import spark.implicits._
    val left = Seq((1L, 30L, 3L)).toDF("k", "ts", "id")
    val right = Seq(
      (1L, 10L, 1L, Some(7L), Some(100L)),
      (1L, 20L, 2L, None: Option[Long], Some(200L)) // the as-of match
    ).toDF("k", "ts", "id", "p1", "p2")
    val got = AsOfJoin.joinAsOf(left, right, "k", "ts", "id", Seq("p1", "p2"))
      .collect()
    assert(got.length == 1)
    assert(got(0).isNullAt(3), "p1 must be the matched row's null, not 7")
    assert(got(0).getLong(4) == 200L)
  }

  test("joinAsOf: tie at identical ts — right tie id above left's is NOT " +
      "matched (lexicographic (ts, tie) <= predicate)") {
    import spark.implicits._
    val left = Seq((1L, 50L, 5L, "x")).toDF("k", "ts", "id", "tag")
    val right = Seq((1L, 50L, 9L, 111L)).toDF("k", "ts", "id", "payload")
    val got = AsOfJoin.joinAsOf(left, right, "k", "ts", "id", Seq("payload"))
      .collect()
    assert(got.length == 1 && got(0).isNullAt(4))
  }
}
