package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `rightTs <= leftTs` under the same key — the standard event-to-event
  * attribution / point-in-time lookup operator, which Spark has no
  * built-in for.
  *
  * Implemented Spark-first as union + per-key running `last(_, ignoreNulls)`
  * window rather than a per-left-row range join: ONE shuffle on the key,
  * partition-local sort, no join blow-up. The window is always
  * key-partitioned, so parallelism is O(keys) and a 100 TB event log with
  * millions of users scales; a single hot key degrades to that key's
  * partition only.
  *
  * Ties (equal timestamp) are broken by `tieCol` (a unique id), making the
  * result deterministic; a right row whose (ts, tie) equals the left row's
  * sorts BEFORE it only if its tie id is smaller — the match predicate is
  * `(rts, rtie) <= (lts, ltie)` lexicographically.
  */
object AsOfJoin {

  /** Left rows gain `carried` columns from the as-of-matched right row
    * (null when no prior right row exists). `left`/`right` must share the
    * `key`, `ts`, `tieCol` column names; `carried` names columns of
    * `right` to bring over (renamed `asof_<name>`).
    *
    * All carried columns travel in ONE struct through a single running
    * `last(ignoreNulls)` — independent per-column windows would skip over
    * a matched right row's legitimately-null field to an OLDER row's
    * value, stitching together a row that never existed. */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      tieCol: String, carried: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rStructType = org.apache.spark.sql.types.StructType(
      carried.map(c => right.schema(c).copy(name = c)))
    val l = left.select(
      col(key) +: col(ts) +: col(tieCol) +: lit(1).as("_is_left") +:
        leftCols.filterNot(Set(key, ts, tieCol)).map(col) :+
        lit(null).cast(rStructType).as("_r"): _*)
    val r = right.select(
      col(key) +: col(ts) +: col(tieCol) +: lit(0).as("_is_left") +:
        leftCols.filterNot(Set(key, ts, tieCol)).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(carried.map(c => col(c).as(c)): _*).as("_r"): _*)
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .select(leftCols.map(col) ++
        carried.map(c => col("_asof").getField(c).as(s"asof_$c")): _*)
  }
}
