package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: pair each left row with the right rows whose
  * timestamp falls in `[leftTs - lookback, leftTs]`, optionally under
  * additional equality keys.
  *
  * Spark plans a raw `BETWEEN` join condition with no equality conjunct
  * as BroadcastNestedLoopJoin — a cartesian blow-up at scale. This
  * operator turns the range predicate into an EQUI-join by banding both
  * sides into fixed-width time buckets of width = `lookback`: a right
  * row at time t can only serve left rows in buckets ⌊t/W⌋ and ⌊t/W⌋+1,
  * so the right side is replicated exactly twice (a bounded, data-
  * independent factor), the join runs as a shuffled hash/sort-merge join
  * on (bucket, keys…), and a residual filter applies the exact bounds.
  * Shuffle volume is 2·|R| + |L| rows regardless of time span, and
  * parallelism is O(buckets × keys) — no per-row range scan, no
  * single-partition stage.
  *
  * The same banding idea underlies the streaming twin
  * ([[graft.streaming.StreamJoin]]), where the band width instead bounds
  * the watermark-retained state.
  */
object RangeJoin {

  /** Columns of `right` are carried over with prefix `r_` (the caller
    * projects/renames afterwards). `leftTs`/`rightTs` are epoch-seconds
    * LONG columns. */
  def intervalJoin(left: DataFrame, right: DataFrame, leftTs: String,
      rightTs: String, lookbackSeconds: Long,
      keys: Seq[String] = Seq.empty): DataFrame = {
    require(lookbackSeconds > 0, "lookbackSeconds must be positive")
    val w = lookbackSeconds
    val l = left.withColumn("_bucket", floor(col(leftTs) / w))
    // right row serves left buckets ⌊t/W⌋ (gap < W within bucket) and
    // ⌊t/W⌋+1 (left early in the next bucket, right late in this one)
    val r = right
      .withColumn("_bucket",
        explode(array(floor(col(rightTs) / w), floor(col(rightTs) / w) + 1)))
      .select(col("_bucket") +: keys.map(col) :+
        struct(right.columns.map(col).toIndexedSeq: _*).as("_r"): _*)
    l.join(r, Seq("_bucket") ++ keys)
      .filter(col("_r").getField(rightTs) >= col(leftTs) - w &&
        col("_r").getField(rightTs) <= col(leftTs))
      .drop("_bucket")
      .select(left.columns.map(col).toIndexedSeq ++
        right.columns.filterNot(keys.contains).map(c =>
          col("_r").getField(c).as(s"r_$c")): _*)
  }
}
