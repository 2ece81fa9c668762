package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time series operators: rolling range-frame aggregates and
  * hourly resample with forward gap-fill — the feature-engineering
  * shapes a training pipeline runs over clickstream/telemetry data.
  *
  * Both are key-partitioned window computations: one shuffle on
  * user_id, partition-local sort, parallelism O(users). Monetary sums
  * go through DECIMAL(18,2) so the result is order-free exact and the
  * DuckDB oracle hash-matches bit-for-bit (a raw double sum is neither).
  */
object TimeSeries {

  /** Per event: count and exact sum of `value` over the same user's
    * preceding `windowSeconds` (inclusive, event-time RANGE frame — all
    * rows in the time range regardless of tie order, so the frame is a
    * deterministic SET even with duplicate timestamps).
    * Input columns: user_id, event_id, ts_s (epoch s), value. */
  def rollingStats(events: DataFrame, windowSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_s"))
      .rangeBetween(-windowSeconds, 0)
    events
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_value_win",
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double"))
      .select("user_id", "event_id", "ts_s", "n_win", "sum_value_win")
      .orderBy("event_id")
  }

  /** Hourly resample with gap fill: per user, one row for EVERY hour
    * from the user's first to last active hour; silent hours get
    * n_events = 0 and carry the last observed hourly sum forward.
    * The hour grid comes from `sequence` + `explode` (rows generated on
    * executors, bounded by span/3600 per user — no driver loop), the
    * fill from a running `last(ignoreNulls)` over the user partition. */
  def resampleHourlyForwardFill(events: DataFrame): DataFrame = {
    val hourly = events
      .withColumn("hour_s", expr("(ts_s div 3600) * 3600"))
      .groupBy("user_id", "hour_s")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).as("sum_value"))
    val grid = hourly.groupBy("user_id")
      .agg(min("hour_s").as("h0"), max("hour_s").as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), lit(3600L))).as("hour_s"))
    val w = Window.partitionBy("user_id").orderBy("hour_s")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(hourly, Seq("user_id", "hour_s"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_sum",
        last(col("sum_value"), ignoreNulls = true).over(w).cast("double"))
      .select("user_id", "hour_s", "n_events", "filled_sum")
      .orderBy("user_id", "hour_s")
  }
}
