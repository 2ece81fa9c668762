package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-robust readers for the driver's `events.parquet`.
  *
  * The generator has shipped the `ts` column as BOTH
  *   - parquet TIMESTAMP(NANOS), which vanilla Spark reads only as a raw
  *     nanos-since-epoch INT64 (`spark.sql.legacy.parquet.nanosAsLong`), and
  *   - parquet TIMESTAMP(MICROS) `isAdjustedToUTC=false`, which Spark 4
  *     reads as TIMESTAMP_NTZ
  * across regenerations. Every consumer that needs epoch seconds goes
  * through here so a future regeneration changes ONE branch, not three
  * call sites. The DuckDB oracles compute `epoch_ns(ts) // 1e9`, which is
  * type-agnostic on their side; this helper is the Spark-side equivalent.
  */
object EventTime {

  /** `events.parquet` as-is, transparently handling the legacy
    * TIMESTAMP(NANOS) encoding (which plain `read.parquet` refuses). */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    try spark.read.parquet(path)
    catch {
      case e: Throwable if e.getMessage != null &&
          e.getMessage.contains("NANOS") =>
        // Legacy nanos files are unreadable without this conf; scope the
        // mutation to this branch (it is a no-op for every other type,
        // but keep the session clean on the modern path).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path)
    }
  }

  /** Whole epoch seconds (truncated toward zero for the positive epochs in
    * the testdata) from whatever type `colName` actually is. Tz-free: the
    * NTZ branch derives seconds from wall-clock fields, so the result does
    * not depend on `spark.sql.session.timeZone` (DuckDB's `epoch_ns` on a
    * naive TIMESTAMP likewise treats the wall time as UTC). */
  def secondsCol(df: DataFrame, colName: String = "ts"): Column =
    df.schema(colName).dataType match {
      case LongType => // legacy nanos-as-long; `div` is ns-exact (long `/`
        // promotes to double, exact only to 2^53 < 1.7e18 ns)
        expr(s"$colName div 1000000000L").cast("long")
      case TimestampNTZType =>
        (unix_date(col(colName).cast(DateType)).cast("long") * 86400L +
          hour(col(colName)) * 3600L + minute(col(colName)) * 60L +
          second(col(colName)))
      case _: TimestampType => // UTC-adjusted micros
        expr(s"unix_micros($colName) div 1000000").cast("long")
      case other =>
        throw new IllegalStateException(
          s"events.$colName has unsupported type $other")
    }

  /** `events.parquet` with an epoch-seconds `ts_s` column appended. */
  def eventsWithSeconds(spark: SparkSession, sfDir: String): DataFrame = {
    val df = readEvents(spark, sfDir)
    df.withColumn("ts_s", secondsCol(df))
  }
}
