package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic FILE-SOURCE feed for the streaming gates' production
  * twins: a bounded frame is cut into `nBatches` uniform event-time
  * slices, each written by a Spark job as ONE parquet file with strictly
  * increasing mtimes, so `readStream.parquet` (oldest-first,
  * maxFilesPerTrigger=1) replays them as time-ordered micro-batches —
  * the real unbounded path (file landing zone → stateful operator →
  * distributed sink), with no event row ever crossing the driver. The
  * only driver reads are the min/max of the slicing column (two scalar
  * aggregates, planning-sized).
  *
  * This replaces the MemoryStream replay harness's driver-collected feed
  * for gates that must prove the production path end-to-end; the replay
  * harness remains the right tool for per-batch-composition-sensitive
  * tests (it controls batch membership exactly).
  */
object FileFeed {

  /** Write the slices + optional tail frames and return the streaming
    * frame reading them back (schema = `df.schema`). `tsCol` must be a
    * LONG event-time column (seconds); tails land after every slice in
    * arrival order (sentinel/flush batches). */
  def sliced(df: DataFrame, tsCol: String, nBatches: Int, workDir: String,
      tails: Seq[DataFrame] = Nil): DataFrame = {
    val spark = df.sparkSession
    val feed = s"$workDir/feed"
    new java.io.File(feed).mkdirs()
    val mm = df.agg(min(col(tsCol)), max(col(tsCol))).head()
    require(!mm.isNullAt(0), "FileFeed.sliced: empty input")
    val (minT, maxT) = (mm.getLong(0), mm.getLong(1))
    val span = math.max(1L, maxT - minT + 1)
    val mtimeBase = System.currentTimeMillis() - 600000L
    def writeSlice(slice: DataFrame, i: Int): Unit = {
      val tmp = s"$workDir/slice_tmp_$i"
      slice.repartition(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"FileFeed: no part file in $tmp"))
      val dst = new java.io.File(feed, f"slice_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtimeBase + i * 2000L)
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(tmp))
    }
    for (i <- 0 until nBatches) {
      val lo = minT + i * span / nBatches
      val hi = if (i == nBatches - 1) maxT + 1
        else minT + (i + 1) * span / nBatches
      writeSlice(df.filter(col(tsCol) >= lo && col(tsCol) < hi), i)
    }
    tails.zipWithIndex.foreach { case (t, j) =>
      writeSlice(t.select(df.columns.map(col): _*), nBatches + j) }
    spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", 1).parquet(feed)
  }

  /** Run a streaming frame to completion through a parquet sink
    * (AvailableNow) and return the sunk rows as a batch frame. */
  def runToParquet(out: DataFrame, workDir: String): DataFrame = {
    val spark = out.sparkSession
    val q = out.writeStream.format("parquet")
      .option("path", s"$workDir/out")
      .option("checkpointLocation", s"$workDir/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$workDir/out")
  }
}
