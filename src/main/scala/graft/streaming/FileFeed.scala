package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
    * arrival order (sentinel/flush batches).
    *
    * `oooSkewSeconds > 0` produces a NON-time-ordered feed with bounded
    * disorder — the production arrival shape (a firehose is never
    * perfectly ordered): each row is assigned to a slice by a PERTURBED
    * position `ts + δ` where δ is a deterministic per-row hash in
    * [-skew, +skew], so events cross slice boundaries by up to one skew
    * in either direction. Two rows can arrive out of order only when
    * their true event times differ by ≤ 2·skew — the displacement bound
    * a consumer's watermark delay must cover (delay > 2·skew ⇒ no row
    * is ever late-dropped; rows beyond that slack would be dropped by
    * the stateful operator's watermark filter, per Spark's contract).
    * Tail frames are never perturbed (they are watermark sentinels). */
  def sliced(df: DataFrame, tsCol: String, nBatches: Int, workDir: String,
      tails: Seq[DataFrame] = Nil, oooSkewSeconds: Long = 0L,
      knownBounds: Option[(Long, Long)] = None): DataFrame = {
    val spark = df.sparkSession
    val feed = s"$workDir/feed"
    new java.io.File(feed).mkdirs()
    // slice position: true event time, or the hash-perturbed variant for
    // the bounded-disorder feed (deterministic: same row → same slice)
    val pos =
      if (oooSkewSeconds <= 0) col(tsCol)
      else col(tsCol) +
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*),
          lit(2 * oooSkewSeconds + 1)) - oooSkewSeconds
    val withPos = df.withColumn("_feed_pos", pos)
    // knownBounds: a caller that already aggregated min/max of tsCol can
    // hand them over and skip the second full-input agg job this method
    // would otherwise run. Only valid for unperturbed feeds — with skew
    // the slicing position is NOT tsCol, so the caller cannot know it.
    require(knownBounds.isEmpty || oooSkewSeconds <= 0,
      "FileFeed.sliced: knownBounds is only valid without oooSkewSeconds")
    val (minT, maxT) = knownBounds.getOrElse {
      val mm = withPos.agg(min(col("_feed_pos")), max(col("_feed_pos"))).head()
      require(!mm.isNullAt(0), "FileFeed.sliced: empty input")
      (mm.getLong(0), mm.getLong(1))
    }
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
    // ONE job writes every slice (guide §2.4: the per-slice
    // filter+repartition(1) loop re-scanned the input nBatches times and
    // paid nBatches job round-trips; with 14 file gates × reps that was
    // measurable suite-wide). Slice index by closed-form inverse of the
    // loop boundaries lo_i = minT + i*span/nBatches: for offset
    // d = pos - minT, slice(d) = max{i : i*span < (d+1)*nBatches} =
    // floor(((d+1)*nBatches - 1) / span) — row-identical to the old
    // per-slice range filters (pinned by FileFeedSliceSpec).
    val tmpAll = s"$workDir/slices_tmp"
    // tails ride the SAME write job as fixed trailing slice indices
    // (nBatches + j) instead of one repartition(1) job each — sentinel
    // frames are single rows, so a dedicated Spark job per tail was pure
    // scheduling overhead across every file gate (guide §2.4)
    val mainSlices = withPos
      .withColumn("_slice", expr(
        s"CAST(((_feed_pos - ${minT}L + 1L) * ${nBatches}L - 1L) div ${span}L AS INT)"))
      .select((df.columns.map(col) :+ col("_slice")).toIndexedSeq: _*)
    val tailSlices = tails.zipWithIndex.map { case (t, j) =>
      t.select(df.columns.map(col).toIndexedSeq: _*)
        .withColumn("_slice", lit(nBatches + j))
    }
    tailSlices.foldLeft(mainSlices)(_ unionByName _)
      .repartition(col("_slice"))
      .write.partitionBy("_slice").parquet(tmpAll)
    for (i <- 0 until nBatches + tails.length) {
      val dir = new java.io.File(tmpAll, s"_slice=$i")
      val parts = Option(dir.listFiles()).toSeq.flatten
        .filter(_.getName.endsWith(".parquet"))
      // one part per slice dir is the repartition(col)'s invariant; if a
      // future conf (maxRecordsPerFile, skew splitting) ever breaks it,
      // fail loudly instead of silently dropping the extra parts' rows
      require(parts.length <= 1, s"FileFeed.sliced: slice $i produced " +
        s"${parts.length} part files — single-file-per-slice invariant broken")
      parts.headOption match {
        case Some(part) =>
          val dst = new java.io.File(feed, f"slice_$i%03d.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          dst.setLastModified(mtimeBase + i * 2000L)
        case None =>
          // an empty event-time range still feeds one (empty) file, so
          // micro-batch boundaries stay exactly as before
          writeSlice(spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], df.schema), i)
      }
    }
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(tmpAll))
    spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", 1).parquet(feed)
  }

  /** Run a streaming frame to completion through a parquet sink
    * (AvailableNow) and return the sunk rows as a batch frame.
    * `narrowTo` bounds `spark.sql.shuffle.partitions` for the stream's
    * lifetime (restored after): a bounded gate feed doesn't need one
    * state-store instance per session shuffle partition per micro-batch
    * — the partition count is captured into the checkpoint at start. */
  def runToParquet(out: DataFrame, workDir: String,
      narrowTo: Option[Int] = None, rocksDb: Boolean = false): DataFrame = {
    val spark = out.sparkSession
    withNarrowShuffle(spark, narrowTo) {
      withLocalCheckpoints(spark, s"$workDir/ckpt") {
      // changelog checkpointing when RocksDB: the production commit path
      // (per-batch cost ~ batch delta, not total state; the default mode
      // zips a FULL snapshot per store per micro-batch — measured as the
      // dominant task wait of the transformWithState gates). Recovery
      // equivalence under all three modes is pinned by RocksDbStateSpec.
      withStateProvider(spark, rocksDb, changelog = rocksDb) {
        val q = out.writeStream.format("parquet")
          .option("path", s"$workDir/out")
          .option("checkpointLocation", s"$workDir/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      }
    }
    unloadStateStores()
    spark.read.parquet(s"$workDir/out")
  }

  /** Drop the finished query's executor-side state-store providers: a
    * stopped query's in-memory state maps otherwise linger in the JVM
    * until the periodic maintenance unloads them (minutes), and a
    * sequence of bounded gate streams in one JVM accumulates hundreds of
    * loaded providers' worth of heap pressure that bleeds into whatever
    * runs next. A later streaming query reloads providers on demand. */
  private def unloadStateStores(): Unit =
    try org.apache.spark.sql.graft.StateStoreHygiene.unloadAll()
    catch { case _: Throwable => () }

  /** UPDATE-mode production sink: parquet has no native update sink, so
    * the documented production pattern is `foreachBatch` appending each
    * micro-batch's refreshed rows — an UPDATE LOG on disk that a reader
    * reduces to final values (for the monotone aggregates the gates use,
    * max per key). Rows go executor → parquet inside foreachBatch; the
    * driver never sees them. Returns the full update log. */
  def runUpdatesToParquet(out: DataFrame, workDir: String,
      narrowTo: Option[Int] = None, rocksDb: Boolean = false): DataFrame = {
    val spark = out.sparkSession
    val path = s"$workDir/out"
    withNarrowShuffle(spark, narrowTo) {
      withLocalCheckpoints(spark, s"$workDir/ckpt") {
      // changelog checkpointing when RocksDB: the production commit path
      // (per-batch cost ~ batch delta, not total state; the default mode
      // zips a FULL snapshot per store per micro-batch — measured as the
      // dominant task wait of the transformWithState gates). Recovery
      // equivalence under all three modes is pinned by RocksDbStateSpec.
      withStateProvider(spark, rocksDb, changelog = rocksDb) {
        val q = out.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
            batch.write.mode("append").parquet(path); ()
          }
          .outputMode("update")
          .option("checkpointLocation", s"$workDir/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      }
    }
    unloadStateStores()
    spark.read.parquet(path)
  }

  /** Route checkpoint I/O through [[LocalNioCheckpointFileManager]] when
    * (and only when) the checkpoint root is on the local filesystem —
    * the default FileContext manager forks a `chmod` subprocess per
    * checkpoint file without libhadoop (see the manager's scaladoc; the
    * win was measured at ~25-30% of every bounded file-source gate).
    * An explicitly configured manager, or a non-file checkpoint root
    * (object store at scale), is left untouched. */
  def withLocalCheckpoints[A](spark: SparkSession, ckptDir: String)(
      body: => A): A = {
    val key = "spark.sql.streaming.checkpointFileManagerClass"
    val scheme = try new java.net.URI(ckptDir).getScheme catch { case _: Throwable => null }
    val isLocal = scheme == null || scheme == "file"
    if (!isLocal || spark.conf.getOption(key).nonEmpty) body
    else withConf(spark, key, classOf[LocalNioCheckpointFileManager].getName)(body)
  }

  private def withNarrowShuffle[A](spark: SparkSession, narrowTo: Option[Int])(
      body: => A): A = narrowTo match {
    case None => body
    case Some(n) =>
      // SPARK_GRAFT_STREAM_NARROW overrides the caller's width (A/B dial
      // + deployment sizing: state-store instance count per operator is a
      // scale-dependent choice — a production feed wants >= cores, a
      // bounded gate feed wants few instances; see OPTIMIZATION_r19.md)
      val eff = sys.env.get("SPARK_GRAFT_STREAM_NARROW")
        .map(_.toInt).getOrElse(n)
      withConf(spark, "spark.sql.shuffle.partitions", eff.toString)(body)
  }

  /** Pin one session conf for `body`'s span, restoring the previous
    * value (or unsetting) after — the shared pattern for confs a stream
    * depends on for its whole lifetime (e.g. noDataMicroBatches, which
    * the timeout gates PIN rather than inherit). */
  def withConf[A](spark: SparkSession, key: String, value: String)(
      body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Fully-qualified RocksDB state-store provider (bundled with Spark;
    * rocksdbjni ships in the distribution's jars). */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the session's state-store provider switched to
    * RocksDB (restored after). The provider class is captured per query
    * at start, so wrapping the `start()`/`awaitTermination()` span is
    * sufficient. At 100 TB the DEFAULT heap provider is the wrong tool —
    * every active key lives on the executor heap, so state is bounded by
    * executor memory; RocksDB keeps state on local SSD with a block-cache
    * working set, which is how a production deployment holds a multi-TB
    * dedup horizon or join buffer. The gates run both providers against
    * the SAME oracle: state-backend choice must be invisible to results. */
  def withStateProvider[A](spark: SparkSession, rocksDb: Boolean,
      changelog: Boolean = false)(body: => A): A =
    if (!rocksDb) body
    else {
      // Changelog checkpointing is the production commit path at scale:
      // the default uploads a FULL RocksDB snapshot zip per micro-batch
      // per partition (commit cost grows with total state size), the
      // changelog mode uploads only the batch's changed keys and
      // snapshots in the background (commit cost ~ batch delta). Both
      // recover exactly-once — RocksDbStateSpec restarts under each.
      val keys = Seq(
        "spark.sql.streaming.stateStore.providerClass" -> RocksDbProvider,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
          -> changelog.toString)
      val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
}
