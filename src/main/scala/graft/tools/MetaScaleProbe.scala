package graft.tools

import org.apache.spark.sql.SparkSession

/** Metadata-plane scaling probe for the ARRAY store (dev tool, not a
  * gate — the pipeline-side analog is [[graft.ScaleProbe]]). The claims
  * it turns into measurements: scan planning stays O(buckets) driver
  * state (manifest rows live in parquet, never on the driver), the
  * hash-range sidecar keeps point-lookup planning from opening footers,
  * and driver retained heap after planning grows sub-linearly in the
  * index size. The quantity that actually grows at 100 TB is CHUNKS —
  * this probes the index at ~10⁶ chunk rows, 30× the round-9 probe.
  *
  * Per scale (chunk count): ingest a fresh 1-D dataset whose chunk size
  * is 8 longs (tiny blobs — payload is irrelevant to the metadata
  * plane; values vary per chunk so every blob hash is DISTINCT and the
  * ranged chunk files carry realistic disjoint hash spans), then time
  *  - ingest (context only; not the probe's subject),
  *  - dsv2_first: full DSv2 count — scan-manifest BUILD + read,
  *  - dsv2_cached: same count again — published-manifest reuse,
  *  - window_plan: a 16-chunk windowed exploded read — O(window)
  *    planning against the 10⁶-row index (resolve + sidecar-pruned
  *    point partitions),
  *  - slice_driver: a 4-chunk driver getSlice — the latency-path read,
  * and record retained driver heap (post-GC used delta since session
  * start) after the first plan.
  *
  * Usage:
  *   SPARK_GRAFT_META_SCALES=65536,262144,1048576 \
  *   sbt "runMain graft.tools.MetaScaleProbe"
  */
object MetaScaleProbe {
  def main(args: Array[String]): Unit = {
    val scales = sys.env.getOrElse("SPARK_GRAFT_META_SCALES",
      "65536,262144,1048576").split(",").toSeq.map(_.trim.toLong)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-meta-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try f catch { case e: Throwable =>
        System.err.println(s"[meta-probe] failed: ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    def usedHeapMb(): Double = {
      System.gc(); Thread.sleep(200); System.gc()
      val rt = Runtime.getRuntime
      (rt.totalMemory() - rt.freeMemory()) / 1e6
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val heap0 = usedHeapMb()
    for (nChunks <- scales) {
      val chunkX = 8L // 8 longs per chunk: 64-byte payload, metadata-bound
      val dimX = nChunks * chunkX
      val meta = graft.meta.DatasetMeta(
        dimensions = Map("x" -> dimX),
        chunkDimensions = Map("x" -> chunkX),
        variables = Map("v" ->
          graft.meta.VariableDef("long", Vector("x"), -1.0)))
      val root = java.nio.file.Files.createTempDirectory("graft_meta_probe").toString
      val store = new graft.spark.SparkStore(spark, root)
      store.create("ds")

      def rec(name: String)(f: => Unit): Unit = {
        val t = time(f)
        results(s"${name}_c$nChunks") = t
        System.err.println(f"[meta-probe] ${name}_c$nChunks: $t%.2f s")
      }

      // distributed ingest: 1024 chunks (8192 cells) per slab row, value
      // = absolute coordinate so every chunk's content hash is unique
      rec("ingest") {
        val cellsPerSlab = 8192L
        val nSlabs = (dimX + cellsPerSlab - 1) / cellsPerSlab
        val w = store.addVersion("ds", meta)
        val slabRows = spark.range(nSlabs).map { s =>
          val lo = s * cellsPerSlab
          val hi = math.min(lo + cellsPerSlab, dimX)
          val bytes = new Array[Byte](((hi - lo) * 8L).toInt)
          val bb = java.nio.ByteBuffer.wrap(bytes)
          var x = lo
          while (x < hi) { bb.putLong(x); x += 1 }
          (Array(lo), Array(hi), bytes, s)
        }.toDF("start", "stop", "bytes", "seq")
        w.writeRows("v", slabRows)
        w.finishVersion()
      }

      def fullDf = spark.read.format("graft").option("root", root)
        .option("dataset", "ds").option("variable", "v").load()
      rec("dsv2_first") { require(fullDf.count() == dimX) }
      val heapAfterPlan = usedHeapMb() - heap0
      results(s"heap_after_plan_mb_c$nChunks") = heapAfterPlan
      System.err.println(f"[meta-probe] heap_after_plan_mb_c$nChunks: $heapAfterPlan%.1f MB")
      rec("dsv2_cached") { require(fullDf.count() == dimX) }

      val reader = store.reader("ds").onLastVersion()
      rec("window_plan") {
        // 16-chunk window in the middle of the grid: planning must prune
        // via the index (version/var partitions) + hash-range sidecars,
        // never list-or-open O(nChunks) anything
        val lo = (nChunks / 2) * chunkX
        val df = reader.exploded("v",
          graft.core.Slice(Seq(lo), Seq(lo + 16 * chunkX)))
        require(df.count() == 16 * chunkX)
      }
      rec("slice_driver") {
        val lo = (nChunks / 3) * chunkX
        val s = reader.getSlice("v",
          graft.core.Slice(Seq(lo), Seq(lo + 4 * chunkX)))
        require(s.valueAt(Seq(lo)) == lo.toDouble)
      }
      graft.spark.SparkStore.clearBlobCache()
      spark.catalog.clearCache()
    }
    val line = results.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{", ",", "}")
    println(s"""{"probe":"meta-scale","timings":$line}""")
    spark.stop()
  }
}
