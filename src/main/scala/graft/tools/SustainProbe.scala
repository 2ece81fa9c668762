package graft.tools

import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import graft.spark.SparkStore
import graft.streaming.StreamingIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sustained-operation probe (dev tool, not a gate) — the two round-16
  * verdict items the gate suite proves only at small scale:
  *
  * LEG A — sustained streaming ingest. `versionedSink` commits one
  * version per real micro-batch; the gates prove 3 batches. Here: 50
  * file-fed micro-batches in two 25-batch phases with the maintenance
  * triad (compact → expireHistory) run MID-STREAM between them, as a
  * long-running deployment would weekly. Measured: listing + full-scan
  * planning time at 25 accumulated manifests vs after maintenance vs at
  * the end (must stay flat — manifest count is bounded by expireHistory,
  * so planning never grows with stream lifetime); a FRESH version-tail
  * stream (startingVersion=earliest) that must cross the mid-history
  * checkpoint (the re-delivery rule, CompactionSpec) and converge to the
  * exact batch state; and the final MVCC read vs the batch oracle
  * computed from the same synthetic events.
  *
  * LEG B — shared-token concurrent writers at x4 scale. The ownership
  * verify + bounded re-merge (SparkStore.verifySharedWrite) is raced by
  * the gates at 7-chunk width; here 4 writers (independent writer
  * handles rebuilt from one token, concurrent threads, each its own
  * Spark jobs) ingest the x4 perf shape (400×600×3600 shorts, 33.6k
  * chunks) on disjoint x-partitions PLUS a deliberately overlapping
  * plane band, then one commit. Measured: convergence (count + overlap
  * winners by seq) and the 4-writer wall vs a single-writer baseline —
  * the verify overhead, which must stay a small constant factor
  * (verdict bar: ≤ ~20% at equal volume). Cross-JVM token bootstrap is
  * separately proven by SparkFlowSpec's real-process test; this leg
  * measures the verify's SCALING, which is process-layout-independent
  * (all coordination state lives in the store, none in memory).
  *
  * Usage: sbt "runMain graft.tools.SustainProbe"   (or plain java -cp)
  * Legs: SPARK_GRAFT_SUSTAIN_LEGS=stream,race (default both)
  */
object SustainProbe {
  private val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
  private def rec(name: String, v: Double): Unit = {
    results(name) = v
    System.err.println(f"[probe] $name: $v%.3f")
  }
  private def time(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    try { f; rec(name, (System.nanoTime() - t0) / 1e9) }
    catch { case e: Throwable =>
      System.err.println(s"[probe] $name FAILED: ${e.getMessage}")
      e.printStackTrace()
      rec(name, -1.0)
    }
  }

  def main(args: Array[String]): Unit = {
    val legs = sys.env.getOrElse("SPARK_GRAFT_SUSTAIN_LEGS", "stream,race")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sustain-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    if (legs("stream")) runStreamLeg(spark)
    if (legs("race")) runRaceLeg(spark)

    val line = results.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{", ",", "}")
    println(s"""{"probe":"sustain","timings":$line}""")
    spark.stop()
  }

  // ---------------------------------------------------------------- leg A
  private def runStreamLeg(spark: SparkSession): Unit = {
    import spark.implicits._
    val hours = 1600L
    val h0 = 400000L
    // fixed event-time density: 128 events/hour, deterministic offsets
    val ev = spark.range(hours * 128).select(
      (lit(h0 * 3600L) + (col("id") % hours) * 3600L +
        (col("id") * 37L % 3600L)).as("ts_s")).persist()
    val oracle = ev.select((col("ts_s") / 3600L).cast("long").as("ah"))
      .groupBy("ah").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0) - h0) -> r.getLong(1)).toMap

    val root = java.nio.file.Files.createTempDirectory("graft_sustain").toString
    val store = new SparkStore(spark, root)
    val mid = (h0 + hours / 2) * 3600L
    def work() = java.nio.file.Files
      .createTempDirectory("graft_sustain_feed").toString

    time("sustain_phaseA_25batches") {
      val n = StreamingIngest.hourlyVersionedStreamFile(
        ev.filter(col("ts_s") < mid), store, "sus", h0, hours, 25, work())
      require(n == 25, s"phase A must commit 25 versions, got $n")
    }
    time("sustain_listing_at25") { require(store.versions("sus").size == 25) }
    var planned = 0
    time("sustain_plan_at25") {
      planned = spark.read.format("graft").option("root", root)
        .option("dataset", "sus").option("variable", "n").load()
        .rdd.partitions.length
    }
    rec("sustain_plan_partitions_at25", planned.toDouble)

    // mid-stream maintenance, as a deployment runs weekly
    time("sustain_compact") { store.compact("sus"); () }
    time("sustain_expire") {
      rec("sustain_expired_versions", store.expireHistory("sus").toDouble)
    }
    time("sustain_vacuum") {
      rec("sustain_vacuum_blobs", store.vacuum(graceMs = 0L).toDouble)
    }

    time("sustain_phaseB_25batches") {
      val n = StreamingIngest.hourlyVersionedStreamFile(
        ev.filter(col("ts_s") >= mid), store, "sus", h0, hours, 25, work())
      require(n == 26, s"phase B must add 25 versions over the checkpoint, got $n")
    }
    time("sustain_listing_at50") { require(store.versions("sus").nonEmpty) }
    time("sustain_plan_at50") {
      planned = spark.read.format("graft").option("root", root)
        .option("dataset", "sus").option("variable", "n").load()
        .rdd.partitions.length
    }
    rec("sustain_plan_partitions_at50", planned.toDouble)
    rec("sustain_manifests_final", store.versions("sus").size.toDouble)

    // final MVCC read vs the batch oracle
    val got = store.reader("sus").onLastVersion()
      .exploded("n", Slice(Seq(0L), Seq(hours)))
      .filter(col("value") =!= -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(got == oracle,
      s"final MVCC read must equal the batch oracle (${got.size} vs ${oracle.size} cells)")
    rec("sustain_final_cells", got.size.toDouble)

    // FRESH version-tail from earliest: must cross the mid-history
    // checkpoint (re-delivery rule) and converge to the same state —
    // last delta per coordinate in arrival order wins
    time("sustain_tail_backfill") {
      val state = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
      val q = spark.readStream.format("graft").option("root", root)
        .option("dataset", "sus").option("variable", "n").load()
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => state.put(r.getLong(0), r.getLong(1)))
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      val tailState = {
        import scala.jdk.CollectionConverters._
        state.asScala.toMap.filter(_._2 != -1L)
      }
      require(tailState == oracle,
        s"tail backfill across the checkpoint must converge to the oracle " +
          s"(${tailState.size} vs ${oracle.size} cells)")
    }
    ev.unpersist()
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
    ()
  }

  // ---------------------------------------------------------------- leg B
  private def runRaceLeg(spark: SparkSession): Unit = {
    import spark.implicits._
    val zDim = 3600L // x4 of the reference perf shape: 33.6k chunks
    val dims = Map("x" -> 400L, "y" -> 600L, "z" -> zDim)
    val meta = DatasetMeta(
      dimensions = dims,
      chunkDimensions = Map("x" -> 30L, "y" -> 30L, "z" -> 30L),
      variables = Map("foo" -> VariableDef("short", Vector("x", "y", "z"), -3.0)))
    val root = java.nio.file.Files.createTempDirectory("graft_race").toString
    val store = new SparkStore(spark, root)

    // one x-plane per slab row, generated on executors (ArrayBench shape);
    // value encodes the WRITER id so overlap winners are checkable
    def planeRows(xs: Range, writerId: Long, seqBase: Long) = {
      val yz = 600L * zDim
      val zD = zDim
      spark.range(xs.start, xs.end).map { xo =>
        val x = xo.toLong
        val bytes = new Array[Byte]((yz * 2).toInt)
        var i = 0
        while (i < yz) {
          val v = ((x * 31 + i) % 500 + writerId * 1000).toShort
          bytes(2 * i) = (v >> 8).toByte; bytes(2 * i + 1) = v.toByte
          i += 1
        }
        (Array(x, 0L, 0L), Array(x + 1L, 600L, zD), bytes, seqBase + x)
      }.toDF("start", "stop", "bytes", "seq")
    }

    // single-writer baseline at identical volume (plus the same warm-up)
    store.create("base")
    val wWarm = store.addVersion("base",
      meta.copy(dimensions = dims.updated("z", 60L)))
    wWarm.write("foo", Seq(Slab.empty(DType.SHORT,
      Slice(Seq(0L, 0L, 0L), Seq(30L, 30L, 60L)), 1.0)))
    wWarm.finishVersion()
    var singleSec = 0.0
    time("race_single_writer") {
      val t0 = System.nanoTime()
      val w = store.addVersion("base", meta)
      w.writeRows("foo", planeRows(0 until 400, writerId = 0L, seqBase = 0L))
      w.finishVersion()
      singleSec = (System.nanoTime() - t0) / 1e9
    }

    // 4 shared-token writers: disjoint x-quarters PLUS each also writes
    // the overlap band x∈[198,202) — raced chunks resolved by seq LWW
    // (writer i's band rows carry seqBase i*10000, so writer 3 must win)
    store.create("race")
    val master = store.addVersion("race", meta)
    val tok = master.token
    var raceSec = 0.0
    time("race_4_writers") {
      val t0 = System.nanoTime()
      val threads = (0 until 4).map { i =>
        val t = new Thread(() => {
          val mine = new SparkStore(spark, root).writerFromToken("race", tok)
          val xs = (i * 100) until ((i + 1) * 100)
          mine.writeRows("foo",
            planeRows(xs, writerId = i.toLong, seqBase = i.toLong * 10000L))
          mine.writeRows("foo", planeRows(198 until 202,
            writerId = i.toLong, seqBase = i.toLong * 10000L + 5000L))
        })
        t.start(); t
      }
      threads.foreach(_.join())
      master.finishVersion()
      raceSec = (System.nanoTime() - t0) / 1e9
    }
    rec("race_overhead_ratio", if (singleSec > 0) raceSec / singleSec else -1.0)

    // convergence: full-count via zone maps, and the overlap band must
    // be writer 3's values everywhere (seq LWW)
    val df = spark.read.format("graft").option("root", root)
      .option("dataset", "race").option("variable", "foo").load()
    val n = df.agg(count(lit(1))).collect()(0).getLong(0)
    require(n == 400L * 600L * zDim, s"converged cell count, got $n")
    val band = store.reader("race").onLastVersion()
      .exploded("foo", Slice(Seq(198L, 0L, 0L), Seq(202L, 600L, zDim)))
      .agg(min(col("value")).as("mn")).collect()(0).getAs[Number](0).intValue
    require(band >= 3000, s"overlap band must be writer 3's (seq LWW), min=$band")
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
    ()
  }
}
