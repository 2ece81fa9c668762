package graft.queries

import graft.core.Slice
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SURVEY §2.7 declared query set: each query runs the full engine path
  * (distributed ingest already done by ArrayFixtures; here: MVCC resolve →
  * pruned chunk join → decode → exploded view), and each has a DuckDB
  * oracle over the same events.parquet ground truth.
  */
object ArrayQueries {

  /** Memoized fixtures bind their SparkStore to the session that built
    * them; serving a cached handle to a DIFFERENT (or restarted) session
    * would run its jobs on a stale context. Every fixture `get` validates
    * with this and rebuilds on mismatch (orphaned tempdir blobs are the
    * only cost). */
  private def fixtureLive(store: graft.spark.SparkStore,
      s: SparkSession): Boolean =
    (store.spark eq s) && !s.sparkContext.isStopped

  /** Self-contained mark-and-sweep fixture (no testdata dependency):
    * dataset `keep` = 7 on [0,20), dataset `drop` = 9 on [0,20) (distinct
    * content → distinct blobs), then destroy(`drop`) + vacuum(grace 0).
    * Memoized per JVM; `reclaimed` is the vacuum's removed-blob count. */
  private object VacuumFixture {
    final case class H(store: graft.spark.SparkStore, reclaimed: Long)
    private val cache =
      new java.util.concurrent.atomic.AtomicReference[H](null)
    def get(s: SparkSession): H = {
      val cur = cache.get()
      if (cur != null && fixtureLive(cur.store, s)) cur
      else synchronized {
        val again = cache.get()
        if (again != null && fixtureLive(again.store, s)) again
        else {
          import graft.core._
          import graft.meta.{DatasetMeta, VariableDef}
          val root = java.nio.file.Files
            .createTempDirectory("graft_vacuum_fixture").toString
          val store = new graft.spark.SparkStore(s, root)
          val meta = DatasetMeta(
            dimensions = Map("h" -> 20L),
            chunkDimensions = Map("h" -> 8L),
            variables = Map("v" -> VariableDef("long", Vector("h"), -1.0)))
          def ingest(ds: String, fill: Double): Unit = {
            store.create(ds)
            val w = store.addVersion(ds, meta)
            w.write("v", Seq(Slab.empty(DType.LONG,
              Slice(Seq(0L), Seq(20L)), fill)))
            w.finishVersion(); ()
          }
          ingest("keep", 7.0)
          ingest("drop", 9.0)
          store.destroy("drop")
          val h = H(store, store.vacuum(graceMs = 0L))
          cache.set(h); h
        }
      }
    }
  }

  /** Rank-5 fixture (no testdata dependency, memoized per JVM): dims
    * (a,b,c,d,e) = (6,5,4,3,7), chunks (4,3,2,2,4) — every axis has
    * overhang. v1 writes value = 1 + row-major linear index over the box
    * [0,6)×[0,5)×[0,4)×[0,3)×[0,5) (e∈[5,7) stays fill −1: the fill
    * corner); v2 overwrites the interior box [2,5)×[1,4)×[1,3)×[0,2)×
    * [3,7) with 1000 + linear (partial-chunk overlap merge on all five
    * axes). lin(a,b,c,d,e) = 420a + 84b + 21c + 7d + e. */
  private object Fixture5D {
    final case class H(store: graft.spark.SparkStore)
    private val cache =
      new java.util.concurrent.atomic.AtomicReference[H](null)
    private def lin(a: Long, b: Long, c: Long, d: Long, e: Long): Long =
      420 * a + 84 * b + 21 * c + 7 * d + e
    private def boxVals(box: Slice, f: Long => Double): IndexedSeq[Double] =
      box.iter.map { co =>
        f(lin(co(0), co(1), co(2), co(3), co(4)))
      }.toIndexedSeq
    def get(s: SparkSession): H = {
      val cur = cache.get()
      if (cur != null && fixtureLive(cur.store, s)) cur
      else synchronized {
        val again = cache.get()
        if (again != null && fixtureLive(again.store, s)) again
        else {
          import graft.core._
          import graft.meta.{DatasetMeta, VariableDef}
          val root = java.nio.file.Files
            .createTempDirectory("graft_5d_fixture").toString
          val store = new graft.spark.SparkStore(s, root)
          val meta = DatasetMeta(
            dimensions = Map("a" -> 6L, "b" -> 5L, "c" -> 4L,
              "d" -> 3L, "e" -> 7L),
            chunkDimensions = Map("a" -> 4L, "b" -> 3L, "c" -> 2L,
              "d" -> 2L, "e" -> 4L),
            variables = Map("v" ->
              VariableDef("long", Vector("a", "b", "c", "d", "e"), -1.0)))
          store.create("d5")
          val boxA = Slice(Seq(0L, 0L, 0L, 0L, 0L), Seq(6L, 5L, 4L, 3L, 5L))
          val w1 = store.addVersion("d5", meta)
          w1.write("v", Seq(Slab.fromDoubles(DType.LONG, boxA,
            boxVals(boxA, l => (1 + l).toDouble))))
          w1.finishVersion()
          val boxB = Slice(Seq(2L, 1L, 1L, 0L, 3L), Seq(5L, 4L, 3L, 2L, 7L))
          val w2 = store.addVersion("d5", meta)
          w2.write("v", Seq(Slab.fromDoubles(DType.LONG, boxB,
            boxVals(boxB, l => (1000 + l).toDouble))))
          w2.finishVersion()
          val h = H(store)
          cache.set(h); h
        }
      }
    }
  }

  /** `rck` = ev.n@v1 rechunked onto extent 100, created at most once per
    * fixture store (q_arr_rechunk and q_arr_xgrid both depend on it and
    * run in arbitrary order). */
  private def ensureRechunked(s: SparkSession, fx: ArrayFixtures.Handles): Unit =
    ArrayFixtures.synchronized {
      if (!fx.store.datasetExists("rck")) {
        s.read.format("graft").option("root", fx.store.root)
          .option("dataset", "ev").option("variable", "n")
          .option("version", fx.evV1.toString).load()
          .write.format("graft").option("root", fx.store.root)
          .option("dataset", "rck").option("variable", "n")
          .option("create", "true").option("dims", s"h:${fx.hours}:100")
          .option("type", "long").option("fill", "-1").mode("append").save()
      }
    }

  /** `evc` = zero-copy clone of `ev` plus one divergent write (444 on
    * [5,15) of n), created at most once per fixture store. The clone
    * carries ev's FULL committed history (shared blobs, copied
    * manifests+index) — so evc@evV1 must read as ev@v1 and evc@latest
    * as v2's overlay plus the divergence, while ev itself is untouched. */
  private def ensureCloned(s: SparkSession, fx: ArrayFixtures.Handles): Unit =
    ArrayFixtures.synchronized {
      // Guard on the divergent overlay's PRESENCE, not mere dataset
      // existence: a crash between cloneDataset and finishVersion would
      // otherwise leave an evc that permanently mismatches its oracle on
      // this fixture dir. The complete fixture has strictly more
      // committed versions than ev (clone carries ev's history + 1
      // divergent write) — anything short of that is a partial build:
      // destroy and rebuild.
      val complete = fx.store.datasetExists("evc") &&
        fx.store.versions("evc").length > fx.store.versions("ev").length
      if (!complete) {
        if (fx.store.datasetExists("evc")) fx.store.destroy("evc")
        import graft.core._
        fx.store.cloneDataset("ev", "evc")
        val latest = fx.store.versions("evc").head._2
        val meta = fx.store.metadata("evc", latest)
        val w = fx.store.addVersion("evc",
          meta.copy(versionId = None, parent = None))
        w.write("n", Seq(Slab.empty(DType.LONG, Slice(Seq(5L), Seq(15L)), 444.0)))
        w.finishVersion()
        ()
      }
    }

  /** Shared oracle CTE: per-hour counts re-origined to the first hour —
    * the exact ground truth the fixture slabs were built from. */
  private val cte =
    """WITH hb AS (SELECT CAST(floor(epoch(ts)/3600) AS BIGINT) AS ah FROM events),
      |c AS (SELECT ah - (SELECT min(ah) FROM hb) AS h, count(*) AS cnt FROM hb GROUP BY 1),
      |hh AS (SELECT max(h)+1 AS maxh FROM c)
      |""".stripMargin

  private def grid = "FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h"

  /** Streaming-ingest fixture: the events table replayed through
    * `StreamingIngest.hourlyCounts → versionedSink` in three event-time
    * micro-batches — each batch's delta commits as one immutable version
    * (update mode: a boundary hour spanning batches is re-emitted with
    * its cumulative count and the newer version wins in the MVCC
    * overlay). Memoized per sfDir; `nVersions` is the committed count. */
  /** compact → expireHistory → vacuum triad, exercised end-to-end once
    * per JVM: v1 = 2h on [0,48), v2 replaces one whole chunk with 3h+1 on
    * [16,32), checkpoint, expire the pre-checkpoint history, vacuum. The
    * latest read must equal the pre-compaction overlay; `expired` pins
    * that BOTH old versions' manifests+index partitions are gone, and
    * `reclaimed` that v1's overwritten chunk blob was physically GC'd. */
  private object CompactFixture {
    final case class H(store: graft.spark.SparkStore,
        expired: Boolean, reclaimed: Boolean)
    private val cache =
      new java.util.concurrent.atomic.AtomicReference[H](null)
    def get(s: SparkSession): H = {
      val cur = cache.get()
      if (cur != null && fixtureLive(cur.store, s)) cur
      else synchronized {
        val again = cache.get()
        if (again != null && fixtureLive(again.store, s)) again
        else {
          import graft.core._
          import graft.meta.{DatasetMeta, VariableDef}
          val root = java.nio.file.Files
            .createTempDirectory("graft_compact_fixture").toString
          val store = new graft.spark.SparkStore(s, root)
          store.create("cds")
          val meta = DatasetMeta(
            dimensions = Map("h" -> 48L),
            chunkDimensions = Map("h" -> 16L),
            variables = Map("n" -> VariableDef("long", Vector("h"), -1.0)))
          val w1 = store.addVersion("cds", meta)
          w1.write("n", Seq(Slab.fromDoubles(DType.LONG,
            Slice(Seq(0L), Seq(48L)), (0 until 48).map(h => 2.0 * h))))
          w1.finishVersion()
          Thread.sleep(2)
          val w2 = store.addVersion("cds", meta)
          w2.write("n", Seq(Slab.fromDoubles(DType.LONG,
            Slice(Seq(16L), Seq(32L)), (16 until 32).map(h => 3.0 * h + 1))))
          w2.finishVersion()
          store.compact("cds")
          val nExpired = store.expireHistory("cds")
          val reclaimed = store.vacuum(graceMs = 0L)
          val h = H(store, nExpired == 2L, reclaimed >= 1L)
          cache.set(h)
          h
        }
      }
    }
  }

  private object StreamIngestFixture {
    final case class H(store: graft.spark.SparkStore, hours: Long, nVersions: Int)
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, H]()
    final case class TsRow(ts: java.sql.Timestamp)
    def get(s: SparkSession, dir: String): H = {
      val h = cache.computeIfAbsent(dir, build(s, _))
      if (fixtureLive(h.store, s)) h
      else { cache.remove(dir, h); get(s, dir) } // stale session: rebuild
    }
    private def build(s: SparkSession, d: String): H = {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val secs = EventTime.eventsWithSeconds(s, d)
          .select("ts_s").collect().map(_.getLong(0)).sorted
        val h0 = secs.head / 3600L
        val hours = secs.last / 3600L - h0 + 1
        val root = java.nio.file.Files
          .createTempDirectory("graft_stream_ingest").toString
        val store = new graft.spark.SparkStore(s, root)
        val input = MemoryStream[TsRow]
        // generous watermark: the replay must never drop state mid-run
        val q = graft.streaming.StreamingIngest.versionedSink(
          store, "evstream", h0, hours)(
          graft.streaming.StreamingIngest.hourlyCounts(
            input.toDS().toDF(), watermark = "9600 hours"))
        try {
          val per = math.max(1, (secs.length + 2) / 3)
          secs.grouped(per).foreach { b =>
            input.addData(b.toIndexedSeq.map(t =>
              TsRow(new java.sql.Timestamp(t * 1000L))))
            q.processAllAvailable()
          }
        } finally q.stop()
        H(store, hours, store.versions("evstream").size)
    }
  }

  private object StreamIngestFileFixture {
    final case class H(store: graft.spark.SparkStore, hours: Long,
        nVersions: Int, nBatches: Int)
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, H]()
    def get(s: SparkSession, dir: String): H = {
      val h = cache.computeIfAbsent(dir, build(s, _))
      if (fixtureLive(h.store, s)) h
      else { cache.remove(dir, h); get(s, dir) } // stale session: rebuild
    }
    private def build(s: SparkSession, d: String): H = {
        val evs = EventTime.eventsWithSeconds(s, d).select("ts_s")
        val mm = evs.agg(min(col("ts_s")), max(col("ts_s"))).head()
        val h0 = mm.getLong(0) / 3600L
        val hours = mm.getLong(1) / 3600L - h0 + 1
        val store = new graft.spark.SparkStore(s, java.nio.file.Files
          .createTempDirectory("graft_ingest_fstream").toString)
        val nBatches = 3
        val n = graft.streaming.StreamingIngest.hourlyVersionedStreamFile(
          evs, store, "evstream", h0, hours, nBatches,
          workDir = java.nio.file.Files
            .createTempDirectory("graft_ingest_feed").toString)
        H(store, hours, n, nBatches)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // streaming ingest end-to-end: micro-batch deltas → committed
    // versions → MVCC overlay; latest read ≡ the batch per-hour counts
    // (never-written zero-count hours stay at fill −1)
    "q_arr_stream_ingest" -> ((s, dir) => {
      val fx = StreamIngestFixture.get(s, dir)
      fx.store.reader("evstream").onLastVersion()
        .exploded("n", Slice(Seq(0L), Seq(fx.hours)))
        .withColumn("multi_version", lit(fx.nVersions >= 2))
        .orderBy("h")
    }),
    // PRODUCTION twin of q_arr_stream_ingest: the same versioned sink
    // fed from a real file landing zone — `multi_version` additionally
    // gates EXACTLY one committed version per real micro-batch, and the
    // MVCC overlay re-hashes against the same hour-counts oracle
    "q_arr_stream_ingest_fstream" -> ((s, dir) => {
      val fx = StreamIngestFileFixture.get(s, dir)
      fx.store.reader("evstream").onLastVersion()
        .exploded("n", Slice(Seq(0L), Seq(fx.hours)))
        .withColumn("multi_version", lit(fx.nVersions == fx.nBatches))
        .orderBy("h")
    }),
    // R1-R6 + S1-S9 + W1-W8 + V2/V3 + P1/P2: hyperslab read at v2
    "q_arr_slice" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      fx.store.reader("ev").onVersion(fx.evV2)
        .exploded("n", Slice(Seq(10L), Seq(40L))).orderBy("h")
    }),
    // the SAME slice through an explicit file:/// store root — the whole
    // metadata plane (manifests, index listing, blob scoping) resolves
    // through the Hadoop FileSystem route a remote (hdfs/s3a) root takes,
    // gated against the same oracle as q_arr_slice
    "q_arr_fsroot" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val fsStore = new graft.spark.SparkStore(s, "file://" + fx.store.root)
      fsStore.reader("ev").onVersion(fx.evV2)
        .exploded("n", Slice(Seq(10L), Seq(40L))).orderBy("h")
    }),
    // W2: in-version overlapping writes, last-writer-wins
    "q_arr_merge" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      fx.store.reader("ev").onVersion(fx.evV1)
        .exploded("n", Slice(Seq(15L), Seq(35L))).orderBy("h")
    }),
    // R5: fill for never-written coordinates
    "q_arr_fill" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      fx.store.reader("ev").onVersion(fx.evV1)
        .exploded("m", Slice(Seq(0L), Seq(30L))).orderBy("h")
    }),
    // V5: same slice at the parent version (discrepant vs q_arr_slice)
    "q_arr_timetravel" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      fx.store.reader("ev").onVersion(fx.evV1)
        .exploded("n", Slice(Seq(20L), Seq(40L))).orderBy("h")
    }),
    // V3/V4: uncommitted version (v3, zeros) invisible to latest-readers
    "q_arr_abort" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      fx.store.reader("ev").onLastVersion()
        .exploded("n", Slice(Seq(20L), Seq(40L))).orderBy("h")
    }),
    // grow: re-dimensioned child, retained data + fill in the new region
    "q_arr_grow" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      fx.store.reader("evgrow").onVersion(fx.growV2)
        .exploded("g", Slice(Seq(fx.hours - 5), Seq(fx.hours + 24))).orderBy("h")
    }),
    // shrink: re-dimensioned child H → H−16 — retained data visible inside
    // the new bounds, the OLD extent rejected at this version
    // (reference: src/io/mandoline/test/shrink.clj:55-70)
    "q_arr_shrink" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val rdr = fx.store.reader("evshrink").onVersion(fx.shrinkV2)
      val oldExtentRejected =
        try { rdr.exploded("k", Slice(Seq(0L), Seq(fx.hours))); false }
        catch { case _: IndexOutOfBoundsException => true }
      rdr.exploded("k", Slice(Seq(fx.hours - 36), Seq(fx.hours - 16)))
        .withColumn("old_extent_rejected", lit(oldExtentRejected))
        .orderBy("h")
    }),
    // grow THEN shrink in one lineage, all three eras in one result:
    // v1 = original counts; v2 = grown extent with a write into the new
    // region plus fill beyond it; v3 = shrunk extent where v2's
    // new-region write is out of bounds and invisible (the grow.clj +
    // shrink.clj composition the reference only exercises separately)
    "q_arr_regrow" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val h = fx.hours
      val rdr = fx.store.reader("evregrow")
      def era(tag: String, v: Long, lo: Long, hi: Long) =
        rdr.onVersion(v).exploded("r", Slice(Seq(lo), Seq(hi)))
          .select(lit(tag).as("era"), col("h"), col("value"))
      era("v1", fx.regrowV1, h - 5, h)
        .unionByName(era("v2", fx.regrowV2, h - 5, h + 24))
        .unionByName(era("v3", fx.regrowV3, h - 36, h - 16))
        .orderBy("era", "h")
    }),
    // V8 + mark-and-sweep space reclamation (the repo's substitute for
    // the reference's designed-out refcounting, README 'Deliberate
    // deltas'): destroying a dataset makes its blobs unreferenced, vacuum
    // physically removes them, and the surviving dataset reads intact
    // compact/expire/vacuum: latest read from the checkpoint alone equals
    // the pre-compaction MVCC overlay (Q-COMPACT)
    "q_arr_compact" -> ((s, dir) => {
      val fx = CompactFixture.get(s)
      fx.store.reader("cds").onLastVersion()
        .exploded("n", Slice(Seq(0L), Seq(48L)))
        .withColumn("expired", lit(fx.expired))
        .withColumn("reclaimed", lit(fx.reclaimed))
        .orderBy("h")
    }),
    // rank-5 variable: slice + overlapping merge + fill corner — the
    // coordinate math (ChunkGrid / Slice / row-major Slab iteration) is
    // rank-generic; this gate pins it beyond the ≤4-D fixtures under the
    // same DuckDB oracle discipline (closed-form ground truth)
    "q_arr_5d" -> ((s, dir) => {
      val fx = Fixture5D.get(s)
      fx.store.reader("d5").onLastVersion()
        .exploded("v", Slice(Seq(1L, 0L, 0L, 0L, 2L), Seq(6L, 5L, 4L, 3L, 7L)))
        .orderBy("a", "b", "c", "d", "e")
    }),
    // strided (step>1) read end-to-end: the reference DEPRECATES its
    // strided path (slice.clj:81-102) and keeps the hot path step-1; here
    // strides are first-class — bounding-box scan + stride-lattice filter
    // on the distributed path (SparkStore.exploded), per-chunk lattice
    // walk on the engine path (Engine.stream). Every axis is strided, one
    // step exceeds its chunk extent (c: 3 > 2 — whole-chunk skipping),
    // and the lattice crosses the v2-overlay, v1 and fill-corner regimes.
    "q_arr_stride" -> ((s, dir) => {
      val fx = Fixture5D.get(s)
      fx.store.reader("d5").onLastVersion()
        .exploded("v", Slice(
          Vector(0L, 1L, 0L, 0L, 2L),
          Vector(6L, 5L, 4L, 3L, 7L),
          Vector(2L, 3L, 3L, 2L, 4L)))
        .orderBy("a", "b", "c", "d", "e")
    }),
    "q_arr_vacuum" -> ((s, dir) => {
      val fx = VacuumFixture.get(s)
      fx.store.reader("keep").onLastVersion()
        .exploded("v", Slice(Seq(0L), Seq(20L)))
        .withColumn("reclaimed", lit(fx.reclaimed > 0L))
        .orderBy("h")
    }),
    // 0-d scalar variable
    "q_arr_scalar" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      fx.store.reader("ev").onVersion(fx.evV1)
        .exploded("s", Slice(Seq.empty[Long], Seq.empty[Long]))
    }),
    // NaN fill round trip for float
    "q_arr_nan" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      fx.store.reader("ev").onVersion(fx.evV1)
        .exploded("f", Slice(Seq(0L), Seq(10L)))
        .agg(
          sum(when(isnan(col("value")), 1L).otherwise(0L)).as("nan_cells"),
          sum(when(isnan(col("value")), 0.0).otherwise(col("value").cast("double"))).as("sum_vals"))
    }),
    // V4: reverse-chronological versions + parent linkage
    "q_arr_versions" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val rows = fx.store.versions("ev").zipWithIndex.map { case ((_, vid), i) =>
        (i.toLong, fx.store.metadata("ev", vid).parent.isDefined)
      }
      s.createDataFrame(rows).toDF("ord", "has_parent").orderBy("ord")
    }),
    // 2-D hyperslab: revenue grid [shipMonth × partBucket] from lineitem,
    // windowed on both axes (multi-axis chunk pruning + fill)
    "q_arr_2d" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      fx.store.reader("grid").onVersion(fx.gridV1)
        .exploded("qty", Slice(Seq(2L, 1L), Seq(math.min(12L, fx.months), 6L)))
        .orderBy("m", "b")
    }),
    // chunked DSv2 scan: per-chunk stats keyed by the _chunk_* columns;
    // the reported KeyGroupedPartitioning makes this aggregation
    // shuffle-free (v2 bucketing conf left enabled — an optimization
    // flag only, results are identical without it)
    "q_arr_chunked" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.read.format("graft").option("root", fx.store.root)
        .option("dataset", "grid").option("variable", "qty")
        .option("version", fx.gridV1.toString)
        .option("chunked", "true").load()
        .groupBy(col("_chunk_m").as("cm"), col("_chunk_b").as("cb"))
        .agg(sum("value").as("qty_sum"), count(lit(1)).as("n_cells"))
        .orderBy("cm", "cb")
    }),
    // zone-map aggregate: exact min/max/sum/count answered from per-chunk
    // index stats (interior chunks: index only; `m`'s unwritten tail: fill
    // arithmetic; edge chunks: decode+clip) — the 100 TB full-variable
    // aggregate never touches interior blobs
    "q_arr_stats" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val rd = fx.store.reader("ev").onVersion(fx.evV1)
      val full = Slice(Seq(0L), Seq(fx.hours))
      def tagged(v: String) = rd.statsAggregate(v, full)
        .select(lit(v).as("varname"), col("vmin"), col("vmax"), col("vsum"), col("vcnt"))
      tagged("m").unionByName(tagged("n")).orderBy("varname")
    }),
    // W4/W7: content-addressed dedup — 50 identical chunks → 1 blob
    "q_arr_dedup" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      s.read.parquet(fx.store.indexDir("dd"))
        .filter(col("var") === "d")
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("hash")).as("n_blobs"))
    }),
    // SQL DELETE end-to-end: deleting a dim-range region commits a new
    // version whose write is fill over that envelope (MVCC append-only
    // — VERSION AS OF below still reads the data); reads at latest see
    // fill in [10,20), data elsewhere
    "q_arr_sql_delete" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val h = fx.hours
      val cat = "graft_" +
        java.lang.Integer.toHexString(fx.store.root.hashCode & 0x7fffffff)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.source.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", fx.store.root)
      if (!fx.store.datasetExists("sqldel")) {
        import s.implicits._
        ArrayFixtures.hourCounts(s, dir).toIndexedSeq.zipWithIndex
          .map { case (c, i) => (i.toLong, c) }
          .toDF("h", "value").createOrReplaceTempView("sqldel_src")
        s.sql(s"""CREATE TABLE $cat.sqldel.e (h BIGINT, value BIGINT)
          TBLPROPERTIES ('dims' = 'h:$h:64', 'fill' = '-1')""")
        s.sql(s"INSERT INTO $cat.sqldel.e SELECT h, value FROM sqldel_src")
        s.sql(s"DELETE FROM $cat.sqldel.e WHERE h >= 10 AND h < 20")
      }
      // versions reverse-chron: [delete, insert, create-ddl]
      val preDelete = fx.store.versions("sqldel")(1)._2
      s.sql(s"""
        SELECT 'pre' AS era, h, value FROM $cat.sqldel.e VERSION AS OF $preDelete
          WHERE h < 25
        UNION ALL
        SELECT 'post' AS era, h, value FROM $cat.sqldel.e WHERE h < 25
        ORDER BY era, h""")
    }),
    // SQL INSERT OVERWRITE end-to-end: the overwrite commits a
    // per-variable REPLACE version — at latest, unwritten regions read
    // fill (older overlays stop resolving); VERSION AS OF the pre-
    // overwrite version still reads the full counts (append-only MVCC,
    // nothing destroyed). Fixture work once per JVM (guarded).
    "q_arr_sql_overwrite" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val h = fx.hours
      val cat = "graft_" +
        java.lang.Integer.toHexString(fx.store.root.hashCode & 0x7fffffff)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.source.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", fx.store.root)
      if (!fx.store.datasetExists("sqlow")) {
        import s.implicits._
        ArrayFixtures.hourCounts(s, dir).toIndexedSeq.zipWithIndex
          .map { case (c, i) => (i.toLong, c) }
          .toDF("h", "value").createOrReplaceTempView("sqlow_src")
        s.sql(s"""CREATE TABLE $cat.sqlow.e (h BIGINT, value BIGINT)
          TBLPROPERTIES ('dims' = 'h:$h:64', 'fill' = '-1')""")
        s.sql(s"INSERT INTO $cat.sqlow.e SELECT h, value FROM sqlow_src")
        s.sql(s"""INSERT OVERWRITE $cat.sqlow.e
          SELECT h, CAST(555 AS BIGINT) FROM sqlow_src WHERE h >= 5 AND h < 15""")
      }
      // versions reverse-chron: [overwrite, insert, create-ddl]
      val preOverwrite = fx.store.versions("sqlow")(1)._2
      s.sql(s"""
        SELECT 'pre' AS era, h, value FROM $cat.sqlow.e VERSION AS OF $preOverwrite
          WHERE h < 25
        UNION ALL
        SELECT 'post' AS era, h, value FROM $cat.sqlow.e WHERE h < 25
        ORDER BY era, h""")
    }),
    // SQL UPDATE end-to-end (delta-based row-level DSv2 path,
    // GraftRowLevel.scala): matched cells are scanned, the assignment is
    // applied, and the new cell values commit as ONE new overlay version
    // through the ordinary one-shuffle distributed write — VERSION AS OF
    // below the update still reads the originals (append-only MVCC)
    "q_arr_sql_update" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val h = fx.hours
      val cat = "graft_" +
        java.lang.Integer.toHexString(fx.store.root.hashCode & 0x7fffffff)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.source.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", fx.store.root)
      if (!fx.store.datasetExists("sqlupd")) {
        import s.implicits._
        ArrayFixtures.hourCounts(s, dir).toIndexedSeq.zipWithIndex
          .map { case (c, i) => (i.toLong, c) }
          .toDF("h", "value").createOrReplaceTempView("sqlupd_src")
        s.sql(s"""CREATE TABLE $cat.sqlupd.e (h BIGINT, value BIGINT)
          TBLPROPERTIES ('dims' = 'h:$h:64', 'fill' = '-1')""")
        s.sql(s"INSERT INTO $cat.sqlupd.e SELECT h, value FROM sqlupd_src")
        s.sql(s"UPDATE $cat.sqlupd.e SET value = value * 3 + 1 " +
          "WHERE h >= 10 AND h < 20")
      }
      // versions reverse-chron: [update, insert, create-ddl]
      val preUpdate = fx.store.versions("sqlupd")(1)._2
      s.sql(s"""
        SELECT 'pre' AS era, h, value FROM $cat.sqlupd.e VERSION AS OF $preUpdate
          WHERE h < 25
        UNION ALL
        SELECT 'post' AS era, h, value FROM $cat.sqlupd.e WHERE h < 25
        ORDER BY era, h""")
    }),
    // SQL MERGE INTO end-to-end: the dense-array matching rule (every
    // in-extent coordinate exists, so source rows always MATCH), a
    // conditional matched DELETE (reads as fill), and a matched UPDATE
    // taking the source's value — one new version for the whole MERGE
    "q_arr_sql_merge" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val h = fx.hours
      val cat = "graft_" +
        java.lang.Integer.toHexString(fx.store.root.hashCode & 0x7fffffff)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.source.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", fx.store.root)
      if (!fx.store.datasetExists("sqlmrg")) {
        import s.implicits._
        ArrayFixtures.hourCounts(s, dir).toIndexedSeq.zipWithIndex
          .map { case (c, i) => (i.toLong, c) }
          .toDF("h", "value").createOrReplaceTempView("sqlmrg_src")
        s.sql(s"""CREATE TABLE $cat.sqlmrg.e (h BIGINT, value BIGINT)
          TBLPROPERTIES ('dims' = 'h:$h:64', 'fill' = '-1')""")
        s.sql(s"INSERT INTO $cat.sqlmrg.e SELECT h, value FROM sqlmrg_src")
        s.sql(s"""
          MERGE INTO $cat.sqlmrg.e t
          USING (SELECT h, value * 10 AS v FROM sqlmrg_src
                 WHERE h >= 5 AND h < 15) s
          ON t.h = s.h
          WHEN MATCHED AND s.v % 20 = 0 THEN DELETE
          WHEN MATCHED THEN UPDATE SET value = s.v
          WHEN NOT MATCHED THEN INSERT (h, value) VALUES (s.h, s.v)""")
      }
      // versions reverse-chron: [merge, insert, create-ddl]
      val preMerge = fx.store.versions("sqlmrg")(1)._2
      s.sql(s"""
        SELECT 'pre' AS era, h, value FROM $cat.sqlmrg.e VERSION AS OF $preMerge
          WHERE h < 25
        UNION ALL
        SELECT 'post' AS era, h, value FROM $cat.sqlmrg.e WHERE h < 25
        ORDER BY era, h""")
    }),
    // block pooling (spark.Coarsen): hourly → 8-hourly rollup of ev.n at
    // v1. Factor 8 divides the chunk extent 64, so the whole aggregation
    // is EXCHANGE-FREE over the chunked scan's KeyGroupedPartitioning
    // (CoarsenSpec pins the plan; this gate pins the semantics)
    "q_arr_coarsen" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      graft.spark.Coarsen.coarsen(s, fx.store.root, "ev", "n",
          Some(fx.evV1), factors = Map("h" -> 8L))
        .orderBy("h_c")
    }),
    // training-batch export: each chunk's cells as ONE row-major value
    // array — the ML-dataloader handoff shape (a tensor per chunk, its
    // grid coordinate as the batch key). Grouping by _chunk_h over the
    // chunked scan is exchange-free; row-major order comes from the
    // in-group sort, not a global one. The gate then posexplodes the
    // tensor back to (c, n_cells, pos, value) scalar rows so the
    // driver's pandas oracle can hash it (array-typed top-level columns
    // are un-hashable there); the round trip still proves the tensor
    // assembly — pos is the row-major position WITHIN the collected
    // array, so any ordering mistake in the collect shows up as a
    // pos/value mismatch
    "q_arr_tensors" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.read.format("graft").option("root", fx.store.root)
        .option("dataset", "ev").option("variable", "n")
        .option("version", fx.evV1.toString)
        .option("chunked", "true").load()
        .groupBy(col("_chunk_h").as("c"))
        .agg(count(lit(1)).as("n_cells"),
          expr("transform(sort_array(collect_list(struct(h, value))), x -> x.value)")
            .as("vals"))
        .select(col("c"), col("n_cells"),
          posexplode(col("vals")).as(Seq("pos", "value")))
        .orderBy("c", "pos")
    }),
    // incrementally-maintained coarsened MATERIALIZED VIEW
    // (streaming.Rollup): v1 backfills the 8-hourly (sum, cnt) view
    // through the version-tail streaming source, v2's overlay then
    // advances it by ONE delta batch — maintenance cost O(changed
    // chunks), not O(view); RollupSpec pins that the incremental run
    // writes only the affected view chunk. The oracle is the full
    // recompute of the v2 state, so incremental ≡ recompute is exactly
    // what hash-matching proves
    "q_arr_rollup_incr" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val store = fx.store
      if (!store.datasetExists("rollsrc")) {
        import graft.core._
        import graft.meta.{DatasetMeta, VariableDef}
        val counts = ArrayFixtures.hourCounts(s, dir)
        val m = DatasetMeta(Map("h" -> fx.hours), Map("h" -> 64L),
          Map("n" -> VariableDef("long", Vector("h"), -1.0)))
        store.create("rollsrc")
        val w1 = store.addVersion("rollsrc", m)
        w1.write("n", Seq(Slab.fromDoubles(DType.LONG,
          Slice(Seq(0L), Seq(fx.hours)), counts.map(_.toDouble).toIndexedSeq)))
        w1.finishVersion()
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft_rollup_ckpt").toString
        graft.streaming.Rollup.maintain(s, store.root, "rollsrc", "n",
          "rollview", Map("h" -> 8L), ckpt)
        Thread.sleep(2)
        val w2 = store.addVersion("rollsrc", m)
        w2.write("n", Seq(Slab.empty(DType.LONG,
          Slice(Seq(20L), Seq(30L)), 999.0)))
        w2.finishVersion()
        graft.streaming.Rollup.maintain(s, store.root, "rollsrc", "n",
          "rollview", Map("h" -> 8L), ckpt)
      }
      def rd(v: String, as: String) = store.reader("rollview").onLastVersion()
        .exploded(v, Slice(Seq(0L), Seq((fx.hours + 7L) / 8L)))
        .select(col("h").as("h_c"), col("value").as(as))
      rd("sum", "v_sum").join(rd("cnt", "n_cells"), Seq("h_c"))
        .orderBy("h_c")
    }),
    // label-based selection (xarray sel(axis=slice(lo, hi)) — AxisOps
    // .selByLabel): a 1-d coordinate variable lab(h) = 100 + 10·h holds
    // the labels; selecting labels [150, 350) must reduce to the index
    // slice h ∈ [5, 25) via the two-phase coordinate-scan plan (phase 1
    // scans ONLY the metadata-sized coordinate variable; phase 2 slices
    // the data variable on the derived index range, so label predicates
    // become chunk pruning, not a full-scan filter)
    "q_arr_sel" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val store = fx.store
      // Completeness guard, not mere existence (same rationale as
      // ensureCloned): a crash between create and finishVersion would
      // leave a permanently empty selfx that mismatches its oracle on
      // every later run. No committed version ⇒ partial build ⇒ rebuild.
      val selfxComplete = store.datasetExists("selfx") &&
        store.versions("selfx").nonEmpty
      if (!selfxComplete) {
        if (store.datasetExists("selfx")) store.destroy("selfx")
        import graft.core._
        import graft.meta.{DatasetMeta, VariableDef}
        val counts = ArrayFixtures.hourCounts(s, dir)
        val m = DatasetMeta(Map("h" -> fx.hours), Map("h" -> 64L),
          Map("n" -> VariableDef("long", Vector("h"), -1.0),
            "lab" -> VariableDef("long", Vector("h"), -1.0)))
        store.create("selfx")
        val w = store.addVersion("selfx", m)
        w.write("n", Seq(Slab.fromDoubles(DType.LONG,
          Slice(Seq(0L), Seq(fx.hours)), counts.map(_.toDouble).toIndexedSeq)))
        w.write("lab", Seq(Slab.fromDoubles(DType.LONG,
          Slice(Seq(0L), Seq(fx.hours)),
          (0L until fx.hours).map(h => 100.0 + 10.0 * h))))
        w.finishVersion()
      }
      graft.spark.AxisOps.selByLabel(s, store.root, "selfx", "n", "lab",
          "h", lo = 150L, hi = 350L)
        .orderBy("h")
    }),
    // CREATE TABLE … AS SELECT: the catalog's createTable + the DSv2
    // append compose into (non-atomic) CTAS — dataset, definition, and
    // first version land from one statement
    "q_arr_sql_ctas" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val h = fx.hours
      val cat = "graft_" +
        java.lang.Integer.toHexString(fx.store.root.hashCode & 0x7fffffff)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.source.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", fx.store.root)
      if (!fx.store.datasetExists("ctas")) {
        import s.implicits._
        ArrayFixtures.hourCounts(s, dir).toIndexedSeq.zipWithIndex
          .map { case (c, i) => (i.toLong, c) }
          .toDF("h", "value").createOrReplaceTempView("ctas_src")
        s.sql(s"""CREATE TABLE $cat.ctas.e
          TBLPROPERTIES ('dims' = 'h:$h:64', 'fill' = '-1', 'type' = 'long')
          AS SELECT h, value FROM ctas_src""")
      }
      s.sql(s"SELECT h, value FROM $cat.ctas.e WHERE h < 25 ORDER BY h")
    }),
    // derived-variable pipeline, entirely in SQL: a second variable is
    // added to the dataset (CREATE TABLE carries existing variables
    // forward — one dataset, one version lineage) and populated FROM a
    // transform of the first; both then read consistently at latest
    "q_arr_derived" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val h = fx.hours
      val cat = "graft_" +
        java.lang.Integer.toHexString(fx.store.root.hashCode & 0x7fffffff)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.source.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", fx.store.root)
      if (!fx.store.datasetExists("derv")) {
        import s.implicits._
        ArrayFixtures.hourCounts(s, dir).toIndexedSeq.zipWithIndex
          .map { case (c, i) => (i.toLong, c) }
          .toDF("h", "value").createOrReplaceTempView("derv_src")
        s.sql(s"""CREATE TABLE $cat.derv.a (h BIGINT, value BIGINT)
          TBLPROPERTIES ('dims' = 'h:$h:64', 'fill' = '-1')""")
        s.sql(s"INSERT INTO $cat.derv.a SELECT h, value FROM derv_src")
        s.sql(s"""CREATE TABLE $cat.derv.b (h BIGINT, value BIGINT)
          TBLPROPERTIES ('dims' = 'h:$h:64', 'fill' = '-1')""")
        s.sql(s"INSERT INTO $cat.derv.b SELECT h, value * 2 + 1 FROM $cat.derv.a")
      }
      s.sql(s"""
        SELECT a.h AS h, a.value AS src, b.value AS derived
        FROM $cat.derv.a a JOIN $cat.derv.b b ON a.h = b.h
        WHERE a.h < 25 ORDER BY h""")
    }),
    // distributed prefix scan (spark.AxisOps.cumsumAxis): cumulative sum
    // along h in TWO passes — per-chunk totals (tiny), exclusive prefix
    // over those totals, offsets joined back onto per-chunk local
    // cumsums. A naive Window.orderBy(h) would funnel all cells through
    // ONE task; here no task holds more than one chunk
    "q_arr_cumsum" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      graft.spark.AxisOps.cumsumAxis(s, fx.store.root, "ev", "n",
          Some(fx.evV1), axis = "h")
        .orderBy("h")
    }),
    // linear upsampling (spark.AxisOps.interpAxis, inverse of coarsen):
    // 4× interpolation with integer-floor arithmetic (deterministic on
    // any engine); each cell's successor arrives via a 1-cell halo, so
    // chunk-boundary segments interpolate correctly without global sorts
    "q_arr_interp" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      graft.spark.AxisOps.interpAxis(s, fx.store.root, "ev", "n",
          Some(fx.evV1), axis = "h", k = 4)
        .orderBy("h")
    }),
    // forward-fill along the axis (spark.AxisOps.ffillAxis, xarray
    // ffill): m is written on [0,10) only — every later cell carries
    // h=9's value forward via the two-pass chunk-summary scan (no
    // global per-line sort); leading fill-only prefixes stay at fill
    "q_arr_ffill" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      graft.spark.AxisOps.ffillAxis(s, fx.store.root, "ev", "m",
          Some(fx.evV1), axis = "h")
        .orderBy("h")
    }),
    // distributed top-k cells: ORDER BY value DESC LIMIT k over the
    // exploded view plans as TakeOrderedAndProject — per-partition
    // top-k partials merged on the driver, never a global sort (the
    // argmax generalization: k extremes WITH their coordinates)
    "q_arr_topk" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      fx.store.reader("ev").onVersion(fx.evV1)
        .exploded("n", Slice(Seq(0L), Seq(fx.hours)))
        .orderBy(col("value").desc, col("h"))
        .limit(12)
    }),
    // axis-collapsing reduction (spark.AxisOps.reduceAxis, xarray
    // reduce(dim=…) analog): the 2-D grid's b axis folds away leaving one
    // (sum, min, max, cnt) row per month — Catalyst's own two-phase
    // HashAggregate gives the per-chunk partial fold, shuffling partials
    // only, never cells
    "q_arr_reduce" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      graft.spark.AxisOps.reduceAxis(s, fx.store.root, "grid", "qty",
          Some(fx.gridV1), axis = "b")
        .orderBy("m")
    }),
    // coordinate-returning reduction (spark.AxisOps.argmaxAxis): the max
    // cell value and the smallest h attaining it — per-chunk partial
    // (max, argmax) pairs, final combine over one pair per chunk
    "q_arr_argmax" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      graft.spark.AxisOps.argmaxAxis(s, fx.store.root, "ev", "n",
          Some(fx.evV1), axis = "h")
    }),
    // zero-copy clone (SparkStore.cloneDataset, the SHALLOW CLONE
    // analog): evc shares ev's chunk blobs (manifests + index copied,
    // no cell data moves), carries its FULL version history (evc@evV1 ≡
    // ev@v1), and diverges independently (444 on [5,15) committed to
    // evc only — ev@latest is untouched); all three reads in one result
    "q_arr_clone" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      ensureCloned(s, fx)
      val lim = Slice(Seq(0L), Seq(40L))
      val src = fx.store.reader("ev").onVersion(fx.evV2)
        .exploded("n", lim).select(col("h"), col("value").as("src_n"))
      val cv1 = fx.store.reader("evc").onVersion(fx.evV1)
        .exploded("n", lim).select(col("h"), col("value").as("clone_v1"))
      val latest = fx.store.versions("evc").head._2
      val cl = fx.store.reader("evc").onVersion(latest)
        .exploded("n", lim).select(col("h"), col("value").as("clone_n"))
      src.join(cv1, "h").join(cl, "h").orderBy("h")
    }),
    // first difference along the axis (spark.AxisOps.diffAxis, xarray
    // diff(dim)): each cell's predecessor arrives via a 1-cell halo (the
    // mirror of interp's successor halo), lag runs inside each
    // (other-coords, chunk) group — one bounded shuffle, no global sort
    "q_arr_axisdiff" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      graft.spark.AxisOps.diffAxis(s, fx.store.root, "ev", "n",
          Some(fx.evV1), axis = "h")
        .orderBy("h")
    }),
    // per-line exact interpolated quantiles (spark.AxisOps.quantileAxis,
    // xarray quantile(dim=…)): quarter-point fractions over integer cells
    // are exactly representable in binary doubles, so the interpolated
    // order statistics hash-match DuckDB's quantile_cont bit-for-bit
    "q_arr_quantile" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      graft.spark.AxisOps.quantileAxis(s, fx.store.root, "grid", "qty",
          Some(fx.gridV1), axis = "b", ps = Seq(0.25, 0.5, 0.75))
        .orderBy("m")
    }),
    // chunk-grid migration (rechunk): ev.n@v1 copied into a NEW dataset
    // with chunk extent 100 (vs the source's 64) through the ordinary
    // exploded-read → DSv2-write path — run coalescing re-slabs the
    // cells, the one-shuffle ingest re-owns them per new-grid chunk.
    // Output pins the new chunk count AND that every cell survived
    "q_arr_rechunk" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      ensureRechunked(s, fx)
      val chunks = s.read.parquet(fx.store.indexDir("rck"))
        .filter(col("var") === "n")
        .agg(countDistinct(col("coordKey")).as("n_chunks"))
      val data = s.read.format("graft").option("root", fx.store.root)
        .option("dataset", "rck").option("variable", "n").load()
        .agg(count(lit(1)).as("n_cells"), sum("value").as("v_sum"))
      chunks.crossJoin(data)
    }),
    // cell-wise binary op between two VARIABLES of one dataset (n + m),
    // joined on (_chunk_h, h) through two chunked scans: the shared
    // KeyGroupedPartitioning co-locates matching chunks, so the join
    // plans WITHOUT any Exchange (storage-partitioned join; plan shape
    // pinned in DataSourceSpec) — fill semantics included, since the
    // scan materializes fill cells for m's unwritten region
    "q_arr_binop" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      def side(v: String) = s.read.format("graft")
        .option("root", fx.store.root).option("dataset", "ev")
        .option("variable", v).option("version", fx.evV1.toString)
        .option("chunked", "true").load()
      side("n").alias("a").join(side("m").alias("b"), Seq("_chunk_h", "h"))
        .select(col("h"), col("a.value").as("n_val"),
          col("b.value").as("m_val"),
          (col("a.value") + col("b.value")).as("v_sum"))
        .orderBy("h")
    }),
    // multi-variable single-pass read (SparkStore.explodedMulti): n and
    // m in ONE wide frame — the k-way join happens at CHUNK level
    // (compressed blobs, one row per covering chunk per variable), each
    // blob decodes once, arrays_zip + one posexplode emits wide cells;
    // no cell-level join, per-variable fill preserved (m is fill −1
    // beyond [0,10))
    "q_arr_multivar" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      fx.store.reader("ev").onVersion(fx.evV1)
        .explodedMulti(Seq("n", "m"), Slice(Seq(0L), Seq(fx.hours)))
        .orderBy("h")
    }),
    // CROSS-GRID arithmetic: ev.n (chunk 64) + rck.n (chunk 100 — the
    // rechunked copy) joined on the bare coordinate. The grids don't
    // align, so no storage-partitioned join applies; the engine falls
    // back to one coordinate-keyed shuffle per side — correct by
    // construction, and the measured case FOR rechunking one side when
    // a cross-grid op repeats. Values double since rck ≡ ev.n@v1
    "q_arr_xgrid" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      ensureRechunked(s, fx)
      def side(ds: String, v: Long) = s.read.format("graft")
        .option("root", fx.store.root).option("dataset", ds)
        .option("variable", "n").option("version", v.toString).load()
      val rckV = fx.store.versions("rck").head._2
      side("ev", fx.evV1).alias("a")
        .join(side("rck", rckV).alias("b"), Seq("h"))
        .select(col("h"), (col("a.value") + col("b.value")).as("v_sum"))
        .orderBy("h")
    }),
    // halo-exchange stencil (spark.Stencil): rolling sum of radius 2
    // along h — windows centered near a chunk face need cells from the
    // NEIGHBORING chunk, delivered by duplicating only the 2-cell halo
    // bands into the adjacent group before the per-chunk local window
    "q_arr_stencil" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      graft.spark.Stencil.rollingAxis(s, fx.store.root, "ev", "n",
          Some(fx.evV1), axis = "h", radius = 2)
        .orderBy("h")
    }),
    // 2-D neighborhood stencil (spark.Stencil.boxSum2d): 3×3 box sum
    // over the month×bucket grid — two-axis halo exchange (faces AND
    // corners via the per-axis target cross product), each chunk group
    // computing its owned cells' boxes locally; one shuffle, no 2-D
    // window bent through 1-D SQL frames
    "q_arr_stencil2d" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      graft.spark.Stencil.boxSum2d(s, fx.store.root, "grid", "qty",
          Some(fx.gridV1), radius = 1)
        .orderBy("m", "b")
    }),
    // cell-level CDC between v1 and v2 (spark.VersionDiff): index-only
    // change detection by content hash — only the single chunk v2
    // rewrote is decoded (structural sharing drops the rest), and only
    // the [25,35) band differs cell-wise
    "q_arr_diff" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      graft.spark.VersionDiff
        .diffCells(fx.store, "ev", "n", fx.evV1, fx.evV2)
        .orderBy("h")
    }),
    // zone-map VALUE-predicate chunk skipping through the DSv2 source:
    // `value >= 999` can only hold inside the 999-overlay band (plus any
    // hour whose raw count reaches 999), so planning drops every chunk
    // whose index stats prove no cell can match — the filter is applied
    // exactly above the scan either way (AggSkipSpec pins the plan-time
    // skip; this gate pins the semantics against the events ground truth)
    "q_arr_skip" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      s.read.format("graft").option("root", fx.store.root)
        .option("dataset", "ev").option("variable", "n")
        .option("version", fx.evV1.toString).load()
        .filter(col("value") >= 999L)
        .select(col("h"), col("value"))
        .orderBy("h")
    }),
    // the SQL front door: the same 2-D slice as q_arr_2d, but routed
    // through the GraftCatalog plugin — `SELECT … FROM <cat>.grid.qty
    // VERSION AS OF <v>` with dim-filter pushdown intact. The catalog
    // name is derived from the store root (catalog instances are cached
    // per session once referenced; a fresh root needs a fresh name).
    "q_arr_sql" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val cat = "graft_" +
        java.lang.Integer.toHexString(fx.store.root.hashCode & 0x7fffffff)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.source.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", fx.store.root)
      s.sql(s"""SELECT m, b, value FROM $cat.grid.qty VERSION AS OF ${fx.gridV1}
        WHERE m >= 2 AND m < 12 AND b >= 1 AND b < 6 ORDER BY m, b""")
    }),
    // V5 through the SQL front door: `TIMESTAMP AS OF` the v1 commit
    // instant resolves to the newest version at-or-before it — same
    // [20,40) window and era as q_arr_timetravel, routed via the catalog
    "q_arr_sql_timetravel" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val cat = "graft_" +
        java.lang.Integer.toHexString(fx.store.root.hashCode & 0x7fffffff)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.source.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", fx.store.root)
      val v1ts = fx.store.versions("ev").find(_._2 == fx.evV1).get._1
      val iso = java.time.Instant.ofEpochMilli(v1ts).toString
      s.sql(s"""SELECT h, value FROM $cat.ev.n TIMESTAMP AS OF '$iso'
        WHERE h >= 20 AND h < 40 ORDER BY h""")
    }),
    // SQL schema evolution end-to-end (reference grow semantics,
    // src/io/mandoline/test/grow.clj:56-71, through the catalog): create +
    // ingest a counts variable via pure SQL, grow its dimension with
    // ALTER TABLE, then read BOTH eras in one result — the latest version
    // sees retained data plus fill in the newly exposed region, and
    // VERSION AS OF the pre-grow version still reads the old shape.
    // Fixture work happens once per JVM (guarded); re-runs only read.
    "q_arr_sql_evolve" -> ((s, dir) => {
      val fx = ArrayFixtures.get(s, dir)
      val h = fx.hours
      val cat = "graft_" +
        java.lang.Integer.toHexString(fx.store.root.hashCode & 0x7fffffff)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.source.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", fx.store.root)
      if (!fx.store.datasetExists("sqlev")) {
        import s.implicits._
        ArrayFixtures.hourCounts(s, dir).toIndexedSeq.zipWithIndex
          .map { case (c, i) => (i.toLong, c) }
          .toDF("h", "value").createOrReplaceTempView("sqlev_src")
        s.sql(s"""CREATE TABLE $cat.sqlev.e (h BIGINT, value BIGINT)
          TBLPROPERTIES ('dims' = 'h:$h:64', 'fill' = '-1')""")
        s.sql(s"INSERT INTO $cat.sqlev.e SELECT h, value FROM sqlev_src")
        s.sql(s"ALTER TABLE $cat.sqlev.e SET TBLPROPERTIES ('dims' = 'h:${h + 20}')")
      }
      // versions reverse-chron: [alter, insert, create-ddl]
      val preGrow = fx.store.versions("sqlev")(1)._2
      s.sql(s"""
        SELECT 'pre' AS era, h, value FROM $cat.sqlev.e VERSION AS OF $preGrow
          WHERE h >= ${h - 5}
        UNION ALL
        SELECT 'post' AS era, h, value FROM $cat.sqlev.e WHERE h >= ${h - 5}
        ORDER BY era, h""")
    }))

  private lazy val streamIngestSql = cte +
    """SELECT g.h AS h, COALESCE(c.cnt, -1) AS value, true AS multi_version
      |""".stripMargin + grid +
    " WHERE g.h < (SELECT maxh FROM hh) ORDER BY h"

  val oracleSql: Map[String, String] = Map(
    "q_arr_slice" -> (cte +
      """SELECT g.h AS h,
        | CASE WHEN g.h >= 25 AND g.h < 35 THEN 777
        |      WHEN g.h >= 20 AND g.h < 25 THEN 999
        |      ELSE COALESCE(c.cnt, 0) END AS value
        |""".stripMargin + grid + " WHERE g.h >= 10 AND g.h < 40 ORDER BY h"),
    "q_arr_fsroot" -> (cte +
      """SELECT g.h AS h,
        | CASE WHEN g.h >= 25 AND g.h < 35 THEN 777
        |      WHEN g.h >= 20 AND g.h < 25 THEN 999
        |      ELSE COALESCE(c.cnt, 0) END AS value
        |""".stripMargin + grid + " WHERE g.h >= 10 AND g.h < 40 ORDER BY h"),
    "q_arr_sel" -> (cte +
      """SELECT g.h AS h, CAST(100 + 10 * g.h AS BIGINT) AS label,
        | COALESCE(c.cnt, 0) AS value
        |""".stripMargin + grid + " WHERE g.h >= 5 AND g.h < 25 ORDER BY h"),
    "q_arr_merge" -> (cte +
      """SELECT g.h AS h,
        | CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |      ELSE COALESCE(c.cnt, 0) END AS value
        |""".stripMargin + grid + " WHERE g.h >= 15 AND g.h < 35 ORDER BY h"),
    "q_arr_fill" -> (cte +
      """SELECT g.h AS h,
        | CASE WHEN g.h < 10 THEN COALESCE(c.cnt, 0) ELSE -1 END AS value
        |""".stripMargin + grid + " WHERE g.h >= 0 AND g.h < 30 ORDER BY h"),
    "q_arr_timetravel" -> (cte +
      """SELECT g.h AS h,
        | CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |      ELSE COALESCE(c.cnt, 0) END AS value
        |""".stripMargin + grid + " WHERE g.h >= 20 AND g.h < 40 ORDER BY h"),
    // identical ground truth to q_arr_timetravel — only the ROUTE differs
    // (SQL catalog TIMESTAMP AS OF vs the reader API's onVersion)
    "q_arr_sql_timetravel" -> (cte +
      """SELECT g.h AS h,
        | CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |      ELSE COALESCE(c.cnt, 0) END AS value
        |""".stripMargin + grid + " WHERE g.h >= 20 AND g.h < 40 ORDER BY h"),
    "q_arr_abort" -> (cte +
      """SELECT g.h AS h,
        | CASE WHEN g.h >= 25 AND g.h < 35 THEN 777
        |      WHEN g.h >= 20 AND g.h < 25 THEN 999
        |      ELSE COALESCE(c.cnt, 0) END AS value
        |""".stripMargin + grid + " WHERE g.h >= 20 AND g.h < 40 ORDER BY h"),
    "q_arr_grow" -> (cte +
      """SELECT g.h AS h,
        | CASE WHEN g.h < (SELECT maxh FROM hh) THEN COALESCE(c.cnt, 0) ELSE -1 END AS value
        |""".stripMargin + grid +
      " WHERE g.h >= (SELECT maxh - 5 FROM hh) AND g.h < (SELECT maxh + 24 FROM hh) ORDER BY h"),
    "q_arr_shrink" -> (cte +
      """SELECT g.h AS h, COALESCE(c.cnt, 0) AS value, true AS old_extent_rejected
        |""".stripMargin + grid +
      " WHERE g.h >= (SELECT maxh - 36 FROM hh) AND g.h < (SELECT maxh - 16 FROM hh) ORDER BY h"),
    "q_arr_regrow" -> (cte +
      """SELECT 'v1' AS era, g.h AS h, COALESCE(c.cnt, 0) AS value
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h >= (SELECT maxh - 5 FROM hh) AND g.h < (SELECT maxh FROM hh)
        |UNION ALL
        |SELECT 'v2' AS era, g.h AS h,
        | CASE WHEN g.h < (SELECT maxh FROM hh) THEN COALESCE(c.cnt, 0)
        |      WHEN g.h < (SELECT maxh + 8 FROM hh) THEN 555
        |      ELSE -1 END AS value
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h >= (SELECT maxh - 5 FROM hh) AND g.h < (SELECT maxh + 24 FROM hh)
        |UNION ALL
        |SELECT 'v3' AS era, g.h AS h, COALESCE(c.cnt, 0) AS value
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h >= (SELECT maxh - 36 FROM hh) AND g.h < (SELECT maxh - 16 FROM hh)
        |ORDER BY era, h""".stripMargin),
    "q_arr_vacuum" ->
      """SELECT g.h AS h, CAST(7 AS BIGINT) AS value, true AS reclaimed
        |FROM range(0, 20) g(h) ORDER BY h""".stripMargin,
    "q_arr_compact" ->
      """SELECT g.h AS h,
        | CAST(CASE WHEN g.h >= 16 AND g.h < 32 THEN 3*g.h + 1
        |           ELSE 2*g.h END AS BIGINT) AS value,
        | true AS expired, true AS reclaimed
        |FROM range(0, 48) g(h) ORDER BY h""".stripMargin,
    // streaming ingest: cumulative per-hour counts at the latest version;
    // zero-event hours were never written → fill −1 (the fstream twin
    // shares the oracle verbatim: engine/feed choice must be invisible)
    "q_arr_stream_ingest" -> streamIngestSql,
    "q_arr_stream_ingest_fstream" -> streamIngestSql,
    "q_arr_scalar" -> "SELECT count(*) AS value FROM events",
    // rank-5 closed-form ground truth: v2 box first (overlap winner),
    // then v1 box, else fill — lin = 420a+84b+21c+7d+e
    "q_arr_5d" ->
      """SELECT ga.a AS a, gb.b AS b, gc.c AS c, gd.d AS d, ge.e AS e,
        | CAST(CASE
        |  WHEN ga.a >= 2 AND ga.a < 5 AND gb.b >= 1 AND gb.b < 4
        |   AND gc.c >= 1 AND gc.c < 3 AND gd.d < 2 AND ge.e >= 3
        |  THEN 1000 + (420*ga.a + 84*gb.b + 21*gc.c + 7*gd.d + ge.e)
        |  WHEN ge.e < 5
        |  THEN 1 + (420*ga.a + 84*gb.b + 21*gc.c + 7*gd.d + ge.e)
        |  ELSE -1 END AS BIGINT) AS value
        |FROM range(1,6) ga(a)
        |CROSS JOIN range(0,5) gb(b)
        |CROSS JOIN range(0,4) gc(c)
        |CROSS JOIN range(0,3) gd(d)
        |CROSS JOIN range(2,7) ge(e)
        |ORDER BY 1,2,3,4,5""".stripMargin,
    "q_arr_stride" ->
      """SELECT ga.a AS a, gb.b AS b, gc.c AS c, gd.d AS d, ge.e AS e,
        | CAST(CASE
        |  WHEN ga.a >= 2 AND ga.a < 5 AND gb.b >= 1 AND gb.b < 4
        |   AND gc.c >= 1 AND gc.c < 3 AND gd.d < 2 AND ge.e >= 3
        |  THEN 1000 + (420*ga.a + 84*gb.b + 21*gc.c + 7*gd.d + ge.e)
        |  WHEN ge.e < 5
        |  THEN 1 + (420*ga.a + 84*gb.b + 21*gc.c + 7*gd.d + ge.e)
        |  ELSE -1 END AS BIGINT) AS value
        |FROM range(0,6,2) ga(a)
        |CROSS JOIN range(1,5,3) gb(b)
        |CROSS JOIN range(0,4,3) gc(c)
        |CROSS JOIN range(0,3,2) gd(d)
        |CROSS JOIN range(2,7,4) ge(e)
        |ORDER BY 1,2,3,4,5""".stripMargin,
    "q_arr_2d" ->
      """WITH lb AS (
        | SELECT (year(l_shipdate) * 12 + month(l_shipdate)) AS am,
        |        l_partkey % 8 AS b, l_quantity
        | FROM lineitem),
        |mn AS (SELECT min(am) AS m0, max(am) - min(am) + 1 AS nm FROM lb),
        |g AS (SELECT am - (SELECT m0 FROM mn) AS m, b,
        |        CAST(sum(l_quantity) AS BIGINT) AS q
        |      FROM lb GROUP BY 1, 2)
        |SELECT gm.m AS m, gb.b AS b, COALESCE(g.q, 0) AS value
        |FROM range(0, 10000) gm(m)
        |CROSS JOIN range(0, 8) gb(b)
        |LEFT JOIN g ON g.m = gm.m AND g.b = gb.b
        |WHERE gm.m >= 2 AND gm.m < least(12, (SELECT nm FROM mn))
        |  AND gb.b >= 1 AND gb.b < 6
        |ORDER BY m, b""".stripMargin,
    "q_arr_nan" -> (cte +
      """SELECT CAST(5 AS BIGINT) AS nan_cells,
        | (SELECT CAST(COALESCE(sum(CASE WHEN h < 5 THEN cnt ELSE 0 END), 0) AS DOUBLE) FROM c) AS sum_vals
        |""".stripMargin),
    "q_arr_versions" ->
      "SELECT * FROM (VALUES (CAST(0 AS BIGINT), true), (CAST(1 AS BIGINT), false)) t(ord, has_parent) ORDER BY ord",
    "q_arr_dedup" ->
      "SELECT CAST(50 AS BIGINT) AS n_chunks, CAST(1 AS BIGINT) AS n_blobs",
    "q_arr_stats" -> (cte +
      """, vn AS (SELECT CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |                     ELSE COALESCE(c.cnt, 0) END AS v
        |  FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |  WHERE g.h < (SELECT maxh FROM hh)),
        |vm AS (SELECT CASE WHEN g.h < 10 THEN COALESCE(c.cnt, 0) ELSE -1 END AS v
        |  FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |  WHERE g.h < (SELECT maxh FROM hh))
        |SELECT 'm' AS varname, CAST(min(v) AS BIGINT) AS vmin,
        |       CAST(max(v) AS BIGINT) AS vmax, CAST(sum(v) AS BIGINT) AS vsum,
        |       CAST(count(*) AS BIGINT) AS vcnt FROM vm
        |UNION ALL
        |SELECT 'n', CAST(min(v) AS BIGINT), CAST(max(v) AS BIGINT),
        |       CAST(sum(v) AS BIGINT), CAST(count(*) AS BIGINT) FROM vn
        |ORDER BY varname""".stripMargin),
    "q_arr_sql_delete" -> (cte +
      """SELECT 'post' AS era, g.h AS h,
        | CASE WHEN g.h >= 10 AND g.h < 20 THEN -1
        |      ELSE COALESCE(c.cnt, 0) END AS value
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h < 25
        |UNION ALL
        |SELECT 'pre' AS era, g.h AS h, COALESCE(c.cnt, 0) AS value
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h < 25
        |ORDER BY era, h""".stripMargin),
    "q_arr_coarsen" -> (cte +
      """, v AS (
        | SELECT g.h AS h,
        |  CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |       ELSE COALESCE(c.cnt, 0) END AS value
        | FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        | WHERE g.h < (SELECT maxh FROM hh))
        |SELECT h // 8 AS h_c, CAST(sum(value) AS BIGINT) AS v_sum,
        | CAST(count(*) AS BIGINT) AS n_cells,
        | min(value) AS v_min, max(value) AS v_max
        |FROM v GROUP BY 1 ORDER BY h_c""".stripMargin),
    "q_arr_tensors" -> (cte +
      """, v AS (
        | SELECT g.h AS h,
        |  CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |       ELSE COALESCE(c.cnt, 0) END AS value
        | FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        | WHERE g.h < (SELECT maxh FROM hh))
        |SELECT h // 64 AS c,
        | CAST(count(*) OVER (PARTITION BY h // 64) AS BIGINT) AS n_cells,
        | CAST(h % 64 AS INT) AS pos, value
        |FROM v ORDER BY c, pos""".stripMargin),
    "q_arr_rollup_incr" -> (cte +
      """, v AS (
        | SELECT g.h AS h,
        |  CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |       ELSE COALESCE(c.cnt, 0) END AS value
        | FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        | WHERE g.h < (SELECT maxh FROM hh))
        |SELECT h // 8 AS h_c, CAST(sum(value) AS BIGINT) AS v_sum,
        | CAST(count(*) AS BIGINT) AS n_cells
        |FROM v GROUP BY 1 ORDER BY h_c""".stripMargin),
    "q_arr_sql_ctas" -> (cte +
      """SELECT g.h AS h, COALESCE(c.cnt, 0) AS value
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h < 25 ORDER BY h""".stripMargin),
    "q_arr_derived" -> (cte +
      """SELECT g.h AS h, COALESCE(c.cnt, 0) AS src,
        | COALESCE(c.cnt, 0) * 2 + 1 AS derived
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h < 25 ORDER BY h""".stripMargin),
    "q_arr_cumsum" -> (cte +
      """, v AS (
        | SELECT g.h AS h,
        |  CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |       ELSE COALESCE(c.cnt, 0) END AS value
        | FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        | WHERE g.h < (SELECT maxh FROM hh))
        |SELECT h, CAST(sum(value) OVER (ORDER BY h
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |FROM v ORDER BY h""".stripMargin),
    "q_arr_interp" -> (cte +
      """, v AS (
        | SELECT g.h AS h,
        |  CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |       ELSE COALESCE(c.cnt, 0) END AS value
        | FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        | WHERE g.h < (SELECT maxh FROM hh)),
        |o AS (SELECT unnest(range((SELECT (maxh - 1) * 4 + 1 FROM hh))) AS i)
        |SELECT o.i AS h,
        | ((4 - (o.i % 4)) * a.value + (o.i % 4) * COALESCE(b.value, a.value)) // 4 AS value
        |FROM o JOIN v a ON a.h = o.i // 4
        | LEFT JOIN v b ON b.h = o.i // 4 + 1
        |ORDER BY h""".stripMargin),
    // identical grid ground truth to q_arr_2d, box-neighborhood
    // self-join per cell
    "q_arr_stencil2d" ->
      """WITH lb AS (
        | SELECT (year(l_shipdate) * 12 + month(l_shipdate)) AS am,
        |        l_partkey % 8 AS b, l_quantity
        | FROM lineitem),
        |mn AS (SELECT min(am) AS m0, max(am) - min(am) + 1 AS nm FROM lb),
        |g AS (SELECT am - (SELECT m0 FROM mn) AS m, b,
        |        CAST(sum(l_quantity) AS BIGINT) AS q
        |      FROM lb GROUP BY 1, 2),
        |v AS (SELECT gm.m AS m, gb.b AS b, COALESCE(g.q, 0) AS value
        |      FROM range(0, 10000) gm(m)
        |      CROSS JOIN range(0, 8) gb(b)
        |      LEFT JOIN g ON g.m = gm.m AND g.b = gb.b
        |      WHERE gm.m < (SELECT nm FROM mn))
        |SELECT a.m AS m, a.b AS b,
        | CAST(sum(nb.value) AS BIGINT) AS v_sum,
        | count(*) AS n_win
        |FROM v a JOIN v nb
        |  ON nb.m BETWEEN a.m - 1 AND a.m + 1
        | AND nb.b BETWEEN a.b - 1 AND a.b + 1
        |GROUP BY 1, 2 ORDER BY m, b""".stripMargin,
    // identical grid ground truth to q_arr_2d, then the b axis folds away
    "q_arr_reduce" ->
      """WITH lb AS (
        | SELECT (year(l_shipdate) * 12 + month(l_shipdate)) AS am,
        |        l_partkey % 8 AS b, l_quantity
        | FROM lineitem),
        |mn AS (SELECT min(am) AS m0, max(am) - min(am) + 1 AS nm FROM lb),
        |g AS (SELECT am - (SELECT m0 FROM mn) AS m, b,
        |        CAST(sum(l_quantity) AS BIGINT) AS q
        |      FROM lb GROUP BY 1, 2),
        |v AS (SELECT gm.m AS m, gb.b AS b, COALESCE(g.q, 0) AS value
        |      FROM range(0, 10000) gm(m)
        |      CROSS JOIN range(0, 8) gb(b)
        |      LEFT JOIN g ON g.m = gm.m AND g.b = gb.b
        |      WHERE gm.m < (SELECT nm FROM mn))
        |SELECT m, CAST(sum(value) AS BIGINT) AS v_sum,
        | CAST(min(value) AS BIGINT) AS v_min,
        | CAST(max(value) AS BIGINT) AS v_max,
        | count(*) AS v_cnt
        |FROM v GROUP BY m ORDER BY m""".stripMargin,
    "q_arr_argmax" -> (cte +
      """, v AS (
        | SELECT g.h AS h,
        |  CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |       ELSE COALESCE(c.cnt, 0) END AS value
        | FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        | WHERE g.h < (SELECT maxh FROM hh))
        |SELECT max(value) AS v_max,
        | CAST((SELECT min(h) FROM v WHERE value = (SELECT max(value) FROM v))
        |   AS BIGINT) AS h_argmax
        |FROM v""".stripMargin),
    "q_arr_clone" -> (cte +
      """SELECT g.h AS h,
        | CASE WHEN g.h >= 25 AND g.h < 35 THEN 777
        |      WHEN g.h >= 20 AND g.h < 25 THEN 999
        |      ELSE COALESCE(c.cnt, 0) END AS src_n,
        | CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |      ELSE COALESCE(c.cnt, 0) END AS clone_v1,
        | CASE WHEN g.h >= 5 AND g.h < 15 THEN 444
        |      WHEN g.h >= 25 AND g.h < 35 THEN 777
        |      WHEN g.h >= 20 AND g.h < 25 THEN 999
        |      ELSE COALESCE(c.cnt, 0) END AS clone_n
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h < 40 ORDER BY h""".stripMargin),
    "q_arr_axisdiff" -> (cte +
      """, v AS (
        | SELECT g.h AS h,
        |  CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |       ELSE COALESCE(c.cnt, 0) END AS value
        | FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        | WHERE g.h < (SELECT maxh FROM hh)),
        |d AS (SELECT h, value - lag(value) OVER (ORDER BY h) AS diff FROM v)
        |SELECT h, diff FROM d WHERE diff IS NOT NULL ORDER BY h""".stripMargin),
    "q_arr_quantile" ->
      """WITH lb AS (
        | SELECT (year(l_shipdate) * 12 + month(l_shipdate)) AS am,
        |        l_partkey % 8 AS b, l_quantity
        | FROM lineitem),
        |mn AS (SELECT min(am) AS m0, max(am) - min(am) + 1 AS nm FROM lb),
        |g AS (SELECT am - (SELECT m0 FROM mn) AS m, b,
        |        CAST(sum(l_quantity) AS BIGINT) AS q
        |      FROM lb GROUP BY 1, 2),
        |v AS (SELECT gm.m AS m, gb.b AS b, COALESCE(g.q, 0) AS value
        |      FROM range(0, 10000) gm(m)
        |      CROSS JOIN range(0, 8) gb(b)
        |      LEFT JOIN g ON g.m = gm.m AND g.b = gb.b
        |      WHERE gm.m < (SELECT nm FROM mn))
        |SELECT m, quantile_cont(value, 0.25) AS q25,
        | quantile_cont(value, 0.5) AS q50,
        | quantile_cont(value, 0.75) AS q75
        |FROM v GROUP BY m ORDER BY m""".stripMargin,
    "q_arr_rechunk" -> (cte +
      """SELECT CAST(ceil((SELECT maxh FROM hh) / 100.0) AS BIGINT) AS n_chunks,
        | (SELECT maxh FROM hh) AS n_cells,
        | CAST((SELECT sum(CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |                       ELSE COALESCE(c.cnt, 0) END)
        |  FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |  WHERE g.h < (SELECT maxh FROM hh)) AS BIGINT) AS v_sum""".stripMargin),
    "q_arr_ffill" -> (cte +
      """, v AS (
        | SELECT g.h AS h,
        |  CASE WHEN g.h < 10 THEN COALESCE(c.cnt, 0) ELSE -1 END AS value,
        |  CASE WHEN g.h < 10 THEN COALESCE(c.cnt, 0) END AS nf
        | FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        | WHERE g.h < (SELECT maxh FROM hh))
        |SELECT h, value,
        | COALESCE(last_value(nf IGNORE NULLS) OVER (ORDER BY h
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS filled
        |FROM v ORDER BY h""".stripMargin),
    "q_arr_topk" -> (cte +
      """SELECT g.h AS h,
        | CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |      ELSE COALESCE(c.cnt, 0) END AS value
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h < (SELECT maxh FROM hh)
        |ORDER BY value DESC, h LIMIT 12""".stripMargin),
    "q_arr_multivar" -> (cte +
      """SELECT g.h AS h,
        | CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |      ELSE COALESCE(c.cnt, 0) END AS n,
        | CASE WHEN g.h < 10 THEN COALESCE(c.cnt, 0) ELSE -1 END AS m
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h < (SELECT maxh FROM hh) ORDER BY h""".stripMargin),
    "q_arr_xgrid" -> (cte +
      """SELECT g.h AS h,
        | CAST(2 * (CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |                ELSE COALESCE(c.cnt, 0) END) AS BIGINT) AS v_sum
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h < (SELECT maxh FROM hh) ORDER BY h""".stripMargin),
    "q_arr_binop" -> (cte +
      """, nn AS (
        | SELECT g.h AS h,
        |  CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |       ELSE COALESCE(c.cnt, 0) END AS n_val,
        |  CASE WHEN g.h < 10 THEN COALESCE(c.cnt, 0) ELSE -1 END AS m_val
        | FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        | WHERE g.h < (SELECT maxh FROM hh))
        |SELECT h, n_val, m_val, n_val + m_val AS v_sum
        |FROM nn ORDER BY h""".stripMargin),
    "q_arr_stencil" -> (cte +
      """, v AS (
        | SELECT g.h AS h,
        |  CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |       ELSE COALESCE(c.cnt, 0) END AS value
        | FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        | WHERE g.h < (SELECT maxh FROM hh))
        |SELECT h, CAST(sum(value) OVER w AS BIGINT) AS v_sum,
        | CAST(count(*) OVER w AS BIGINT) AS n_win
        |FROM v
        |WINDOW w AS (ORDER BY h RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        |ORDER BY h""".stripMargin),
    "q_arr_sql_update" -> (cte +
      """SELECT 'post' AS era, g.h AS h,
        | CASE WHEN g.h >= 10 AND g.h < 20 THEN COALESCE(c.cnt, 0) * 3 + 1
        |      ELSE COALESCE(c.cnt, 0) END AS value
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h < 25
        |UNION ALL
        |SELECT 'pre' AS era, g.h AS h, COALESCE(c.cnt, 0) AS value
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h < 25
        |ORDER BY era, h""".stripMargin),
    "q_arr_sql_merge" -> (cte +
      """SELECT 'post' AS era, g.h AS h,
        | CASE WHEN g.h >= 5 AND g.h < 15 THEN
        |   CASE WHEN COALESCE(c.cnt, 0) % 2 = 0 THEN -1
        |        ELSE COALESCE(c.cnt, 0) * 10 END
        | ELSE COALESCE(c.cnt, 0) END AS value
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h < 25
        |UNION ALL
        |SELECT 'pre' AS era, g.h AS h, COALESCE(c.cnt, 0) AS value
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h < 25
        |ORDER BY era, h""".stripMargin),
    "q_arr_sql_overwrite" -> (cte +
      """SELECT 'post' AS era, g.h AS h,
        | CASE WHEN g.h >= 5 AND g.h < 15 THEN 555 ELSE -1 END AS value
        |FROM range(0,1000000) g(h) WHERE g.h < 25
        |UNION ALL
        |SELECT 'pre' AS era, g.h AS h, COALESCE(c.cnt, 0) AS value
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h < 25
        |ORDER BY era, h""".stripMargin),
    // old = v1 overlay (999 band then counts), new = 777 on [25,35);
    // cells already equal (a count happening to be 777) drop from BOTH
    // sides of the compare identically
    "q_arr_diff" -> (cte +
      """, dv AS (
        | SELECT g.h AS h,
        |  CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |       ELSE COALESCE(c.cnt, 0) END AS old_value,
        |  CAST(777 AS BIGINT) AS new_value
        | FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        | WHERE g.h >= 25 AND g.h < 35)
        |SELECT h, old_value, new_value FROM dv
        |WHERE old_value <> new_value ORDER BY h""".stripMargin),
    "q_arr_skip" -> (cte +
      """, vv AS (
        | SELECT g.h AS h,
        |  CASE WHEN g.h >= 20 AND g.h < 30 THEN 999
        |       ELSE COALESCE(c.cnt, 0) END AS value
        | FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        | WHERE g.h < (SELECT maxh FROM hh))
        |SELECT h, value FROM vv WHERE value >= 999 ORDER BY h""".stripMargin),
    "q_arr_chunked" ->
      """WITH lb AS (
        | SELECT (year(l_shipdate) * 12 + month(l_shipdate)) AS am,
        |        l_partkey % 8 AS b, l_quantity
        | FROM lineitem),
        |mn AS (SELECT min(am) AS m0, max(am) - min(am) + 1 AS nm FROM lb),
        |g AS (SELECT am - (SELECT m0 FROM mn) AS m, b,
        |        CAST(sum(l_quantity) AS BIGINT) AS q
        |      FROM lb GROUP BY 1, 2),
        |cells AS (
        | SELECT gm.m AS m, gb.b AS b, COALESCE(g.q, 0) AS v
        | FROM range(0, 10000) gm(m) CROSS JOIN range(0, 8) gb(b)
        | LEFT JOIN g ON g.m = gm.m AND g.b = gb.b
        | WHERE gm.m < (SELECT nm FROM mn))
        |SELECT m // 4 AS cm, b // 4 AS cb,
        |       CAST(sum(v) AS BIGINT) AS qty_sum,
        |       CAST(count(*) AS BIGINT) AS n_cells
        |FROM cells GROUP BY 1, 2 ORDER BY cm, cb""".stripMargin,
    // identical ground truth to q_arr_2d — the Spark side differs only in
    // ROUTE (SQL catalog + VERSION AS OF instead of the reader API)
    "q_arr_sql" ->
      """WITH lb AS (
        | SELECT (year(l_shipdate) * 12 + month(l_shipdate)) AS am,
        |        l_partkey % 8 AS b, l_quantity
        | FROM lineitem),
        |mn AS (SELECT min(am) AS m0, max(am) - min(am) + 1 AS nm FROM lb),
        |g AS (SELECT am - (SELECT m0 FROM mn) AS m, b,
        |        CAST(sum(l_quantity) AS BIGINT) AS q
        |      FROM lb GROUP BY 1, 2)
        |SELECT gm.m AS m, gb.b AS b, COALESCE(g.q, 0) AS value
        |FROM range(0, 10000) gm(m)
        |CROSS JOIN range(0, 8) gb(b)
        |LEFT JOIN g ON g.m = gm.m AND g.b = gb.b
        |WHERE gm.m >= 2 AND gm.m < least(12, (SELECT nm FROM mn))
        |  AND gb.b >= 1 AND gb.b < 6
        |ORDER BY m, b""".stripMargin,
    // both eras of the SQL-evolved variable: pre-grow = counts on the old
    // extent's tail; post-grow = the same tail plus 20 fill cells
    "q_arr_sql_evolve" -> (cte +
      """SELECT 'pre' AS era, g.h AS h, COALESCE(c.cnt, 0) AS value
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h >= (SELECT maxh - 5 FROM hh) AND g.h < (SELECT maxh FROM hh)
        |UNION ALL
        |SELECT 'post' AS era, g.h AS h,
        | CASE WHEN g.h < (SELECT maxh FROM hh) THEN COALESCE(c.cnt, 0) ELSE -1 END AS value
        |FROM range(0,1000000) g(h) LEFT JOIN c ON c.h = g.h
        |WHERE g.h >= (SELECT maxh - 5 FROM hh) AND g.h < (SELECT maxh + 20 FROM hh)
        |ORDER BY era, h""".stripMargin))
}
