package graft

import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import graft.spark.{SparkStore, StoreFs}
import org.scalatest.funsuite.AnyFunSuite

/** OPT-IN conformance run against a REAL object store.
  *
  * MockObjectStoreFileSystem emulates the semantics that matter to the
  * store protocol (rename = copy+delete, LIST-after-PUT visibility lag,
  * no atomic create, coarse mtimes) — but an emulation is itself a
  * claim. This suite re-runs the core protocol shapes against a real
  * endpoint so the emulation can be validated whenever one exists:
  *
  * ```
  * GRAFT_S3A_TEST_ENDPOINT=s3a://bucket/prefix sbt "testOnly graft.RealObjectStoreSpec"
  * ```
  *
  * Requirements when opted in: the hadoop-aws connector (+ AWS SDK
  * bundle) on the test classpath — it does NOT ship in this Spark
  * distribution — and credentials via the usual hadoop-aws mechanisms
  * (env vars, instance profile, or per-bucket conf). Any scheme whose
  * Hadoop FileSystem is on the classpath works (s3a, gs, abfs…): the
  * endpoint string is used verbatim as the store root. Without the env
  * var every test CANCELS cleanly (offline CI stays green); with it,
  * failures are real failures — including a missing connector jar.
  *
  * The mockfs-only behaviors (injected visibility lag, crash injection,
  * rename counting) stay in MockFsSpec: a real store's lag cannot be
  * scheduled. What CAN be validated here is that the protocol converges
  * on whatever semantics the real store has: lifecycle + MVCC overlay,
  * time travel, the commit protocol's fork defense under a real commit
  * race, and dangling-orphan refusal.
  *
  * OFFLINE STAND-IN (round 18): with no endpoint configured the suite no
  * longer cancels — it runs against the in-process loopback-HTTP object
  * store (`hos://127.0.0.1:<port>`, graft.testfs.InProcessObjectStoreServer):
  * server-held state reached only over real sockets, whole-object PUT/
  * GET/DELETE, per-object-atomic visibility, check-then-act create,
  * copy+delete rename. A configured real endpoint always takes
  * precedence — the env var remains the opt-in for true remote runs.
  */
class RealObjectStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val endpoint: String = sys.env.get("GRAFT_S3A_TEST_ENDPOINT")
    .orElse(sys.props.get("graft.s3a.test.endpoint"))
    .getOrElse {
      spark // the session must exist first: hos resolves via its conf
      graft.testfs.InProcessObjectStoreServer.endpoint()
    }

  /** Fresh per-test root under the endpoint (real if configured, the
    * loopback stand-in otherwise — never cancels). */
  private def realRoot(): String =
    s"${endpoint.stripSuffix("/")}/graft-conf-${java.util.UUID.randomUUID}"

  private def meta1d(n: Long = 10L, chunk: Long = 4L) = DatasetMeta(
    dimensions = Map("x" -> n), chunkDimensions = Map("x" -> chunk),
    variables = Map("v" -> VariableDef("long", Vector("x"), -1.0)))

  private def writeVals(store: SparkStore, ds: String,
      vals: Seq[Double], at: Long = 0L): Long = {
    val w = store.addVersion(ds, meta1d())
    w.write("v", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(at), Seq(at + vals.length)), vals)))
    w.finishVersion()
  }

  private def readAll(store: SparkStore, ds: String, vid: Long): Map[Long, Long] =
    store.reader(ds).onVersion(vid)
      .exploded("v", Slice(Seq(0L), Seq(10L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("lifecycle over the real store: write, MVCC overlay, time travel, " +
      "destroy") {
    val store = new SparkStore(spark, realRoot())
    store.create("ds")
    try {
      val v1 = writeVals(store, "ds", (1 to 10).map(_.toDouble))
      val v2 = writeVals(store, "ds", Seq(99.0, 99.0, 99.0), at = 2L)
      assert(readAll(store, "ds", v1) ==
        (0L until 10L).map(x => x -> (x + 1)).toMap)
      val at2 = readAll(store, "ds", v2)
      assert(at2(2L) == 99L && at2(4L) == 99L && at2(5L) == 6L)
      assert(store.versions("ds").map(_._2) == Seq(v2, v1))
      // point-GET pinned read (the consistency class the commit protocol
      // itself relies on) resolves both versions
      assert(store.reader("ds").onVersion(v1).meta.versionId.contains(v1))
    } finally store.destroy("ds")
    assert(!store.datasetExists("ds"))
  }

  test("real commit race: two committers, one parent — at most one child " +
      "survives the fork verify") {
    val store = new SparkStore(spark, realRoot())
    store.create("race")
    try {
      val v0 = writeVals(store, "race", (1 to 10).map(_.toDouble))
      val wA = store.addVersion("race", meta1d())
      val wB = store.addVersion("race", meta1d())
      wA.write("v", Seq(Slab.fromDoubles(DType.LONG,
        Slice(Seq(0L), Seq(5L)), (0 until 5).map(_ => 7.0))))
      wB.write("v", Seq(Slab.fromDoubles(DType.LONG,
        Slice(Seq(5L), Seq(10L)), (0 until 5).map(_ => 8.0))))
      val results = Seq(wA, wB).par(w =>
        try Right(w.finishVersion()) catch { case t: Throwable => Left(t) })
      val committed = results.collect { case Right(v) => v }
      assert(committed.size == 1,
        s"exactly one of two same-parent committers must survive: $results")
      val losers = results.collect { case Left(t) => t }
      assert(losers.forall(_.getMessage.contains("re-run addVersion")),
        s"the loser must be told to rebase: $losers")
      assert(store.versions("race").map(_._2) == Seq(committed.head, v0))
    } finally store.destroy("race")
  }

  test("dangling-parent orphaning holds on the real store: deleting a " +
      "mid-chain manifest orphans its descendants from listing AND " +
      "explicit-vid reads") {
    val store = new SparkStore(spark, realRoot())
    store.create("dang")
    try {
      val v0 = writeVals(store, "dang", (1 to 10).map(_.toDouble))
      val vA = writeVals(store, "dang", (2 to 11).map(_.toDouble))
      val vB = writeVals(store, "dang", (3 to 12).map(_.toDouble))
      val versionsDir = StoreFs.child(
        StoreFs.child(store.root, "dang"), "versions")
      StoreFs.deleteIfExists(StoreFs.child(versionsDir, s"$vA.json"))
      assert(store.versions("dang").map(_._2) == Seq(v0))
      val e = intercept[IllegalArgumentException] {
        store.reader("dang").onVersion(vB)
      }
      assert(e.getMessage.contains("orphaned"), e.getMessage)
    } finally store.destroy("dang")
  }

  /** Tiny two-thread fan-out for the race test (no scala-parallel dep).
    * A thread that outlives the join timeout FAILS the test explicitly —
    * returning null results would both mislead the race assertion and
    * let the still-running committer race the finally-block destroy. */
  private implicit class Par[A](xs: Seq[A]) {
    def par[B](f: A => B): Seq[B] = {
      val out = new Array[Any](xs.size)
      val ts = xs.zipWithIndex.map { case (x, i) =>
        new Thread(() => out(i) = f(x))
      }
      ts.foreach(_.start()); ts.foreach(_.join(120000))
      val hung = ts.count(_.isAlive)
      assert(hung == 0,
        s"$hung committer thread(s) still running after 120 s — endpoint " +
          "too slow or wedged; not destroying under a live writer")
      out.toSeq.asInstanceOf[Seq[B]]
    }
  }
}
