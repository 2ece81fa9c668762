package graft.spark

import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import org.scalatest.funsuite.AnyFunSuite

/** Zero-copy dataset clone: manifests + index copy, chunk blobs shared.
  * The structural-sharing properties the oracle gate can't see:
  * no new blob files, divergence isolation in both directions, and
  * vacuum safety after destroying the source. */
class CloneSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def meta1d = DatasetMeta(
    dimensions = Map("h" -> 48L),
    chunkDimensions = Map("h" -> 16L),
    variables = Map("n" -> VariableDef("long", Vector("h"), -1.0)))

  /** src: v1 = 2h on [0,48), v2 = 3h+1 on [16,32). */
  private def buildSrc(): (SparkStore, Long, Long) = {
    val store = new SparkStore(spark,
      java.nio.file.Files.createTempDirectory("graft-clone").toString)
    store.create("src")
    val w1 = store.addVersion("src", meta1d)
    w1.write("n", Seq(Slab.fromDoubles(DType.LONG, Slice(Seq(0L), Seq(48L)),
      (0 until 48).map(h => 2.0 * h))))
    val v1 = w1.finishVersion()
    Thread.sleep(2)
    val w2 = store.addVersion("src", meta1d)
    w2.write("n", Seq(Slab.fromDoubles(DType.LONG, Slice(Seq(16L), Seq(32L)),
      (16 until 32).map(h => 3.0 * h + 1))))
    (store, v1, w2.finishVersion())
  }

  private def values(store: SparkStore, ds: String, vid: Long): Map[Long, Long] =
    store.reader(ds).onVersion(vid)
      .exploded("n", Slice(Seq(0L), Seq(48L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def blobFiles(store: SparkStore): Set[String] = {
    val d = java.nio.file.Paths.get(store.chunksDir)
    if (!java.nio.file.Files.exists(d)) Set.empty
    else scala.util.Using.resource(java.nio.file.Files.list(d)) { s =>
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSet
    }
  }

  test("clone adds ZERO blob files, carries full history, and both sides " +
      "diverge independently") {
    val (store, v1, v2) = buildSrc()
    val blobsBefore = blobFiles(store)
    assert(store.cloneDataset("src", "dst") == 2L)
    assert(blobFiles(store) == blobsBefore, "clone must not write blobs")

    // full history: both versions read identically on the clone
    assert(values(store, "dst", v1) == values(store, "src", v1))
    assert(values(store, "dst", v2) == values(store, "src", v2))

    // divergence: write to the CLONE only
    val w = store.addVersion("dst", meta1d)
    w.write("n", Seq(Slab.empty(DType.LONG, Slice(Seq(0L), Seq(8L)), 444.0)))
    val dv = w.finishVersion()
    val dvVals = values(store, "dst", dv)
    assert((0L until 8L).forall(h => dvVals(h) == 444L))
    assert(dvVals(20L) == 3 * 20 + 1)
    // src untouched: same latest version, same values
    assert(store.versions("src").head._2 == v2)
    assert(values(store, "src", v2)(0L) == 0L)

    // and the reverse: a later write to SRC is invisible on the clone
    val w2 = store.addVersion("src", meta1d)
    w2.write("n", Seq(Slab.empty(DType.LONG, Slice(Seq(40L), Seq(48L)), 555.0)))
    val sv = w2.finishVersion()
    assert(values(store, "src", sv)(40L) == 555L)
    assert(store.versions("dst").head._2 == dv)
    assert(values(store, "dst", dv)(40L) == 2 * 40)
  }

  test("destroying the source then vacuuming keeps the clone readable " +
      "(shared blobs survive via the clone's references)") {
    val (store, _, v2) = buildSrc()
    store.cloneDataset("src", "dst")
    val want = values(store, "src", v2)
    store.destroy("src")
    store.vacuum(graceMs = 0L) // mark must see dst's references
    assert(values(store, "dst", v2) == want)
    // and once the clone goes too, the blobs are reclaimable
    store.destroy("dst")
    assert(store.vacuum(graceMs = 0L) > 0L)
  }

  test("clone refuses an existing target and a crashed temp dir is swept " +
      "on retry") {
    val (store, _, _) = buildSrc()
    store.cloneDataset("src", "dst")
    intercept[IllegalStateException](store.cloneDataset("src", "dst"))
    // simulate a crashed clone: stale temp dir with junk inside
    val tmp = java.nio.file.Paths.get(store.root, ".clone_tmp_dst2")
    java.nio.file.Files.createDirectories(tmp.resolve("versions"))
    java.nio.file.Files.writeString(tmp.resolve("versions/junk.json"), "{}")
    assert(store.cloneDataset("src", "dst2") == 2L)
    assert(store.versions("dst2").length == 2)
  }

  test("concurrent clones to one dst: exactly one wins, the loser gets " +
      "already-exists and leaves no temp tree or nested garbage") {
    val (store, _, _) = buildSrc()
    import java.util.concurrent.{Executors, TimeUnit, CyclicBarrier}
    val barrier = new CyclicBarrier(2)
    val pool = Executors.newFixedThreadPool(2)
    def racer(): Either[Throwable, Long] = {
      barrier.await(30, TimeUnit.SECONDS)
      try Right(store.cloneDataset("src", "dst"))
      catch { case e: Throwable => Left(e) }
    }
    val (ra, rb) =
      try {
        val fa = pool.submit(() => racer())
        val fb = pool.submit(() => racer())
        (fa.get(120, TimeUnit.SECONDS), fb.get(120, TimeUnit.SECONDS))
      } finally pool.shutdownNow()
    val results = Seq(ra, rb)
    assert(results.count(_.isRight) == 1, s"exactly one clone must win: $results")
    results.collect { case Left(e) =>
      assert(e.isInstanceOf[IllegalStateException] &&
        e.getMessage.contains("already exists"), s"loser raised $e")
    }
    // the winner's clone is whole and readable
    assert(store.versions("dst").length == 2)
    assert(store.reader("dst").onLastVersion()
      .exploded("n", Slice(Seq(0L), Seq(48L))).count() == 48L)
    // no leftover temp trees (loser cleaned up) and no nested garbage
    // (FileSystem.rename's mv-into semantics would have landed the
    // loser's tree INSIDE dst)
    val leftovers = java.nio.file.Files.list(
        java.nio.file.Paths.get(store.root)).toArray.map(_.toString)
      .filter(_.contains(".clone_tmp_"))
    assert(leftovers.isEmpty, s"temp trees left: ${leftovers.mkString(",")}")
    val dstChildren = java.nio.file.Files.list(
        java.nio.file.Paths.get(store.root, "dst")).toArray
      .map(_.toString.split('/').last).sorted.toSeq
    assert(dstChildren == Seq("index", "versions"),
      s"nested garbage inside dst: $dstChildren")
  }

  test("dataset names are a single path segment: separators, dot-prefix, " +
      "'..', and 'chunks' are rejected by create and clone") {
    val (store, _, _) = buildSrc()
    // ':' is rejected because Hadoop's Path(parent, "file:x") treats the
    // colon-bearing child as an ABSOLUTE URI, resolving it outside the
    // store root on a scheme-qualified store (destroy("file:x") on an
    // hdfs:// root would deleteTree a local CWD-relative path)
    for (bad <- Seq("a/b", "..", "a\\b", ".hidden", "chunks", "", "  ",
        "file:x", "a:b"))
      intercept[IllegalArgumentException](store.create(bad))
    for (bad <- Seq("a/b", "../esc", ".clone_tmp_x", "chunks", "file:x"))
      intercept[IllegalArgumentException](store.cloneDataset("src", bad))
    // destroy is SQL-reachable via DROP NAMESPACE ... CASCADE: the same
    // guard must hold or ".." deletes above the root and "chunks" deletes
    // every dataset's shared blobs
    for (bad <- Seq("..", "a/b", "chunks", ".clone_tmp_x", "", "file:x"))
      intercept[IllegalArgumentException](store.destroy(bad))
  }

  test("CALL graft.system.clone drives it from SQL and the clone is " +
      "immediately queryable through the catalog") {
    val (store, _, _) = buildSrc()
    val root = store.root
    val cat = "graft_" +
      java.lang.Integer.toHexString(root.hashCode & 0x7fffffff)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.spark.source.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val n = spark.sql(s"CALL $cat.system.clone('src', 'dst')")
      .collect().head.getLong(0)
    assert(n == 2L)
    val got = spark.sql(s"SELECT value FROM $cat.dst.n WHERE h = 20")
      .collect().head.getLong(0)
    assert(got == 3 * 20 + 1)
  }
}
