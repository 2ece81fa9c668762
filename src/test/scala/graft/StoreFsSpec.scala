package graft

import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import graft.spark.{SparkStore, StoreFs}
import org.scalatest.funsuite.AnyFunSuite

/** The remote-capable store layer: SparkStore opened through an
  * EXPLICIT `file:///` URI root, so every manifest / catalog / staging /
  * sidecar operation goes through the Hadoop FileSystem resolution an
  * hdfs:// or s3a:// root would take (LocalFileSystem is the CI medium;
  * the code path is scheme-generic). Mirrors the reference's remote
  * backend posture (/root/reference/README.md:16-19,
  * src/io/mandoline/impl.clj:77-119). */
class StoreFsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fileRoot(): String =
    "file://" + java.nio.file.Files.createTempDirectory("graft-fsroot").toString

  private def meta1d(n: Long = 10L, chunk: Long = 4L) = DatasetMeta(
    dimensions = Map("x" -> n), chunkDimensions = Map("x" -> chunk),
    variables = Map("v" -> VariableDef("long", Vector("x"), -1.0)))

  test("full lifecycle on a file:/// root: write, read, time travel, " +
      "clone, compact, expire, vacuum") {
    val store = new SparkStore(spark, fileRoot())
    store.create("ds")
    val w1 = store.addVersion("ds", meta1d())
    w1.write("v", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L), Seq(10L)), (1 to 10).map(_.toDouble))))
    val v1 = w1.finishVersion()
    val w2 = store.addVersion("ds", meta1d())
    w2.write("v", Seq(Slab.empty(DType.LONG, Slice(Seq(2L), Seq(5L)), 99.0)))
    val v2 = w2.finishVersion()

    def readAll(vid: Long): Map[Long, Long] =
      store.reader("ds").onVersion(vid)
        .exploded("v", Slice(Seq(0L), Seq(10L)))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(readAll(v1) == (0L until 10L).map(x => x -> (x + 1)).toMap)
    val at2 = readAll(v2)
    assert(at2(2L) == 99L && at2(4L) == 99L && at2(5L) == 6L)

    // catalog + stats through the FS layer
    assert(store.listDatasets == Seq("ds"))
    assert(store.versions("ds").map(_._2) == Seq(v2, v1))
    val stats = store.getStats("ds")
    assert(stats("metadata-size") > 0 && stats("data-size") > 0)

    // DSv2 read through the same file:// root
    val dsv2 = spark.read.format("graft")
      .option("root", store.root).option("dataset", "ds")
      .option("variable", "v").load()
    assert(dsv2.count() == 10L)

    // zero-copy clone + divergence
    assert(store.cloneDataset("ds", "ds2") == 2L)
    val w3 = store.addVersion("ds2", meta1d())
    w3.write("v", Seq(Slab.empty(DType.LONG, Slice(Seq(0L), Seq(1L)), 7.0)))
    w3.finishVersion()
    assert(store.versions("ds2").length == 3)
    assert(readAll(v2)(0L) == 1L) // src untouched

    // maintenance triad
    store.compact("ds")
    assert(store.expireHistory("ds") >= 1L)
    store.vacuum(graceMs = 0L)
    // both datasets still read correctly after vacuum (shared blobs kept)
    assert(store.reader("ds").onLastVersion()
      .exploded("v", Slice(Seq(0L), Seq(10L))).count() == 10L)
    assert(store.reader("ds2").onLastVersion()
      .exploded("v", Slice(Seq(0L), Seq(10L))).count() == 10L)
  }

  test("atomic commit on the FS layer: manifests land whole; a stale " +
      "tmp file is invisible; stale-parent commit refuses") {
    val store = new SparkStore(spark, fileRoot())
    store.create("ds")
    val w1 = store.addVersion("ds", meta1d())
    w1.write("v", Seq(Slab.empty(DType.LONG, Slice(Seq(0L), Seq(4L)), 1.0)))
    val v1 = w1.finishVersion()
    // a crashed commit's tmp file must be invisible to the catalog
    val versionsDir = StoreFs.child(StoreFs.child(store.root, "ds"), "versions")
    StoreFs.writeString(StoreFs.child(versionsDir, ".999.json.tmp"), "{not json")
    assert(store.versions("ds").map(_._2) == Seq(v1))
    // two writers fork from v1; the second to commit must refuse, not
    // corrupt (optimistic concurrency on the manifest layer)
    val wa = store.addVersion("ds", meta1d())
    val wb = store.addVersion("ds", meta1d())
    wa.write("v", Seq(Slab.empty(DType.LONG, Slice(Seq(0L), Seq(2L)), 2.0)))
    wb.write("v", Seq(Slab.empty(DType.LONG, Slice(Seq(2L), Seq(4L)), 3.0)))
    val v2 = wa.finishVersion()
    val err = intercept[IllegalStateException] { wb.finishVersion() }
    assert(err.getMessage.contains("latest version"))
    assert(store.versions("ds").map(_._2) == Seq(v2, v1))
  }

  test("StoreFs.moveInto is no-clobber for directories: a lost publish " +
      "race refuses instead of nesting into the winner") {
    val root = fileRoot()
    val a = StoreFs.child(root, "a")
    val b = StoreFs.child(root, "b")
    StoreFs.mkdirs(a)
    StoreFs.writeString(StoreFs.child(a, "f.txt"), "A")
    StoreFs.mkdirs(b)
    StoreFs.writeString(StoreFs.child(b, "f.txt"), "B")
    assert(!StoreFs.moveInto(a, b)) // dst exists → refuse
    assert(StoreFs.readString(StoreFs.child(b, "f.txt")) == "B")
    assert(StoreFs.exists(StoreFs.child(a, "f.txt"))) // src untouched
    assert(!StoreFs.exists(StoreFs.child(StoreFs.child(b, "a"), "f.txt")),
      "posix mv-into semantics leaked through")
    // and the success path moves the whole tree
    val c = StoreFs.child(root, "c")
    assert(StoreFs.moveInto(a, c))
    assert(StoreFs.readString(StoreFs.child(c, "f.txt")) == "A")
  }

  test("scheme-qualified and scheme-less roots address the same store") {
    val plain = java.nio.file.Files.createTempDirectory("graft-dual").toString
    val viaFs = new SparkStore(spark, "file://" + plain)
    val viaLocal = new SparkStore(spark, plain)
    viaFs.create("ds")
    val w = viaFs.addVersion("ds", meta1d(4L, 2L))
    w.write("v", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L), Seq(4L)), Seq(1.0, 2.0, 3.0, 4.0))))
    val v = w.finishVersion()
    assert(viaLocal.listDatasets == Seq("ds"))
    assert(viaLocal.reader("ds").onVersion(v)
      .exploded("v", Slice(Seq(0L), Seq(4L)))
      .collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("SQL catalog on a file:/// root: CTAS, query, time travel, and " +
      "system procedures all ride the Hadoop route") {
    val root = fileRoot()
    val cat = "graft_fs_" +
      java.lang.Integer.toHexString(root.hashCode & 0x7fffffff)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.spark.source.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    import spark.implicits._
    (0L until 20L).map(h => (h, h * 3 + 1)).toDF("h", "value")
      .createOrReplaceTempView("fs_src")
    spark.sql(s"""CREATE TABLE $cat.fsds.n
      TBLPROPERTIES ('dims' = 'h:20:8', 'fill' = '-1', 'type' = 'long')
      AS SELECT h, value FROM fs_src""")
    val got = spark.sql(s"SELECT value FROM $cat.fsds.n WHERE h = 7")
      .collect().head.getLong(0)
    assert(got == 22L)
    // CTAS = createTable + append: two committed versions is its shape
    val hist = spark.sql(s"CALL $cat.system.history('fsds')").collect()
    assert(hist.nonEmpty)
    // the same dataset is visible to a direct SparkStore on the same uri
    val store = new SparkStore(spark, root)
    assert(store.listDatasets == Seq("fsds"))
    assert(spark.sql(s"CALL $cat.system.compact('fsds')").collect().nonEmpty)
    assert(spark.sql(s"SELECT count(*) FROM $cat.fsds.n")
      .collect().head.getLong(0) == 20L)
  }

  test("dual-path equivalence: the nio fast path and the Hadoop route " +
      "observe one tree identically") {
    val plain = java.nio.file.Files.createTempDirectory("graft-dual2").toString
    val qualified = "file://" + plain
    // write through the Hadoop route, observe through nio — and reverse
    StoreFs.mkdirs(StoreFs.child(qualified, "a/b"))
    StoreFs.writeString(StoreFs.child(StoreFs.child(qualified, "a"), "x.txt"), "via-hadoop")
    StoreFs.writeString(StoreFs.child(plain, "y.txt"), "via-nio")
    assert(StoreFs.readString(StoreFs.child(StoreFs.child(plain, "a"), "x.txt"))
      == "via-hadoop")
    assert(StoreFs.readString(StoreFs.child(qualified, "y.txt")) == "via-nio")
    // LocalFileSystem writes .crc checksum siblings that its own
    // listings hide; they are dot-prefixed, which every store listing
    // filters anyway — equivalence holds on the non-hidden view
    def visible(names: Seq[String]) = names.filterNot(_.startsWith(".")).toSet
    assert(visible(StoreFs.list(plain).map(_._2))
      == visible(StoreFs.list(qualified).map(_._2)))
    assert(visible(StoreFs.filesUnder(plain).map(StoreFs.name))
      == visible(StoreFs.filesUnder(qualified).map(StoreFs.name)))
    // rename semantics agree: no-clobber refusal both ways
    StoreFs.mkdirs(StoreFs.child(plain, "c"))
    assert(!StoreFs.moveInto(StoreFs.child(qualified, "a"), StoreFs.child(qualified, "c")))
    assert(!StoreFs.moveInto(StoreFs.child(plain, "a"), StoreFs.child(plain, "c")))
    assert(StoreFs.exists(StoreFs.child(StoreFs.child(plain, "a"), "x.txt")))
    // moveReplace overwrites a file on both routes
    StoreFs.writeString(StoreFs.child(plain, "t1"), "one")
    StoreFs.moveReplace(StoreFs.child(plain, "t1"), StoreFs.child(plain, "y.txt"))
    assert(StoreFs.readString(StoreFs.child(qualified, "y.txt")) == "one")
    StoreFs.writeString(StoreFs.child(qualified, "t2"), "two")
    StoreFs.moveReplace(StoreFs.child(qualified, "t2"), StoreFs.child(qualified, "y.txt"))
    assert(StoreFs.readString(StoreFs.child(plain, "y.txt")) == "two")
  }

  test("route classifier: any scheme-qualified form takes the Hadoop " +
      "route, including authority-less hdfs:/x; colons AFTER the first " +
      "slash stay local") {
    // Hadoop route (null = not local): both the ://-form and the
    // authority-less one-slash rendering HPath.toString produces
    for (p <- Seq("file:///tmp/x", "file:/tmp/x", "hdfs://nn:8020/g",
        "hdfs:/warehouse/graft", "s3a://b/k", "s3a:/k", "abfss://c@a/x"))
      assert(StoreFs.localPath(p) == null, s"$p must route Hadoop")
    // nio fast path: scheme-less absolute/relative, incl. a colon in a
    // path SEGMENT (RFC 3986: a scheme colon precedes the first slash)
    for (p <- Seq("/data/store", "rel/dir", "/tmp/a:b/c"))
      assert(StoreFs.localPath(p) != null, s"$p must stay local")
  }

  test("adoptChunkFiles fails loudly when a staged file cannot move, " +
      "leaving the staging dir intact for retry") {
    val store = new SparkStore(spark, fileRoot())
    StoreFs.mkdirs(store.chunksDir)
    val staging = store.newChunkStagingDir()
    StoreFs.writeString(StoreFs.child(staging, "part-x.parquet"), "staged")
    // pre-existing dst with the same name => moveInto reports false
    StoreFs.writeString(StoreFs.child(store.chunksDir, "part-x.parquet"), "live")
    intercept[java.io.IOException](store.adoptChunkFiles(staging))
    // the staged blob data must survive the failure
    assert(StoreFs.readString(StoreFs.child(staging, "part-x.parquet")) == "staged")
    assert(StoreFs.readString(
      StoreFs.child(store.chunksDir, "part-x.parquet")) == "live")
  }

  test("SerializableHadoopConf round-trips driver settings and " +
      "installExecutorConf makes them the no-session default") {
    // the deployment this protects: s3a credentials supplied as
    // spark.hadoop.* on the DRIVER reach executor-side staged-fragment
    // writers (GraftDeltaWriterFactory ships the conf; task threads
    // have no active SparkSession, so StoreFs.conf takes the
    // installed-default branch)
    val c = new org.apache.hadoop.conf.Configuration(false)
    c.set("graft.test.cred", "sekrit")
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(new graft.spark.SerializableHadoopConf(c))
    oos.close()
    val rt = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[graft.spark.SerializableHadoopConf]
    assert(rt.value.get("graft.test.cred") == "sekrit")
    val prev = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.clearActiveSession()
    try {
      StoreFs.installExecutorConf(rt)
      assert(StoreFs.conf.get("graft.test.cred") == "sekrit")
      // content-dedup: re-installing an equal-fingerprint conf keeps the
      // installed OBJECT (identity-stable FS cache key across tasks)
      val again = new java.io.ObjectInputStream(
          new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[graft.spark.SerializableHadoopConf]
      val installed = StoreFs.conf
      StoreFs.installExecutorConf(again)
      assert(StoreFs.conf eq installed,
        "equal-content conf re-install must not churn the installed object")
    } finally {
      // restore a full default so later no-session calls in this JVM
      // (local-mode task threads) resolve file:// normally
      StoreFs.installExecutorConf(new graft.spark.SerializableHadoopConf(
        new org.apache.hadoop.conf.Configuration()))
      prev.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
  }

  test("conf fingerprint: content-stable across serialization round-trips " +
      "and object copies; sensitive to any key change") {
    val c = new org.apache.hadoop.conf.Configuration(false)
    c.set("a.key", "1"); c.set("b.key", "2")
    val fp = StoreFs.fingerprint(c)
    // a COPY (what every task deserialization produces) fingerprints equal
    assert(StoreFs.fingerprint(new org.apache.hadoop.conf.Configuration(c)) == fp)
    // the serialized carrier ships the fp precomputed and intact
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(new graft.spark.SerializableHadoopConf(c)); oos.close()
    val rt = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[graft.spark.SerializableHadoopConf]
    assert(rt.fp == fp && StoreFs.fingerprint(rt.value) == fp)
    // any content change moves it
    val c2 = new org.apache.hadoop.conf.Configuration(c)
    c2.set("b.key", "3")
    assert(StoreFs.fingerprint(c2) != fp)
  }

  test("broadcastConf is cached per conf generation: repeated scans of an " +
      "unchanged session reuse ONE broadcast") {
    val prev = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
    try {
      val b1 = StoreFs.broadcastConf()
      val b2 = StoreFs.broadcastConf()
      assert(b1 eq b2, "same conf generation must not re-broadcast")
      assert(b1.value.fp == StoreFs.fingerprint(StoreFs.conf))
    } finally prev.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
  }

  test("StoreRegistry: Hadoop schemes keep the full uri as the root") {
    import graft.store.StoreRegistry
    val s = StoreRegistry.parse("s3a://bucket/prefix/stores")
    assert(s.scheme == "s3a" && s.root == "s3a://bucket/prefix/stores")
    val h = StoreRegistry.parse("hdfs://nn:8020/graft")
    assert(h.scheme == "hdfs" && h.root == "hdfs://nn:8020/graft")
    val m = StoreRegistry.parse("mem://xyz/ds")
    assert(m.scheme == "mem" && m.root == "xyz" && m.dataset.contains("ds"))
  }
}
