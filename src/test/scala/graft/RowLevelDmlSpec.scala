package graft

import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import graft.spark.SparkStore
import org.scalatest.funsuite.AnyFunSuite

/** SQL row-level DML over the versioned array store: UPDATE, MERGE INTO,
  * and value-predicate DELETE via the delta-based DSv2 path
  * (GraftRowLevel.scala). Reference write semantics being exercised:
  * overlay last-writer-wins (io/mandoline.clj:188-210), deletes read as
  * fill, MVCC time travel below every DML version. */
class RowLevelDmlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkStore(prefix: String): (SparkStore, String, String) = {
    val root = java.nio.file.Files.createTempDirectory(prefix).toString
    val store = new SparkStore(spark, root)
    val cat = "graft_" +
      java.lang.Integer.toHexString(root.hashCode & 0x7fffffff)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.spark.source.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (store, root, cat)
  }

  private def seed1d(store: SparkStore, n: Int = 20, chunk: Long = 8L): Long = {
    store.create("d")
    val m = DatasetMeta(Map("h" -> n.toLong), Map("h" -> chunk),
      Map("a" -> VariableDef("long", Vector("h"), -1.0)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L), Seq(n.toLong)), (0 until n).map(_ * 1.0))))
    w.finishVersion()
  }

  private def readAll(store: SparkStore, v: Long, n: Int = 20): Seq[Long] =
    store.reader("d").onVersion(v)
      .exploded("a", Slice(Seq(0L), Seq(n.toLong)))
      .orderBy("h").collect().map(_.getLong(1)).toSeq

  test("UPDATE with a value expression commits one new version; " +
      "time travel below it is intact") {
    val (store, _, cat) = mkStore("graft_upd")
    val v1 = seed1d(store)
    spark.sql(s"UPDATE $cat.d.a SET value = value * 10 WHERE h >= 5 AND h < 8")
    val v2 = store.versions("d").head._2
    assert(v2 != v1)
    assert(readAll(store, v2) ==
      (0 until 20).map(h => if (h >= 5 && h < 8) h * 10L else h.toLong))
    assert(readAll(store, v1) == (0 until 20).map(_.toLong))
  }

  test("UPDATE that moves a dimension coordinate fills the vacated cell " +
      "and writes the destination") {
    val (store, _, cat) = mkStore("graft_updmv")
    seed1d(store)
    spark.sql(s"UPDATE $cat.d.a SET h = h + 10, value = 777 WHERE h < 2")
    val v = store.versions("d").head._2
    val got = readAll(store, v)
    assert(got(0) == -1L && got(1) == -1L) // vacated → fill
    assert(got(10) == 777L && got(11) == 777L) // destination written
    assert((2 until 10).forall(h => got(h) == h.toLong))
    assert((12 until 20).forall(h => got(h) == h.toLong))
  }

  test("UPDATE matching nothing commits NO new version") {
    val (store, _, cat) = mkStore("graft_updnone")
    val v1 = seed1d(store)
    spark.sql(s"UPDATE $cat.d.a SET value = 0 WHERE h >= 1000000")
    assert(store.versions("d").map(_._2) == Seq(v1))
  }

  test("value-predicate DELETE (non-rectangular) scans matched cells and " +
      "fills exactly those; rectangular DELETE stays metadata-only") {
    val (store, _, cat) = mkStore("graft_delpred")
    val v1 = seed1d(store)
    // 12 is in-extent; value > 15 matches h in 16..19 only
    spark.sql(s"DELETE FROM $cat.d.a WHERE value > 15")
    val v2 = store.versions("d").head._2
    assert(readAll(store, v2) ==
      (0 until 20).map(h => if (h > 15) -1L else h.toLong))
    assert(readAll(store, v1) == (0 until 20).map(_.toLong))
    // plan shapes: a rectangle converts back to the scan-free metadata
    // delete; a value predicate keeps the row-level WriteDelta plan
    val rectPlan = spark.sql(
      s"EXPLAIN DELETE FROM $cat.d.a WHERE h >= 3 AND h <= 4")
      .collect().head.getString(0)
    assert(rectPlan.contains("DeleteFromTable"),
      s"rectangular DELETE should be metadata-only, got:\n$rectPlan")
    val predPlan = spark.sql(
      s"EXPLAIN DELETE FROM $cat.d.a WHERE value > 15")
      .collect().head.getString(0)
    assert(predPlan.contains("WriteDelta"),
      s"value-predicate DELETE should be row-level, got:\n$predPlan")
  }

  test("MERGE INTO: matched-conditional update, matched delete, and the " +
      "dense-array matching rule (in-extent coordinates always match)") {
    val (store, _, cat) = mkStore("graft_merge")
    val v1 = seed1d(store)
    // source: h=2 (update), h=3 (delete), h=15 (update of a cell whose
    // current value is its coordinate — dense: it MATCHES, no insert)
    spark.createDataFrame(Seq((2L, 200L), (3L, -999L), (15L, 150L)))
      .toDF("h", "v").createOrReplaceTempView("merge_src")
    spark.sql(s"""
      MERGE INTO $cat.d.a t USING merge_src s ON t.h = s.h
      WHEN MATCHED AND s.v < 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET value = s.v
      WHEN NOT MATCHED THEN INSERT (h, value) VALUES (s.h, s.v)
    """)
    val v2 = store.versions("d").head._2
    assert(readAll(store, v2) == (0 until 20).map {
      case 2 => 200L
      case 3 => -1L // deleted reads as fill
      case 15 => 150L
      case h => h.toLong
    })
    assert(readAll(store, v1) == (0 until 20).map(_.toLong))
  }

  test("MERGE NOT MATCHED insert fires only out of extent and fails with " +
      "the coordinate named") {
    val (store, _, cat) = mkStore("graft_mergeoob")
    seed1d(store)
    spark.createDataFrame(Seq((25L, 1L))).toDF("h", "v")
      .createOrReplaceTempView("merge_oob_src")
    val e = intercept[Exception] {
      spark.sql(s"""
        MERGE INTO $cat.d.a t USING merge_oob_src s ON t.h = s.h
        WHEN MATCHED THEN UPDATE SET value = s.v
        WHEN NOT MATCHED THEN INSERT (h, value) VALUES (s.h, s.v)
      """)
    }
    def causes(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(m =>
        m.contains("outside the variable extent"))))
  }

  test("2-D UPDATE: run coalescing and chunk ownership hold at rank 2") {
    val (store, _, cat) = mkStore("graft_upd2d")
    store.create("d")
    val m = DatasetMeta(Map("y" -> 6L, "x" -> 8L),
      Map("y" -> 4L, "x" -> 4L),
      Map("a" -> VariableDef("double", Vector("y", "x"), Double.NaN)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.fromDoubles(DType.DOUBLE,
      Slice(Seq(0L, 0L), Seq(6L, 8L)),
      (0 until 48).map(i => (i / 8) * 10.0 + i % 8))))
    val v1 = w.finishVersion()
    spark.sql(
      s"UPDATE $cat.d.a SET value = -value WHERE y >= 1 AND y < 3 AND x >= 2")
    val v2 = store.versions("d").head._2
    val got = store.reader("d").onVersion(v2)
      .exploded("a", Slice(Seq(0L, 0L), Seq(6L, 8L)))
      .orderBy("y", "x").collect().map(r => r.getDouble(2)).toSeq
    val want = (0 until 48).map { i =>
      val (y, x) = (i / 8, i % 8)
      val base = y * 10.0 + x
      if (y >= 1 && y < 3 && x >= 2) -base else base
    }
    assert(got == want)
    assert(v2 != v1)
  }

  test("UPDATE and DELETE on a FLOAT variable with NaN fill: deltas encode " +
      "the float dtype; deleted cells read back NaN") {
    val (store, _, cat) = mkStore("graft_updflt")
    store.create("d")
    val m = DatasetMeta(Map("h" -> 10L), Map("h" -> 4L),
      Map("a" -> VariableDef("float", Vector("h"), Double.NaN)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.fromDoubles(DType.FLOAT,
      Slice(Seq(0L), Seq(10L)), (0 until 10).map(_ * 1.5))))
    w.finishVersion()
    spark.sql(s"UPDATE $cat.d.a SET value = value * 2 WHERE h >= 2 AND h < 4")
    spark.sql(s"DELETE FROM $cat.d.a WHERE value > 12.0") // h=9: 13.5
    val v = store.versions("d").head._2
    val got = store.reader("d").onVersion(v)
      .exploded("a", Slice(Seq(0L), Seq(10L)))
      .orderBy("h").collect().map(_.getFloat(1)).toSeq
    val want = (0 until 10).map {
      case h if h == 2 || h == 3 => h * 3.0f
      case 9 => Float.NaN
      case h => h * 1.5f
    }
    assert(got.zip(want).forall { case (g, e) =>
      (g.isNaN && e.isNaN) || g == e }, s"got $got")
  }

  test("an in-flight writer whose base goes stale under a concurrent DML " +
      "fails its commit explicitly (parent CAS)") {
    val (store, _, cat) = mkStore("graft_updrace")
    seed1d(store)
    // writer opens against the current latest…
    val base = store.metadata("d", store.versions("d").head._2)
    val w = store.addVersion("d", base)
    w.write("a", Seq(graft.core.Slab.empty(DType.LONG,
      Slice(Seq(0L), Seq(2L)), 42.0)))
    Thread.sleep(2)
    // …then a DML commits first
    spark.sql(s"UPDATE $cat.d.a SET value = 0 WHERE h = 5")
    val e = intercept[IllegalStateException] { w.finishVersion() }
    assert(e.getMessage.contains("latest version"))
    // the DML's state is intact and the loser's cells are invisible
    val got = readAll(store, store.versions("d").head._2)
    assert(got(0) == 0L && got(1) == 1L && got(5) == 0L)
  }

  test("UPDATE after a dimension grow reaches the grown region (its cells " +
      "read as fill and are matchable/updatable)") {
    val (store, _, cat) = mkStore("graft_updgrow")
    seed1d(store)
    spark.sql(s"ALTER TABLE $cat.d.a SET TBLPROPERTIES ('dims' = 'h:30')")
    // grown cells [20,30) read as fill (-1) — match on the fill value
    spark.sql(s"UPDATE $cat.d.a SET value = 7 WHERE h >= 25 AND value = -1")
    val v = store.versions("d").head._2
    val got = store.reader("d").onVersion(v)
      .exploded("a", Slice(Seq(0L), Seq(30L)))
      .orderBy("h").collect().map(_.getLong(1)).toSeq
    assert(got == (0 until 30).map {
      case h if h < 20 => h.toLong
      case h if h >= 25 => 7L
      case _ => -1L
    })
  }

  test("vacuum sweeps a crashed DML query's orphaned staging dir") {
    val (store, root, cat) = mkStore("graft_updvac")
    seed1d(store)
    spark.sql(s"UPDATE $cat.d.a SET value = 1 WHERE h = 1")
    // simulate a crashed query: an orphaned staging dir, quiet past grace
    val orphan = java.nio.file.Paths.get(root).resolve("d")
      .resolve("_delta_staging").resolve("deadbeef-crashed")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.writeString(orphan.resolve("part-0-0-0.bin"), "x")
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 86400000L)
    java.nio.file.Files.setLastModifiedTime(orphan, old)
    java.nio.file.Files.setLastModifiedTime(orphan.resolve("part-0-0-0.bin"), old)
    store.vacuum(graceMs = 0L)
    assert(!java.nio.file.Files.exists(orphan))
  }

  test("DML staging directory is cleaned up after commit") {
    val (store, root, cat) = mkStore("graft_updclean")
    seed1d(store)
    spark.sql(s"UPDATE $cat.d.a SET value = 1 WHERE h = 1")
    val staging = java.nio.file.Paths.get(root).resolve("d")
      .resolve("_delta_staging")
    assert(!java.nio.file.Files.exists(staging) ||
      !java.nio.file.Files.list(staging).findAny().isPresent)
  }
}
