package graft

import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import graft.spark.{AxisOps, SparkStore}
import org.scalatest.funsuite.AnyFunSuite

/** Distributed prefix scan + coordinate-returning reductions. */
class AxisOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mk1d(vals: Seq[Long], chunk: Long): (SparkStore, String, Long) = {
    val root = java.nio.file.Files.createTempDirectory("graft_axis").toString
    val store = new SparkStore(spark, root)
    store.create("d")
    val m = DatasetMeta(Map("h" -> vals.length.toLong), Map("h" -> chunk),
      Map("a" -> VariableDef("long", Vector("h"), -1.0)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L), Seq(vals.length.toLong)), vals.map(_.toDouble))))
    (store, root, w.finishVersion())
  }

  test("cumsum crosses chunk boundaries with exact offsets") {
    val vals = (0 until 20).map(i => ((i * 5) % 11).toLong)
    val (_, root, v) = mk1d(vals, chunk = 6L) // 4 chunks, last partial
    val got = AxisOps.cumsumAxis(spark, root, "d", "a", Some(v), axis = "h")
      .orderBy("h").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = vals.scanLeft(0L)(_ + _).tail.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    assert(got == want)
  }

  test("2-D cumsum along x runs per y line") {
    val root = java.nio.file.Files.createTempDirectory("graft_axis2").toString
    val store = new SparkStore(spark, root)
    store.create("d")
    val m = DatasetMeta(Map("y" -> 3L, "x" -> 9L), Map("y" -> 2L, "x" -> 4L),
      Map("a" -> VariableDef("long", Vector("y", "x"), -1.0)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L, 0L), Seq(3L, 9L)), (0 until 27).map(i => (i % 4).toDouble))))
    val v = w.finishVersion()
    val got = AxisOps.cumsumAxis(spark, root, "d", "a", Some(v), axis = "x")
      .orderBy("y", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = for (y <- 0L until 3L; x <- 0L until 9L) yield
      (y, x, (0L to x).map(i => (y * 9 + i) % 4).sum)
    assert(got == want.toSeq)
  }

  test("interp upsamples 4x with exact endpoints and floor-interpolated " +
      "interiors, across chunk boundaries") {
    val vals = Seq(0L, 8L, 4L, 12L, 2L, 10L, 6L, 3L, 9L)
    val (_, root, v) = mk1d(vals, chunk = 4L) // successor of cell 3 and 7 cross chunks
    val got = AxisOps.interpAxis(spark, root, "d", "a", Some(v),
        axis = "h", k = 4)
      .orderBy("h").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (0 until (vals.length - 1) * 4 + 1).map { o =>
      val (q, r) = (o / 4, o % 4)
      val vn = if (q + 1 < vals.length) vals(q + 1) else vals(q)
      (o.toLong, Math.floorDiv((4 - r) * vals(q) + r * vn, 4L))
    }
    assert(got == want)
    assert(got.length == 33)
  }

  test("2-D interp along x stays inside each y line") {
    val root = java.nio.file.Files.createTempDirectory("graft_axis4").toString
    val store = new SparkStore(spark, root)
    store.create("d")
    val m = DatasetMeta(Map("y" -> 2L, "x" -> 5L), Map("y" -> 1L, "x" -> 2L),
      Map("a" -> VariableDef("long", Vector("y", "x"), -1.0)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L, 0L), Seq(2L, 5L)),
      Seq(0, 2, 4, 6, 8, 10, 30, 50, 70, 90).map(_.toDouble))))
    val v = w.finishVersion()
    val got = AxisOps.interpAxis(spark, root, "d", "a", Some(v),
        axis = "x", k = 2)
      .orderBy("y", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val rows = Seq(Seq(0L, 2L, 4L, 6L, 8L), Seq(10L, 30L, 50L, 70L, 90L))
    val want = for (y <- 0 to 1; o <- 0 until 9) yield {
      val (q, r) = (o / 2, o % 2)
      val vq = rows(y)(q)
      val vn = if (q + 1 < 5) rows(y)(q + 1) else vq
      (y.toLong, o.toLong, Math.floorDiv((2 - r) * vq + r * vn, 2L))
    }
    assert(got == want.toSeq)
  }

  test("argmax returns the max value and the SMALLEST coordinate on ties") {
    val vals = Seq(3L, 9L, 1L, 9L, 2L, 9L, 0L, 4L)
    val (_, root, v) = mk1d(vals, chunk = 3L)
    val r = AxisOps.argmaxAxis(spark, root, "d", "a", Some(v), axis = "h")
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == ((9L, 1L)))
  }

  test("ffill carries across entirely-fill chunks; leading prefix stays fill") {
    // 12 cells, chunk 4: values only at h=1 and h=2 — chunk 1 is ALL
    // fill, so chunk 2 must inherit the carry from chunk 0
    val root = java.nio.file.Files.createTempDirectory("graft_ffill").toString
    val store = new SparkStore(spark, root)
    store.create("d")
    val m = DatasetMeta(Map("h" -> 12L), Map("h" -> 4L),
      Map("a" -> VariableDef("long", Vector("h"), -1.0)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(1L), Seq(3L)), Seq(7.0, 9.0))))
    val v = w.finishVersion()
    val got = AxisOps.ffillAxis(spark, root, "d", "a", Some(v), axis = "h")
      .orderBy("h").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Seq(
      (0L, -1L, -1L), (1L, 7L, 7L), (2L, 9L, 9L), (3L, -1L, 9L),
      (4L, -1L, 9L), (5L, -1L, 9L), (6L, -1L, 9L), (7L, -1L, 9L),
      (8L, -1L, 9L), (9L, -1L, 9L), (10L, -1L, 9L), (11L, -1L, 9L))
    assert(got == want)
  }

  test("ffill with NaN fill detects fill cells via isnan") {
    val root = java.nio.file.Files.createTempDirectory("graft_ffilln").toString
    val store = new SparkStore(spark, root)
    store.create("d")
    val m = DatasetMeta(Map("h" -> 6L), Map("h" -> 3L),
      Map("f" -> VariableDef("double", Vector("h"), Double.NaN)))
    val w = store.addVersion("d", m)
    w.write("f", Seq(Slab.fromDoubles(DType.DOUBLE,
      Slice(Seq(1L), Seq(2L)), Seq(2.5))))
    val v = w.finishVersion()
    val got = AxisOps.ffillAxis(spark, root, "d", "f", Some(v), axis = "h")
      .orderBy("h").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got.head._2.isNaN) // leading prefix: nothing to carry
    assert(got.drop(1).forall(_._2 == 2.5))
  }

  test("diff crosses chunk boundaries via the predecessor halo") {
    val vals = Seq(3L, 9L, 1L, 9L, 2L, 9L, 0L, 4L, 6L)
    val (_, root, v) = mk1d(vals, chunk = 3L) // predecessors of h=3,6 cross chunks
    val got = AxisOps.diffAxis(spark, root, "d", "a", Some(v), axis = "h")
      .orderBy("h").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (1 until vals.length).map(i => (i.toLong, vals(i) - vals(i - 1)))
    assert(got == want)
  }

  test("2-D diff along x stays inside each y line (no cross-line leakage)") {
    val root = java.nio.file.Files.createTempDirectory("graft_axisd2").toString
    val store = new SparkStore(spark, root)
    store.create("d")
    val m = DatasetMeta(Map("y" -> 2L, "x" -> 5L), Map("y" -> 1L, "x" -> 2L),
      Map("a" -> VariableDef("long", Vector("y", "x"), -1.0)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L, 0L), Seq(2L, 5L)),
      Seq(0, 2, 4, 6, 8, 100, 90, 70, 40, 0).map(_.toDouble))))
    val v = w.finishVersion()
    val got = AxisOps.diffAxis(spark, root, "d", "a", Some(v), axis = "x")
      .orderBy("y", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Seq(
      (0L, 1L, 2L), (0L, 2L, 2L), (0L, 3L, 2L), (0L, 4L, 2L),
      (1L, 1L, -10L), (1L, 2L, -20L), (1L, 3L, -30L), (1L, 4L, -40L))
    assert(got == want)
  }

  test("quantile interpolates order statistics per line, exactly at " +
      "quarter fractions") {
    val root = java.nio.file.Files.createTempDirectory("graft_axisq").toString
    val store = new SparkStore(spark, root)
    store.create("d")
    val m = DatasetMeta(Map("y" -> 2L, "x" -> 4L), Map("y" -> 1L, "x" -> 2L),
      Map("a" -> VariableDef("long", Vector("y", "x"), -1.0)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L, 0L), Seq(2L, 4L)),
      Seq(4, 1, 3, 2, 10, 30, 20, 0).map(_.toDouble))))
    val v = w.finishVersion()
    val got = AxisOps.quantileAxis(spark, root, "d", "a", Some(v),
        axis = "x", ps = Seq(0.25, 0.5, 0.75))
      .orderBy("y").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    // sorted lines: (1,2,3,4) → q25=1.75 q50=2.5 q75=3.25;
    //               (0,10,20,30) → 7.5, 15, 22.5
    assert(got == Seq((0L, 1.75, 2.5, 3.25), (1L, 7.5, 15.0, 22.5)))
  }

  test("reduce collapses an axis to (sum, min, max, cnt) per line") {
    val root = java.nio.file.Files.createTempDirectory("graft_axis4").toString
    val store = new SparkStore(spark, root)
    store.create("d")
    val m = DatasetMeta(Map("y" -> 2L, "x" -> 6L), Map("y" -> 1L, "x" -> 4L),
      Map("a" -> VariableDef("long", Vector("y", "x"), -1.0)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L, 0L), Seq(2L, 6L)),
      Seq(1, 5, 2, 5, 0, 3, 7, 0, 7, 1, 2, 7).map(_.toDouble))))
    val v = w.finishVersion()
    val got = AxisOps.reduceAxis(spark, root, "d", "a", Some(v), axis = "x")
      .orderBy("y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq((0L, 16L, 0L, 5L, 6L), (1L, 24L, 0L, 7L, 6L)))
  }

  test("2-D argmax along x: one row per y") {
    val root = java.nio.file.Files.createTempDirectory("graft_axis3").toString
    val store = new SparkStore(spark, root)
    store.create("d")
    val m = DatasetMeta(Map("y" -> 2L, "x" -> 6L), Map("y" -> 1L, "x" -> 4L),
      Map("a" -> VariableDef("long", Vector("y", "x"), -1.0)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L, 0L), Seq(2L, 6L)),
      Seq(1, 5, 2, 5, 0, 3, 7, 0, 7, 1, 2, 7).map(_.toDouble))))
    val v = w.finishVersion()
    val got = AxisOps.argmaxAxis(spark, root, "d", "a", Some(v), axis = "x")
      .orderBy("y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 5L, 1L), (1L, 7L, 0L)))
  }

  test("selByLabel: label range → index slice; empty range keeps the " +
      "(dims…, label, value) schema") {
    val root = java.nio.file.Files.createTempDirectory("graft_axis_sel").toString
    val store = new SparkStore(spark, root)
    store.create("d")
    val m = DatasetMeta(Map("h" -> 10L), Map("h" -> 4L),
      Map("a" -> VariableDef("long", Vector("h"), -1.0),
        "lab" -> VariableDef("long", Vector("h"), -1.0)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L), Seq(10L)), (0 until 10).map(i => (i * i).toDouble))))
    // monotone labels 100,110,…,190 on the same axis
    w.write("lab", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L), Seq(10L)), (0 until 10).map(i => 100.0 + 10 * i))))
    val v = w.finishVersion()
    val hitRows = AxisOps.selByLabel(spark, root, "d", "a", "lab", "h",
        lo = 125L, hi = 165L, version = Some(v))
      .orderBy("h").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // labels 130..160 → indices 3..6, value = h²
    assert(hitRows == Seq((3L, 130L, 9L), (4L, 140L, 16L),
      (5L, 150L, 25L), (6L, 160L, 36L)))
    val none = AxisOps.selByLabel(spark, root, "d", "a", "lab", "h",
      lo = 1000L, hi = 2000L, version = Some(v))
    assert(none.columns.toSeq == Seq("h", "label", "value"))
    assert(none.count() == 0L)
    // the empty frame must stay selectable/union-able (the regression:
    // emptyDataFrame dropped every column)
    assert(none.select("label", "value").count() == 0L)
  }
}
