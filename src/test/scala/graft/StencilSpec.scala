package graft

import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import graft.spark.{SparkStore, Stencil}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Halo-exchange rolling windows along one axis of a dense array. */
class StencilSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("1-D rolling sum matches a global window across chunk boundaries " +
      "and clips at the array bounds") {
    val root = java.nio.file.Files.createTempDirectory("graft_sten").toString
    val store = new SparkStore(spark, root)
    store.create("d")
    val n = 20L
    val m = DatasetMeta(Map("h" -> n), Map("h" -> 8L),
      Map("a" -> VariableDef("long", Vector("h"), -1.0)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L), Seq(n)), (0 until 20).map(i => ((i * 3) % 7).toDouble))))
    val v = w.finishVersion()
    val got = Stencil.rollingAxis(spark, root, "d", "a", Some(v),
        axis = "h", radius = 2)
      .orderBy("h").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val vals = (0 until 20).map(i => ((i * 3) % 7).toLong)
    val want = (0 until 20).map { i =>
      val lo = math.max(0, i - 2); val hi = math.min(19, i + 2)
      (i.toLong, (lo to hi).map(vals).sum, (hi - lo + 1).toLong)
    }
    assert(got == want)
    // chunk faces at h=8 and h=16 sit strictly inside: the windows there
    // could only be right via halo cells, which the equality above proves
  }

  test("2-D rolling along x: windows stay within each y row") {
    val root = java.nio.file.Files.createTempDirectory("graft_sten2").toString
    val store = new SparkStore(spark, root)
    store.create("d")
    val m = DatasetMeta(Map("y" -> 3L, "x" -> 10L),
      Map("y" -> 2L, "x" -> 4L),
      Map("a" -> VariableDef("long", Vector("y", "x"), -1.0)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L, 0L), Seq(3L, 10L)),
      (0 until 30).map(i => (i % 5).toDouble))))
    val v = w.finishVersion()
    val got = Stencil.rollingAxis(spark, root, "d", "a", Some(v),
        axis = "x", radius = 1)
      .orderBy("y", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val cell = (y: Int, x: Int) => ((y * 10 + x) % 5).toLong
    val want = for (y <- 0 until 3; x <- 0 until 10) yield {
      val lo = math.max(0, x - 1); val hi = math.min(9, x + 1)
      (y.toLong, x.toLong, (lo to hi).map(cell(y, _)).sum, (hi - lo + 1).toLong)
    }
    assert(got == want.toSeq)
  }

  test("boxSum2d: 3x3 boxes exact across faces, corners, and array edges") {
    val root = java.nio.file.Files.createTempDirectory("graft_sten2d").toString
    val store = new SparkStore(spark, root)
    store.create("d")
    // 7x6 array, 3x2 chunks → interior cells straddle face AND corner
    // chunk boundaries in both axes
    val m = DatasetMeta(Map("y" -> 7L, "x" -> 6L), Map("y" -> 3L, "x" -> 2L),
      Map("a" -> VariableDef("long", Vector("y", "x"), -1.0)))
    val w = store.addVersion("d", m)
    val cell = (y: Int, x: Int) => ((y * 6 + x) * 7 % 11).toLong
    w.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L, 0L), Seq(7L, 6L)),
      (for (y <- 0 until 7; x <- 0 until 6) yield cell(y, x).toDouble))))
    val v = w.finishVersion()
    val got = Stencil.boxSum2d(spark, root, "d", "a", Some(v), radius = 1)
      .orderBy("y", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = for (y <- 0 until 7; x <- 0 until 6) yield {
      val nb = for {
        yy <- math.max(0, y - 1) to math.min(6, y + 1)
        xx <- math.max(0, x - 1) to math.min(5, x + 1)
      } yield cell(yy, xx)
      (y.toLong, x.toLong, nb.sum, nb.length.toLong)
    }
    assert(got == want.toSeq)
  }

  test("radius must stay below the chunk extent") {
    val root = java.nio.file.Files.createTempDirectory("graft_sten3").toString
    val store = new SparkStore(spark, root)
    store.create("d")
    val m = DatasetMeta(Map("h" -> 16L), Map("h" -> 4L),
      Map("a" -> VariableDef("long", Vector("h"), -1.0)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.empty(DType.LONG, Slice(Seq(0L), Seq(16L)), 1.0)))
    val v = w.finishVersion()
    val e = intercept[IllegalArgumentException] {
      Stencil.rollingAxis(spark, root, "d", "a", Some(v), axis = "h", radius = 4)
    }
    assert(e.getMessage.contains("chunk extent"))
  }
}
