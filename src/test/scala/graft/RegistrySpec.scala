package graft

import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import graft.store.StoreRegistry
import org.scalatest.funsuite.AnyFunSuite

/** URI dispatch (P8, reference impl.clj:77-119) + V10 stats. */
class RegistrySpec extends AnyFunSuite {

  test("mem:// URIs open shared-root stores; parse handles dataset segments") {
    val spec = StoreRegistry.parse("mem://testroot/mydataset")
    assert(spec.scheme == "mem" && spec.root == "testroot" && spec.dataset.contains("mydataset"))
    assert(StoreRegistry.parse("file:///tmp/x").root == "/tmp/x")
    intercept[IllegalArgumentException] { StoreRegistry.parse("no-scheme-here") }
    intercept[IllegalArgumentException] { StoreRegistry.backend("s3://bucket/x") }

    val store = StoreRegistry.open("mem://registry-spec-root")
    store.create("ds")
    val w = store.writer("ds").addVersion(DatasetMeta(
      Map("x" -> 4L), Map("x" -> 2L),
      Map("v" -> VariableDef("int", Vector("x"), 0.0))))
    w.write("v", Seq(Slab.fromDoubles(DType.INT, Slice(Seq(0L), Seq(4L)), Seq(1, 2, 3, 4))))
    w.finishVersion()
    // same root URI → same store (shared-root semantics, mem.clj:15-17)
    val again = StoreRegistry.open("mem://registry-spec-root")
    assert(again.reader("ds").onLastVersion()
      .getSlice("v", Slice(Seq(2L), Seq(3L))).valueAt(Seq(2L)) == 3.0)
  }

  test("spark store getStats reports nonzero sizes after ingest") {
    val spark = SparkTestSession.spark
    val root = java.nio.file.Files.createTempDirectory("graft-stats").toString
    val store = new graft.spark.SparkStore(spark, root)
    store.create("ds")
    val w = store.addVersion("ds", DatasetMeta(
      Map("x" -> 10L), Map("x" -> 2L),
      Map("v" -> VariableDef("double", Vector("x"), 0.0))))
    w.write("v", Seq(Slab.fromDoubles(DType.DOUBLE, Slice(Seq(0L), Seq(10L)), (1 to 10).map(_.toDouble))))
    w.finishVersion()
    val stats = store.getStats("ds")
    assert(stats("metadata-size") > 0 && stats("index-size") > 0 && stats("data-size") > 0)
  }
}
