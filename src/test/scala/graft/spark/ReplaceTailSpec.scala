package graft.spark

import graft.SparkTestSession
import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-delta semantics across a per-variable REPLACE version. */
class ReplaceTailSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def meta = DatasetMeta(
    dimensions = Map("h" -> 16L),
    chunkDimensions = Map("h" -> 8L),
    variables = Map("a" -> VariableDef("long", Vector("h"), -1.0)))

  private def fixture(): (SparkStore, Long, Long) = {
    val store = new SparkStore(spark,
      java.nio.file.Files.createTempDirectory("graft_rt").toString)
    store.create("d")
    val w1 = store.addVersion("d", meta)
    w1.write("a", Seq(Slab.empty(DType.LONG, Slice(Seq(0L), Seq(16L)), 3.0)))
    val v1 = w1.finishVersion()
    Thread.sleep(2)
    val w2 = store.addReplaceVersion("d", meta, "a")
    w2.write("a", Seq(Slab.empty(DType.LONG, Slice(Seq(0L), Seq(8L)), 9.0)))
    val v2 = w2.finishVersion()
    (store, v1, v2)
  }

  test("fresh backfill (from = 0) across a replace resolves the " +
      "post-replace state only") {
    val (store, _, v2) = fixture()
    val rows = store.resolvedIndexBetween("d", "a", 0L, v2)
      .collect().map(_.getAs[String]("coordKey")).toSet
    // only the replace version's single chunk [0,8) — the pre-replace
    // chunk of [8,16) must NOT appear (it reverted to fill)
    assert(rows == Set("0"))
  }

  test("a tailer WITH prior state crossing the replace fails loudly " +
      "with the restart version named") {
    val (store, v1, v2) = fixture()
    val e = intercept[IllegalStateException] {
      store.resolvedIndexBetween("d", "a", v1, v2).collect()
    }
    assert(e.getMessage.contains("REPLACE"))
    assert(e.getMessage.contains(v2.toString))
  }

  test("row-level DML versions (UPDATE/MERGE deltas) tail as ORDINARY " +
      "overlay deltas — a stateful tailer crossing them keeps working") {
    val store = new SparkStore(spark,
      java.nio.file.Files.createTempDirectory("graft_dmltail").toString)
    val root = store.root
    store.create("d")
    val w1 = store.addVersion("d", meta)
    w1.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L), Seq(16L)), (0 until 16).map(_.toDouble))))
    val v1 = w1.finishVersion()
    val cat = "graft_" +
      java.lang.Integer.toHexString(root.hashCode & 0x7fffffff)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.spark.source.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    Thread.sleep(2)
    spark.sql(s"UPDATE $cat.d.a SET value = value + 100 WHERE h >= 12")
    val v2 = store.versions("d").head._2
    // unlike a replace, the DML version is a plain overlay: the
    // incremental index between v1 and v2 is exactly the touched chunk
    val delta = store.resolvedIndexBetween("d", "a", v1, v2)
      .collect().map(_.getAs[String]("coordKey")).toSet
    assert(delta == Set("1")) // h in [12,16) lives in chunk 1 of 2
  }
}
