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
}
