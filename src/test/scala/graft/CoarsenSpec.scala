package graft

import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import graft.spark.{Coarsen, SparkStore}
import org.scalatest.funsuite.AnyFunSuite

/** Block pooling over the chunked DSv2 scan — correctness against a
  * brute-force groupBy, and the shuffle-free plan when factors divide the
  * chunk extents. */
class CoarsenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mk2d(): (SparkStore, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft_coarse").toString
    val store = new SparkStore(spark, root)
    store.create("d")
    val m = DatasetMeta(Map("y" -> 12L, "x" -> 16L),
      Map("y" -> 4L, "x" -> 8L),
      Map("a" -> VariableDef("long", Vector("y", "x"), -1.0)))
    val w = store.addVersion("d", m)
    w.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L, 0L), Seq(12L, 16L)),
      (0 until 192).map(i => ((i * 7) % 23).toDouble))))
    w.finishVersion()
    (store, root)
  }

  private def brute(store: SparkStore, fy: Long, fx: Long) = {
    import org.apache.spark.sql.functions._
    store.reader("d").onVersion(store.versions("d").head._2)
      .exploded("a", Slice(Seq(0L, 0L), Seq(12L, 16L)))
      .groupBy(expr(s"y div $fy").as("y_c"), expr(s"x div $fx").as("x_c"))
      .agg(sum("value").as("v_sum"), count(lit(1)).as("n_cells"),
        min("value").as("v_min"), max("value").as("v_max"))
      .orderBy("y_c", "x_c").collect().map(_.toSeq).toSeq
  }

  test("aligned factors (divide chunk extents): values match brute force " +
      "and the plan has NO exchange") {
    val (store, root) = mk2d()
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val got = Coarsen.coarsen(spark, root, "d", "a",
      factors = Map("y" -> 2L, "x" -> 4L))
    assert(got.orderBy("y_c", "x_c").collect().map(_.toSeq).toSeq ==
      brute(store, 2L, 4L))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"aligned coarsen should be shuffle-free, got:\n$plan")
  }

  test("misaligned factors: two-stage combine still matches brute force") {
    val (store, root) = mk2d()
    // 5 does not divide chunk extent 4 (y) — blocks straddle chunks
    val got = Coarsen.coarsen(spark, root, "d", "a",
      factors = Map("y" -> 5L, "x" -> 3L))
    assert(got.orderBy("y_c", "x_c").collect().map(_.toSeq).toSeq ==
      brute(store, 5L, 3L))
  }

  test("factor 1 on an axis is a no-op for that axis") {
    val (store, root) = mk2d()
    val got = Coarsen.coarsen(spark, root, "d", "a",
      factors = Map("y" -> 4L))
    assert(got.orderBy("y_c", "x_c").collect().map(_.toSeq).toSeq ==
      brute(store, 4L, 1L))
  }
}
