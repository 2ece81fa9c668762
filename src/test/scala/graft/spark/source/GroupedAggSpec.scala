package graft.spark.source

import graft.SparkTestSession
import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import graft.spark.SparkStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grouped aggregate pushdown on `chunked=true` scans: groupBy(_chunk_*)
  * answers from per-chunk zone-map stats — interior chunks decode no blob
  * — and with v2 bucketing the keyed partials merge with no Exchange. */
class GroupedAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** long v over x[0,40) y[0,12), chunks 16×8: x rows 0..23 written with
    * v = x*100 + y, fill −5 beyond. Chunk grid is 3×2; the x=32.. column
    * of chunks is pure fill, x∈[16,24) chunks are boundary (partially
    * written), x∈[0,16) interior. */
  private def mk(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft-gagg").toString
    val store = new SparkStore(spark, root)
    store.create("ds")
    val meta = DatasetMeta(
      dimensions = Map("x" -> 40L, "y" -> 12L),
      chunkDimensions = Map("x" -> 16L, "y" -> 8L),
      variables = Map("v" -> VariableDef("long", Vector("x", "y"), -5.0)))
    val w = store.addVersion("ds", meta)
    val vals = for (x <- 0 until 24; y <- 0 until 12) yield (x * 100 + y).toDouble
    w.write("v", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L, 0L), Seq(24L, 12L)), vals)))
    w.finishVersion()
    root
  }

  private def loadChunked(root: String) =
    spark.read.format("graft").option("root", root)
      .option("dataset", "ds").option("variable", "v")
      .option("chunked", "true").load()

  test("groupBy(_chunk_*) pushes keyed partials; results match full scan") {
    val root = mk()
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val df = loadChunked(root)
        .groupBy("_chunk_x", "_chunk_y")
        .agg(min("value").as("mn"), max("value").as("mx"),
          sum("value").as("sm"), count(lit(1)).as("n"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("pushedAggregates="), plan.take(1500))
      assert(plan.contains("groupedBy=_chunk_x,_chunk_y"), plan.take(1500))
      // KeyGroupedPartitioning: the keyed merge needs no shuffle
      assert(!plan.contains("Exchange"), plan.take(1500))
      val got = df.orderBy("_chunk_x", "_chunk_y").collect()
      // reference: same aggregation over the unpushed (non-chunked) scan
      val ref = spark.read.format("graft").option("root", root)
        .option("dataset", "ds").option("variable", "v").load()
        .groupBy((col("x") / 16).cast("long").as("_chunk_x"),
          (col("y") / 8).cast("long").as("_chunk_y"))
        .agg(min("value").as("mn"), max("value").as("mx"),
          sum("value").as("sm"), count(lit(1)).as("n"))
        .orderBy("_chunk_x", "_chunk_y").collect()
      assert(got.length == 6 && got.toSeq == ref.toSeq)
    } finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
  }

  test("subset group key still pushes (partials merge across chunks)") {
    val root = mk()
    val df = loadChunked(root)
      .groupBy("_chunk_x").agg(sum("value").as("sm"), count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("groupedBy=_chunk_x"), plan.take(1500))
    val got = df.orderBy("_chunk_x").collect()
    assert(got.length == 3)
    assert(got.map(_.getLong(2)).toSeq == Seq(16L * 12, 16L * 12, 8L * 12))
    // row totals: chunk x-band 0 holds x 0..15 fully written
    val band0 = (for (x <- 0 until 16; y <- 0 until 12) yield x * 100L + y).sum
    assert(got(0).getLong(1) == band0)
    // band 2 (x 32..39) is pure fill
    assert(got(2).getLong(1) == -5L * 8 * 12)
  }

  test("grouped pushdown under a pushed dim window clips per chunk") {
    val root = mk()
    val df = loadChunked(root).filter(col("x") >= 8 && col("x") < 20)
      .groupBy("_chunk_x", "_chunk_y").agg(count(lit(1)).as("n"), max("value").as("mx"))
    assert(df.queryExecution.executedPlan.toString.contains("groupedBy="))
    val got = df.orderBy("_chunk_x", "_chunk_y").collect()
    // covering chunks: x-bands 0 (x 8..15) and 1 (x 16..19), y-bands 0,1
    assert(got.length == 4)
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 0L, 8L * 8), (0L, 1L, 8L * 4), (1L, 0L, 4L * 8), (1L, 1L, 4L * 4)))
    assert(got(3).getLong(3) == 19L * 100 + 11)
  }

  test("empty window with grouped pushdown yields zero groups") {
    val root = mk()
    val df = loadChunked(root).filter(col("x") >= 1000)
      .groupBy("_chunk_x").agg(count(lit(1)))
    assert(df.collect().isEmpty)
  }

  test("non-chunk group keys refuse pushdown (plain scan, same results)") {
    val root = mk()
    val df = loadChunked(root).groupBy("x").agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("pushedAggregates="), plan.take(1500))
    assert(df.collect().forall(_.getLong(1) == 12L))
  }
}
