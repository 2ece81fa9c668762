package graft

import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import graft.spark.SparkStore
import graft.streaming.Rollup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incrementally-maintained coarsened materialized view. */
class RollupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("backfill + one delta refresh equals a full recompute, and the " +
      "refresh writes ONLY the affected view chunk") {
    val root = java.nio.file.Files.createTempDirectory("graft_roll").toString
    val store = new SparkStore(spark, root)
    store.create("src")
    val n = 18L
    val m = DatasetMeta(Map("h" -> n), Map("h" -> 8L),
      Map("a" -> VariableDef("long", Vector("h"), -1.0)))
    val w1 = store.addVersion("src", m)
    val vals = (0 until 18).map(i => ((i * 7) % 13).toLong)
    w1.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L), Seq(n)), vals.map(_.toDouble))))
    w1.finishVersion()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_roll_ck").toString
    Rollup.maintain(spark, root, "src", "a", "view", Map("h" -> 4L), ckpt)
    // view extent ceil(18/4)=5 blocks, chunk 8/4=2
    def view(): Seq[(Long, Long, Long)] = {
      def rd(v: String, as: String) = store.reader("view").onLastVersion()
        .exploded(v, Slice(Seq(0L), Seq(5L)))
        .select(col("h").as("h_c"), col("value").as(as))
      rd("sum", "s").join(rd("cnt", "c"), Seq("h_c")).orderBy("h_c")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    def expect(cur: Seq[Long]): Seq[(Long, Long, Long)] =
      (0 until 5).map { b =>
        val cells = cur.slice(b * 4, math.min(18, b * 4 + 4))
        (b.toLong, cells.sum, cells.length.toLong)
      }
    assert(view() == expect(vals))
    val sumVersionsAfterBackfill = store.versions("view").length

    // delta: rewrite cells [2,4) → src chunk 0 → view blocks 0,1 →
    // view chunk 0 only
    Thread.sleep(2)
    val w2 = store.addVersion("src", m)
    w2.write("a", Seq(Slab.empty(DType.LONG, Slice(Seq(2L), Seq(4L)), 100.0)))
    w2.finishVersion()
    Rollup.maintain(spark, root, "src", "a", "view", Map("h" -> 4L), ckpt)
    val cur = vals.zipWithIndex.map { case (v, i) =>
      if (i == 2 || i == 3) 100L else v }
    assert(view() == expect(cur))
    // the incremental refresh committed one version per view variable,
    // each writing exactly ONE chunk (blocks 0,1 live in view chunk 0)
    val vs = store.versions("view").map(_._2)
    assert(vs.length == sumVersionsAfterBackfill + 2)
    val idx = spark.read.parquet(store.indexDir("view"))
    val newRows = idx.filter(col("version").isin(vs.take(2): _*))
    assert(newRows.count() == 2, "one chunk per view variable")
    assert(newRows.select("coordKey").distinct().collect()
      .map(_.getString(0)).toSet == Set("0"))

    // idempotent: nothing new → no further versions
    Rollup.maintain(spark, root, "src", "a", "view", Map("h" -> 4L), ckpt)
    assert(store.versions("view").length == vs.length)
  }

  test("CALL graft.system.refresh_rollup drives the whole cycle from SQL " +
      "and reports versions committed (0 when idempotent)") {
    val root = java.nio.file.Files.createTempDirectory("graft_rollsql").toString
    val store = new SparkStore(spark, root)
    store.create("src")
    val m = DatasetMeta(Map("h" -> 16L), Map("h" -> 8L),
      Map("a" -> VariableDef("long", Vector("h"), -1.0)))
    val w = store.addVersion("src", m)
    w.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L), Seq(16L)), (1 to 16).map(_.toDouble))))
    w.finishVersion()
    val cat = "graft_" +
      java.lang.Integer.toHexString(root.hashCode & 0x7fffffff)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.spark.source.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rollsql_ck").toString
    val n1 = spark.sql(s"CALL $cat.system.refresh_rollup(" +
      s"'src', 'a', 'view', 'h:4', '$ckpt')").collect().head.getLong(0)
    assert(n1 == 2L) // sum + cnt versions from the backfill
    val sums = spark.sql(s"SELECT h, value FROM $cat.view.sum ORDER BY h")
      .collect().map(_.getLong(1)).toSeq
    assert(sums == Seq(1 + 2 + 3 + 4, 5 + 6 + 7 + 8, 9 + 10 + 11 + 12,
      13 + 14 + 15 + 16).map(_.toLong))
    // nothing new → zero versions committed
    val n2 = spark.sql(s"CALL $cat.system.refresh_rollup(" +
      s"'src', 'a', 'view', 'h:4', '$ckpt')").collect().head.getLong(0)
    assert(n2 == 0L)
  }

  test("refresh across a src compact: the checkpointed tail keeps working " +
      "and the view stays equal to a full recompute") {
    val root = java.nio.file.Files.createTempDirectory("graft_rollcp").toString
    val store = new SparkStore(spark, root)
    store.create("src")
    val m = DatasetMeta(Map("h" -> 16L), Map("h" -> 8L),
      Map("a" -> VariableDef("long", Vector("h"), -1.0)))
    val w1 = store.addVersion("src", m)
    w1.write("a", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L), Seq(16L)), (1 to 16).map(_.toDouble))))
    w1.finishVersion()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rollcp_ck").toString
    Rollup.maintain(spark, root, "src", "a", "view", Map("h" -> 4L), ckpt)
    // src gets a delta, then a CHECKPOINT version (compact)
    Thread.sleep(2)
    val w2 = store.addVersion("src", m)
    w2.write("a", Seq(Slab.empty(DType.LONG, Slice(Seq(0L), Seq(2L)), 50.0)))
    w2.finishVersion()
    store.compact("src")
    Rollup.maintain(spark, root, "src", "a", "view", Map("h" -> 4L), ckpt)
    def rd(v: String) = store.reader("view").onLastVersion()
      .exploded(v, Slice(Seq(0L), Seq(4L)))
      .orderBy("h").collect().map(_.getLong(1)).toSeq
    assert(rd("sum") == Seq(50L + 50 + 3 + 4, 5L + 6 + 7 + 8,
      9L + 10 + 11 + 12, 13L + 14 + 15 + 16))
    assert(rd("cnt") == Seq(4L, 4L, 4L, 4L))
  }

  test("a factor not dividing the chunk extent is rejected up front") {
    val root = java.nio.file.Files.createTempDirectory("graft_roll2").toString
    val store = new SparkStore(spark, root)
    store.create("src")
    val m = DatasetMeta(Map("h" -> 16L), Map("h" -> 8L),
      Map("a" -> VariableDef("long", Vector("h"), -1.0)))
    val w = store.addVersion("src", m)
    w.write("a", Seq(Slab.empty(DType.LONG, Slice(Seq(0L), Seq(16L)), 1.0)))
    w.finishVersion()
    val e = intercept[IllegalArgumentException] {
      Rollup.maintain(spark, root, "src", "a", "view", Map("h" -> 3L),
        java.nio.file.Files.createTempDirectory("graft_roll_ck2").toString)
    }
    assert(e.getMessage.contains("divide"))
  }
}
