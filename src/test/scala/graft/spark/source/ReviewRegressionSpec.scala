package graft.spark.source

import graft.SparkTestSession
import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import graft.spark.SparkStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regressions for the round-3 review findings on the DSv2 source:
  * lsum-overflow chunks under min/max-only pushdown, Long.MaxValue filter
  * bounds, mixed-case options, chunked-scan runtime-filter exemption,
  * null rejection at ingest, and >2^53 zone-map pruning soundness. */
class ReviewRegressionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** long v, one chunk holding two Long.MaxValue cells → ingest-time
    * stats sum overflows (lsum = None). */
  private def mkOverflow(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft-rr").toString
    val store = new SparkStore(spark, root)
    store.create("ds")
    val meta = DatasetMeta(
      dimensions = Map("x" -> 4L), chunkDimensions = Map("x" -> 4L),
      variables = Map("v" -> VariableDef("long", Vector("x"), 0.0)))
    val w = store.addVersion("ds", meta)
    val slab = Slab.empty(DType.LONG, Slice(Seq(0L), Seq(4L)), 0.0)
    val bb = java.nio.ByteBuffer.wrap(slab.bytes)
    bb.putLong(0, Long.MaxValue); bb.putLong(8, Long.MaxValue)
    bb.putLong(16, 5L); bb.putLong(24, 7L)
    w.write("v", Seq(slab))
    w.finishVersion()
    root
  }

  private def load(root: String) =
    spark.read.format("graft").option("root", root)
      .option("dataset", "ds").option("variable", "v").load()

  test("min/max-only pushed aggregate over an lsum-overflow chunk succeeds") {
    val root = mkOverflow()
    val row = load(root).agg(min("value"), max("value")).collect()(0)
    assert(row.getLong(0) == 5L && row.getLong(1) == Long.MaxValue)
    // and a pushed SUM over the same chunk falls back to the wrapped decode
    val s = load(root).agg(sum("value")).collect()(0)
    assert(s.getLong(0) == Long.MaxValue + Long.MaxValue + 12L) // wraps, like Spark
  }

  test("Long.MaxValue comparison literals: tautologies keep all rows, " +
      "unsatisfiable predicates return none — no overflow wrap") {
    val root = mkOverflow()
    assert(load(root).filter(col("x") <= Long.MaxValue).count() == 4L)
    assert(load(root).filter(col("x") > Long.MaxValue).count() == 0L)
    assert(load(root).filter(col("x").isin(1L, Long.MaxValue)).count() == 1L)
  }

  test("zone-map value skipping stays sound above 2^53") {
    val root = mkOverflow()
    // stats lmax = Long.MaxValue (rounds when widened to double); the
    // matching cells must survive the skip decision
    assert(load(root).filter(col("value") > ((1L << 53) + 1L)).count() == 2L)
    assert(load(root).filter(col("value") >= Long.MaxValue).count() == 2L)
  }

  test("mixed-case reader options resolve: Version pins time travel") {
    val root = java.nio.file.Files.createTempDirectory("graft-case").toString
    val store = new SparkStore(spark, root)
    store.create("ds")
    val meta = DatasetMeta(
      dimensions = Map("x" -> 2L), chunkDimensions = Map("x" -> 2L),
      variables = Map("v" -> VariableDef("long", Vector("x"), 0.0)))
    val w1 = store.addVersion("ds", meta)
    w1.write("v", Seq(Slab.fromDoubles(DType.LONG, Slice(Seq(0L), Seq(2L)), Seq(1.0, 1.0))))
    val v1 = w1.finishVersion()
    val w2 = store.addVersion("ds", store.metadata("ds", v1))
    w2.write("v", Seq(Slab.fromDoubles(DType.LONG, Slice(Seq(0L), Seq(2L)), Seq(9.0, 9.0))))
    w2.finishVersion()
    val pinned = spark.read.format("graft").option("root", root)
      .option("Dataset", "ds").option("Variable", "v")
      .option("Version", v1.toString).load()
    assert(pinned.agg(max("value")).collect()(0).getLong(0) == 1L,
      "mixed-case Version option must pin the old version, not read latest")
  }

  test("chunked scans advertise no runtime-filter attributes " +
      "(KeyGroupedPartitioning must be preserved)") {
    val root = mkOverflow()
    val r = GraftSource.resolve(Map("root" -> root, "dataset" -> "ds",
      "variable" -> "v", "chunked" -> "true"))
    val scan = new GraftScanBuilder(r).build().asInstanceOf[GraftScan]
    assert(scan.filterAttributes().isEmpty)
    val plain = GraftSource.resolve(Map("root" -> root, "dataset" -> "ds",
      "variable" -> "v"))
    val pscan = new GraftScanBuilder(plain).build().asInstanceOf[GraftScan]
    assert(pscan.filterAttributes().nonEmpty)
  }

  test("ingest rejects null coordinates and values with a named column") {
    val root = java.nio.file.Files.createTempDirectory("graft-null").toString
    val store = new SparkStore(spark, root)
    store.create("ds")
    val meta = DatasetMeta(
      dimensions = Map("x" -> 4L), chunkDimensions = Map("x" -> 4L),
      variables = Map("v" -> VariableDef("long", Vector("x"), 0.0)))
    store.addVersion("ds", meta).finishVersion()
    import spark.implicits._
    val bad = Seq((Some(0L), None: Option[Long]), (Some(1L), Some(3L)))
      .toDF("x", "value")
    val ex = intercept[Exception] {
      bad.write.format("graft").option("root", root)
        .option("dataset", "ds").option("variable", "v")
        .mode("append").save()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // either rejection is fine as long as it names the column: Spark's
    // non-nullable-sink assert (fires when the INPUT schema is nullable)
    // or the source's raise_error guard (backstop when a non-nullable
    // input schema still carries nulls at runtime)
    assert(msgs(ex).exists(m => m.contains("null in column 'value'") ||
      (m.contains("NOT_NULL_ASSERT_VIOLATION") || m.contains("non-nullable"))),
      msgs(ex).mkString(" | "))
  }
}
