package graft

import graft.pipeline.{Curation, Dedup, Sketch, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 pipeline operators: intra-document repetition signals, corpus
  * mixing, histogram quantiles, incremental dedup against a corpus. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docsDF(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("repetitionStats: exact duplicate-token/3-gram/top-share fractions") {
    val docs = docsDF(Seq(
      (1L, "a b a b a b", "en"),          // 6 toks, 2 distinct; tris: 4, 2 distinct
      (2L, "one two three four", "en"),   // no repetition
      (3L, "x", "en"),                    // too short for 3-grams
      (4L, "", "en")))                    // empty
    val got = Dedup // touch import balance
      .exactStats(docs) // unrelated sanity: 4 docs
    assert(got.head.getLong(0) == 4L)
    val rep = TextOps.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rep(1L) == ((6L, 0.6667, 0.5, 0.5)))  // fractions round to 4 dp; top token 'a' ×3
    assert(rep(2L) == ((4L, 0.0, 0.0, 0.25)))
    assert(rep(3L) == ((1L, 0.0, 0.0, 1.0)))
    assert(rep(4L) == ((0L, 0.0, 0.0, 0.0)))
  }

  test("mixCorpus: copy counts follow floor(w/1000) + hash fraction") {
    val docs = docsDF((0L until 200L).map(i =>
      (i, s"doc $i", if (i % 2 == 0) "fr" else "de")))
    val got = Curation.mixCorpus(docs).groupBy("lang")
      .agg(count(lit(1)).as("copies"), countDistinct("doc_id").as("docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // de (w=1000): exactly one copy per doc
    assert(got("de") == ((100L, 100L)))
    // fr (w=2300): every doc kept, 2 or 3 copies each → 200..300 total
    val (frCopies, frDocs) = got("fr")
    assert(frDocs == 100L && frCopies >= 200L && frCopies <= 300L)
    // copy indexes are dense 0..n-1 per doc
    val copies = Curation.mixCorpus(docs).filter(col("doc_id") === 0L)
      .select("copy").collect().map(_.getLong(0)).sorted.toSeq
    assert(copies == (0L until copies.length.toLong))
    // determinism: two runs emit identical multisets
    assert(Curation.mixCorpus(docs).collect().toSeq.sorted(RowOrd) ==
      Curation.mixCorpus(docs).collect().toSeq.sorted(RowOrd))
  }

  private object RowOrd extends Ordering[org.apache.spark.sql.Row] {
    def compare(a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row): Int = {
      val c = java.lang.Long.compare(a.getLong(0), b.getLong(0))
      if (c != 0) c else java.lang.Long.compare(a.getLong(2), b.getLong(2))
    }
  }

  test("histogramQuantiles: estimate = lower bound of the covering bin") {
    import spark.implicits._
    // group g: values 0..99 → bins 0..9 (width 10), each holding 10
    val df = (0 until 100).map(v => ("g", v.toDouble)).toDF("grp", "v")
    val got = Sketch.histogramQuantiles(df, "v", "grp", binWidth = 10.0,
      qPerMille = Seq(500, 900, 990)).collect()
      .map(r => r.getInt(1) -> r.getDouble(2)).toMap
    // rank(500) = 50 → cum reaches 50 at bin 4 (cum 50); est = 40
    assert(got(500) == 40.0)
    assert(got(900) == 80.0)
    assert(got(990) == 90.0)
    // exactness when values collapse into one bin per group
    val df2 = Seq(("a", 5.0), ("a", 5.0), ("b", 25.0)).toDF("grp", "v")
    val one = Sketch.histogramQuantiles(df2, "v", "grp", 10.0, Seq(500))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(one == Map("a" -> 0.0, "b" -> 20.0))
  }

  test("dedupeNewBatch: exact dup, near dup, and novel docs classified") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = docsDF(Seq(
      (1L, base, "en"),
      (2L, "completely unrelated corpus text about spark query planning", "en")))
    val batch = docsDF(Seq(
      (10L, base, "en"),                        // exact dup of corpus doc 1
      (11L, base + " extra", "en"),             // near dup (shares shingles)
      (12L, "zzz qqq vvv www totally novel words here nothing shared", "en")))
    val got = Dedup.dedupeNewBatch(corpus, batch).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(10L)._1 == 1L && got(10L)._2 >= 1L)
    assert(got(11L)._1 == 0L && got(11L)._2 >= 1L, s"near dup: ${got(11L)}")
    assert(got(12L) == ((0L, 0L)))
    // every batch doc gets exactly one row, even when nothing matches
    assert(got.keySet == Set(10L, 11L, 12L))
  }
}
