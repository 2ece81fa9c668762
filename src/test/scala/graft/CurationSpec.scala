package graft

import graft.pipeline.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation operators: decontamination, deterministic sampling, sequence
  * packing (distributed prefix sum), vocabulary. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docsDF(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("decontaminate: train doc sharing a 5-gram with an eval doc is " +
      "flagged with exact gram/doc counts; clean docs are absent") {
    // eval docs 10, 20 share 'alpha beta gamma delta epsilon' with train
    // doc 11; train doc 13 is disjoint
    val docs = docsDF(Seq(
      (10L, "alpha beta gamma delta epsilon zeta", "en"),
      (20L, "zz alpha beta gamma delta epsilon yy", "en"),
      (11L, "alpha beta gamma delta epsilon omega", "en"),
      (13L, "one two three four five six seven", "en")))
    val got = Curation.decontaminate(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 11's grams: {alpha…epsilon, beta…omega}; only the first appears
    // in eval (docs 10 and 20) → 1 gram, 2 eval docs
    assert(got.toSeq == Seq((11L, 1L, 2L)))
  }

  test("decontaminate: caller-supplied eval corpus (the production shape)") {
    // eval is a SEPARATE table — ids may even collide with train ids
    val train = docsDF(Seq(
      (1L, "alpha beta gamma delta epsilon omega", "en"),
      (2L, "one two three four five six", "en")))
    val eval = docsDF(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en"),
      (7L, "pp alpha beta gamma delta epsilon qq", "en")))
    val got = Curation.decontaminate(train, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 2L)))
    // the split wrapper is the same function over a % 10 partition
    val docs = docsDF(Seq(
      (10L, "alpha beta gamma delta epsilon zeta", "en"),
      (11L, "alpha beta gamma delta epsilon omega", "en")))
    assert(Curation.decontaminate(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((11L, 1L, 1L)))
  }

  test("decontaminate: fewer than 5 tokens yields no grams, no crash") {
    val docs = docsDF(Seq((10L, "just four tokens here", "en"),
      (11L, "just four tokens here", "en")))
    assert(Curation.decontaminate(docs).count() == 0L)
  }

  test("decontaminate: boilerplate grams (eval-df above cap) carry no " +
      "contamination signal") {
    // the same 5-gram in 17 eval docs (> cap 16) and one train doc
    val boiler = "common one two three four"
    val evals = (1L to 17L).map(i => (i * 10L, s"$boiler tail$i", "en"))
    val docs = docsDF(evals :+ ((11L, boiler + " end", "en")))
    assert(Curation.decontaminate(docs, maxEvalDf = 16).count() == 0L)
    // with a cap of 17 the same input IS flagged
    assert(Curation.decontaminate(docs, maxEvalDf = 17).count() == 1L)
  }

  test("stratifiedSample: exact hash-predicate membership, deterministic") {
    val docs = docsDF((0L until 200L).map(i =>
      (i, "t", if (i % 2 == 0) "en" else "fr")))
    val got = Curation.stratifiedSample(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(i: Long): Long = {
      val d = md.digest(i.toString.getBytes("UTF-8"))
      (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % 1000L
    }
    val expected = (0L until 200L).flatMap { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      if (h(i) < Curation.SampleRates(lang)) Some((i, lang)) else None
    }
    assert(got.toSeq == expected)
    // en rate (500/1000) must sample more than fr (62/1000)
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang.getOrElse("en", 0) > byLang.getOrElse("fr", 0))
  }

  test("packSequences: windows partition the corpus in doc_id order with " +
      "exact prefix-sum boundaries, across bucket edges") {
    // 10 docs x 5 tokens; seqLen 12 → prefixes 0,5,10,...,45; windows
    // 0:{0,5,10}, 1:{15,20}, 2:{25,30,35}, 3:{40,45}
    val docs = docsDF((0L until 10L).map(i => (i, "a b c d e", "en")))
    val got = Curation.packSequences(docs, seqLen = 12L, nBuckets = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 3L, 15L, 0L, 2L), (1L, 2L, 10L, 3L, 4L),
      (2L, 3L, 15L, 5L, 7L), (3L, 2L, 10L, 8L, 9L)))
    // invariants: every doc packed exactly once, token total preserved
    assert(got.map(_._2).sum == 10L)
    assert(got.map(_._3).sum == 50L)
  }

  test("packSequences: sparse non-contiguous ids and empty input") {
    val docs = docsDF(Seq((5L, "a b", "en"), (1000L, "c d e", "en"),
      (999999L, "f", "en")))
    val got = Curation.packSequences(docs, seqLen = 4L, nBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // prefixes: 5→0, 1000→2, 999999→5; windows 0:{5,1000}, 1:{999999}
    assert(got.toSeq == Seq((0L, 2L, 5L), (1L, 1L, 1L)))
    assert(Curation.packSequences(docsDF(Seq()), 4L).count() == 0L)
  }

  test("topKTokens: frequency counts with deterministic word tie-break") {
    val docs = docsDF(Seq(
      (1L, "b b a a", "en"), (2L, "b c C!", "en")))
    val got = Curation.topKTokens(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // counts: b=3, a=2, c=2 → top2 = b, then a (tie a/c broken by word)
    assert(got.toSeq == Seq(("b", 3L), ("a", 2L)))
  }

  test("bigrams: empty and one-token docs yield no pairs; pairs are adjacent") {
    import spark.implicits._
    val df = Seq((0L, "alpha beta gamma"), (1L, "solo"), (2L, ""), (3L, "x. y!"))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      graft.pipeline.TextOps.bigrams(col("text")).as("bg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got(0L) == List("alpha beta", "beta gamma"))
    assert(got(1L) == Nil && got(2L) == Nil)
    assert(got(3L) == List("x y")) // punctuation-split tokens still pair
  }

  test("tfidf: rare terms outrank common ones; k caps per doc; ties by term") {
    import spark.implicits._
    // 'shared' in all 3 docs (df=3), 'rare' only in doc 0 (df=1)
    val df = Seq((0L, "shared rare shared"), (1L, "shared common"),
      (2L, "shared common")).toDF("doc_id", "text")
    val got = graft.pipeline.TextOps.tfidfTopTerms(df, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(5)))
    // doc 0: rare (tf=1/df=1 → 1.0) beats shared (tf=2/df=3 → 0.67)
    assert(got.take(2).toSeq == Seq((0L, "rare", 1), (0L, "shared", 2)))
    assert(got.count(_._1 == 0L) == 2) // k cap
    // docs 1,2: common (1/2) beats shared (1/3)
    assert(got.filter(_._1 == 1L).map(_._2).toSeq == Seq("common", "shared"))
  }

  test("topDocsPerGroup: per-group cap and doc_id tie-break") {
    import spark.implicits._
    val df = Seq(
      (0L, "en", "s0", 10L), (1L, "en", "s0", 10L), (2L, "en", "s0", 5L),
      (3L, "en", "s0", 1L), (4L, "de", "s0", 7L))
      .toDF("doc_id", "lang", "source", "n_chars")
    val got = Curation.topDocsPerGroup(df, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getInt(4)))
    assert(got.toSeq == Seq(("de", 4L, 1),
      ("en", 0L, 1), ("en", 1L, 2), ("en", 2L, 3))) // tie 10/10 → doc_id order
  }

  test("exactQuantiles: rank selection incl. single-element groups") {
    import spark.implicits._
    val df = ((1L to 10L).map(i => (i, "en", i * 100L)) :+ ((99L, "de", 42L)))
      .toDF("doc_id", "lang", "n_chars")
    val got = Curation.exactQuantiles(df).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    // en: n=10 → ceil(.5*10)=5 → 500; ceil(.9*10)=9 → 900; ceil(.99*10)=10 → 1000
    // de: n=1 → all three quantiles are the single element
    assert(got.toSeq == Seq(
      ("de", 0.5, 42L), ("de", 0.9, 42L), ("de", 0.99, 42L),
      ("en", 0.5, 500L), ("en", 0.9, 900L), ("en", 0.99, 1000L)))
  }

  test("curatePipeline: gate drops short docs, dedup drops copies, output deterministic") {
    import spark.implicits._
    // stop-heavy base keeps quality well above the gate; ≥20 tokens
    val base = "the and of to in is that it was for a"
    def text(i: Long) = s"$base $base unique$i words here"
    val docs = ((0L until 100L).map(i => (i, text(i), "en")) ++ Seq(
      (200L, text(3), "en"),        // exact dup of doc 3 → dedup drops it
      (201L, "too short", "en")))   // 2 tokens → quality gate drops it
      .toDF("doc_id", "text", "lang")
    val out = Curation.curatePipeline(docs).collect()
    assert(out.nonEmpty)
    // neither the dup (keep-first keeps doc 3) nor the gated doc can
    // appear in any packed window's id range
    assert(out.map(_.getLong(4)).max <= 199L, "dropped doc leaked into packing")
    // windows partition the survivors: disjoint, orderly, counts add up
    val seqIds = out.map(_.getLong(0)).toSeq
    assert(seqIds == seqIds.sorted && seqIds.distinct == seqIds)
    assert(out.map(_.getLong(1)).sum <= 100L)
    // deterministic under re-run and row order
    val again = Curation.curatePipeline(docs.orderBy(col("doc_id").desc)).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("tokenBudgetSelect ≡ the greedy quality-descending prefix; " +
      "budget edges") {
    import spark.implicits._
    // quality dominated by token count (≤100 → ·0.5/100) → distinct
    // buckets per length; several docs share a length → threshold-bucket
    // tie-break by doc_id is exercised
    val docs = ((0 until 12).map(i => (i.toLong, Seq.fill(10 + (i % 4) * 10)("w").mkString(" "))) :+
      (99L -> "the and of to in")).toDF("doc_id", "text")
    val q = docs.select(col("doc_id"),
        graft.pipeline.TextOps.qualityColumns(col("text"))(4),
        graft.pipeline.TextOps.qualityColumns(col("text"))(1))
      .collect().map(r => (r.getLong(0),
        math.round(r.getDouble(1) * 10000), r.getLong(2)))
    // the operator's contract is the PREFIX cut (stop at the first doc
    // that would cross the budget), not skip-and-continue greedy
    def prefixCut(budget: Long) = {
      var cum = 0L
      q.sortBy { case (id, qm, _) => (-qm, id) }.takeWhile { case (_, _, t) =>
        cum += t; cum <= budget }.map(_._1).toSet
    }
    for (budget <- Seq(0L, 35L, 120L, 10000L)) {
      val got = Curation.tokenBudgetSelect(docs, budget)
        .collect().map(_.getLong(0)).toSet
      assert(got == prefixCut(budget), s"budget $budget")
    }
    // whole corpus fits → everything selected
    assert(Curation.tokenBudgetSelect(docs, 10000L).count() == 13)
  }

  test("trainValTestSplit: growth-stable, budget-respecting, decorrelated " +
      "from the sampling hash") {
    import spark.implicits._
    def mk(n: Int) = (0L until n.toLong).map(i => (i, "en")).toDF("doc_id", "lang")
    val small = Curation.trainValTestSplit(mk(200)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val grown = Curation.trainValTestSplit(mk(500)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // appending documents never reassigns existing ones
    assert(small.forall { case (id, s) => grown(id) == s })
    val counts = grown.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // ~10% each at per-mille 100: loose envelope, deterministic data
    assert(counts("val") >= 25 && counts("val") <= 75)
    assert(counts("test") >= 25 && counts("test") <= 75)
    // budgets are validated
    intercept[IllegalArgumentException] {
      Curation.trainValTestSplit(mk(10), valPerMille = 600, testPerMille = 600)
    }
  }

  test("dsirTopDocs: raw docs sharing the target's n-grams outrank " +
      "disjoint ones; target docs themselves rank highest") {
    // target (en): two docs over the 'alpha beta gamma' vocabulary.
    // raw doc 30 reuses that vocabulary, raw doc 31 is disjoint —
    // 30's buckets carry target mass, 31's don't.
    val docs = docsDF(Seq(
      (10L, "alpha beta gamma alpha beta gamma", "en"),
      (11L, "beta gamma alpha beta gamma alpha", "en"),
      (30L, "alpha beta gamma delta", "zh"),
      (31L, "one two three four five six seven", "zh")))
    val got = Curation.dsirTopDocs(docs, col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val w = got.toMap
    assert(got.map(_._1).toSet == Set(10L, 11L, 30L, 31L))
    assert(w(30L) > w(31L)) // target-like raw doc outranks disjoint raw doc
    assert(math.min(w(10L), w(11L)) > w(30L)) // pure-target docs on top
  }

  test("dsirTopDocs: weights are deterministic under repartitioning") {
    val docs = docsDF((0L until 40L).map(i =>
      (i, s"w${i % 7} w${(i * 3) % 11} w${(i * 5) % 13} w${i % 5}",
        if (i % 3 == 0) "en" else "zh")))
    val a = Curation.dsirTopDocs(docs, col("lang") === "en", topK = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = Curation.dsirTopDocs(docs.repartition(7), col("lang") === "en",
        topK = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b)
  }
}
