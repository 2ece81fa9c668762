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

  test("windowDedup: keep-first rule over non-overlapping token windows") {
    // windows of 3 tokens: doc 1 = [a b c][d e f]; doc 2 repeats doc 1's
    // first window then a novel tail (partial window kept); doc 3 repeats
    // a window WITHIN itself; doc 4 empty
    val docs = docsDF(Seq(
      (1L, "a b c d e f", "en"),
      (2L, "a b c x y", "en"),
      (3L, "p q r p q r", "en"),
      (4L, "", "en")))
    val got = Dedup.windowDedup(docs, windowTokens = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((2L, 0L)))           // first occurrences
    assert(got(2L) == ((2L, 1L)))           // [a b c] seen in doc 1; [x y] novel
    assert(got(3L) == ((2L, 1L)))           // second [p q r] dups the first
    assert(!got.contains(4L))               // empty doc: no windows
  }

  test("substringDupStats: offset-shifted shared spans are caught; unique text is not") {
    // docs 1 and 2 share a 30-char span at DIFFERENT offsets (2 and 9 —
    // not congruent mod any stride > 1): content-keyed sampling must
    // still match them. doc 3 is unique; doc 4 shorter than k.
    val shared = "the quick brown fox jumps over"    // 30 chars
    val docs = docsDF(Seq(
      (1L, s"xy${shared}zzzzqqqq", "en"),
      (2L, s"abcdefghi${shared}kk", "en"),
      (3L, "completely original content with no repeats anywhere at all", "en"),
      (4L, "tiny", "en")))
    // p=1: no sampling, every k-gram counted — exact semantics
    val got = Dedup.substringDupStats(docs, k = 20, p = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // shared span of length 30 holds 11 20-grams, identical in both docs
    assert(got(1L)._2 >= 11L, s"doc 1 missed the shared span: ${got(1L)}")
    assert(got(2L)._2 >= 11L, s"doc 2 missed the shared span: ${got(2L)}")
    assert(got(3L)._2 == 0L, s"unique doc flagged: ${got(3L)}")
    assert(got(4L) == ((0L, 0L)), "short doc must report zero grams")
    // every doc reports, n_grams = len - k + 1 for long docs
    assert(got(1L)._1 == docs.collect().find(_.getLong(0) == 1L).get
      .getString(1).length - 19L)
    // sampled run (p=8) only counts sampled grams, and dup ⊆ total
    val s8 = Dedup.substringDupStats(docs, k = 20, p = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(s8(1L)._1 <= got(1L)._1 && s8(1L)._2 <= s8(1L)._1)
  }

  test("windowDedup: ord encoding overflow fails loudly, not silently") {
    // |doc_id| >= 2^43 would overflow doc_id · 2^20 + w_idx and wrap the
    // keep-first ordering — the guard must fail the job, not dedup
    // against a corrupted order
    val docs = docsDF(Seq((1L << 43, "a b c", "en")))
    val e = intercept[Exception] {
      Dedup.windowDedup(docs, windowTokens = 3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("ord encoding out of range")),
      s"wrong failure: $e")
    // in-range ids are untouched by the guard
    val ok = Dedup.windowDedup(
      docsDF(Seq((OrdDocIdCapMinus1, "a b c", "en"))), windowTokens = 3)
    assert(ok.collect().length == 1)
  }
  private val OrdDocIdCapMinus1 = (1L << 43) - 1

  test("windowDedup matches a serial reference implementation on random corpora") {
    // small vocab forces plenty of genuine window collisions
    for (seed <- 0 until 5) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e")
      val corpus = (0L until 30L).map { i =>
        (i, Seq.fill(rnd.nextInt(50))(vocab(rnd.nextInt(vocab.size))).mkString(" "), "en")
      }
      val w = 4
      // serial truth: first occurrence in (doc, idx) order wins
      val seen = scala.collection.mutable.Set.empty[String]
      val expect = corpus.flatMap { case (id, text, _) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val wins = toks.grouped(w).map(_.mkString(" ")).toSeq
        if (wins.isEmpty) None
        else Some(id -> ((wins.size.toLong,
          wins.count { s => val dup = seen(s); seen += s; dup }.toLong)))
      }.toMap
      val got = Dedup.windowDedup(docsDF(corpus), windowTokens = w).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == expect, s"seed $seed")
    }
  }

  test("windowCleanedDocs: dup windows removed, reassembly fingerprinted, fully-dup docs vanish") {
    val docs = docsDF(Seq(
      (1L, "a b c d e f", "en"),   // [a b c][d e f] — all first occurrences
      (2L, "a b c x y", "en"),     // [a b c] dups doc 1 → only [x y] kept
      (5L, "a b c", "en")))        // every window a dup → doc disappears
    val got = Dedup.windowCleanedDocs(docs, windowTokens = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L)._1 == 2L && got(1L)._2 == 6L)
    assert(got(2L) == ((1L, 2L,
      java.security.MessageDigest.getInstance("MD5").digest("x y".getBytes)
        .map("%02x".format(_)).mkString)))
    assert(!got.contains(5L), "fully-duplicate doc survived cleaning")
  }

  test("labelOutliers: the vector farthest from its label centroid ranks first") {
    import graft.pipeline.Similarity
    import spark.implicits._
    // label 0: four near-identical vectors + one pointing the other way;
    // label 1: a clean cluster
    val emb = (Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(1f, 0.01f, 0f, 0f), 0),
      (2L, Array(1f, 0f, 0.01f, 0f), 0),
      (3L, Array(1f, 0.02f, 0f, 0f), 0),
      (4L, Array(-1f, 0f, 0f, 0f), 0),   // the planted mislabel
      (10L, Array(0f, 1f, 0f, 0f), 1),
      (11L, Array(0f, 1f, 0.01f, 0f), 1)))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.labelOutliers(emb, k = 1).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(3)))
    assert(got.contains((0, 4L, 1)), s"planted outlier not ranked first: ${got.toSeq}")
    assert(got.length == 2) // one bottom-1 row per label
  }

  test("scrubPii: redacts emails/phones/IPs with exact counts") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b+c@test.org and x@y.io call +49-123-4567 from 192.168.0.1 ok"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val got = TextOps.scrubPii(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((2L, 1L, 1L)))
    assert(got(2L) == ((0L, 0L, 0L)))
    // the redacted rendering is exact (check via recomputing the scrub)
    val scrubbed = df.filter(col("doc_id") === 1L).select(
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        TextOps.EmailRe, "<EMAIL>"), TextOps.PhoneRe, "<PHONE>"),
        TextOps.Ipv4Re, "<IP>")).head.getString(0)
    assert(scrubbed == "mail <EMAIL> and <EMAIL> call <PHONE> from <IP> ok")
    assert(TextOps.scrubPii(df).filter(col("doc_id") === 1L)
      .head.getAs[Long]("scrubbed_len") == scrubbed.length.toLong)
  }

  test("quantizedTopK: identical vectors rank first; zero vector never NaNs") {
    import graft.pipeline.Similarity
    import spark.implicits._
    // vec 0 and vec 10 identical; vec 1 is all-zero (degenerate); the rest
    // pseudo-random
    val emb = (0L until 20L).map { i =>
      val base: Array[Float] =
        if (i == 10L) Array.tabulate(8)(j => ((0 * 31 + j * 7) % 13).toFloat - 6f)
        else if (i == 1L) Array.fill(8)(0f)
        else Array.tabulate(8)(j => ((i * 31 + j * 7) % 13).toFloat - 6f)
      (i, base)
    }.toDF("vec_id", "embedding")
    val got = Similarity.quantizedTopK(emb, k = 3, nQueries = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // query 0's rank-1 neighbor is its identical copy (cos exactly 1)
    assert(got.contains((0L, 10L, 1)))
    // the zero-vector query answers (sim −2 everywhere, no NaN ordering):
    // k neighbors with deterministic id tie-break
    val q1 = got.filter(_._1 == 1L).map(_._2).toSeq
    assert(q1 == Seq(0L, 2L, 3L), s"zero-vector neighbors: $q1")
  }

  test("pqTopK: an exact duplicate shares codes and ranks first; ranks deterministic") {
    import graft.pipeline.Similarity
    import spark.implicits._
    // vec 0 and vec 10 identical (same sub-vectors → same codes → the
    // minimal ADC distance among all candidates); the rest pseudo-random
    val emb = (0L until 20L).map { i =>
      val src = if (i == 10L) 0L else i
      (i, Array.tabulate(8)(j => ((src * 31 + j * 7) % 13).toFloat - 6f))
    }.toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(emb, k = 3, nQueries = 2, m = 4, ksub = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.contains((0L, 10L, 1)), s"duplicate not rank 1: ${got.toSeq}")
    // k rows per query, ranks dense 1..k
    for (q <- Seq(0L, 1L))
      assert(got.filter(_._1 == q).map(_._3).sorted.toSeq == Seq(1, 2, 3))
    // deterministic under recompute
    val again = Similarity.pqTopK(emb, k = 3, nQueries = 2, m = 4, ksub = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("ivfPqTopK: duplicate in the probed list ranks first; ranks dense and deterministic") {
    import graft.pipeline.Similarity
    import spark.implicits._
    // vec 0 and vec 10 identical: same coarse assignment, same codes —
    // the query's own probed list contains the duplicate at ADC rank 1
    val emb = (0L until 24L).map { i =>
      val src = if (i == 10L) 0L else i
      (i, Array.tabulate(8)(j => ((src * 31 + j * 7) % 13).toFloat - 6f))
    }.toDF("vec_id", "embedding")
    val got = Similarity.ivfPqTopK(emb, k = 3, nQueries = 2, nCentroids = 4,
        nProbe = 2, m = 4, ksub = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // the duplicate's ADC is the global minimum (the query's own
    // quantization error) — under a coarse ksub=4 quantizer other
    // vectors may SHARE its codes and tie, and the id tie-break can
    // rank a lower id first, so assert membership in the top k
    assert(got.exists(t => t._1 == 0L && t._2 == 10L),
      s"duplicate missing from top-k: ${got.toSeq}")
    for (q <- Seq(0L, 1L)) {
      val ranks = got.filter(_._1 == q).map(_._3).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"ranks not dense for $q: $ranks")
      assert(ranks.nonEmpty)
    }
    val again = Similarity.ivfPqTopK(emb, k = 3, nQueries = 2, nCentroids = 4,
        nProbe = 2, m = 4, ksub = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("postingLists: df counts full, postings capped at first-k doc ids") {
    val docs = docsDF(
      (0L until 10L).map(i => (i, "common alpha", "en")) ++
        Seq((20L, "rare beta", "en")))
    val got = TextOps.postingLists(docs, k = 10, maxPostings = 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(got("common") == ((10L, Seq(0L, 1L, 2L))))  // df=10, first 3 kept
    assert(got("alpha")._1 == 10L)
    assert(got("rare") == ((1L, Seq(20L))))
  }

  test("saltedTopDocsPerGroup ≡ direct window top-k on a skewed corpus") {
    import spark.implicits._
    // one hot (lang, source) group with 90% of the rows, plus small ones;
    // n_chars collides heavily so the doc_id tie-break is load-bearing
    val rows = (0L until 1000L).map { i =>
      val (lang, src) = if (i < 900) ("en", "web") else ("de", "book" + i % 3)
      (i, lang, src, (i % 7) * 10 + 5)
    }
    val docs = rows.toDF("doc_id", "lang", "source", "n_chars")
    val direct = Curation.topDocsPerGroup(docs, k = 3).collect().toSeq
    val salted = graft.operators.Skew.saltedTopDocsPerGroup(docs, k = 3)
      .collect().toSeq
    assert(salted == direct)
    // and with k spanning the salt boundary (k > per-salt survivors)
    val d5 = Curation.topDocsPerGroup(docs, k = 5).collect().toSeq
    val s5 = graft.operators.Skew.saltedTopDocsPerGroup(docs, k = 5, salts = 4)
      .collect().toSeq
    assert(s5 == d5)
    // reservoir twin: same k-smallest-hash sample, salted
    val docs2 = rows.map { case (i, l, s, _) => (i, s"d $i", l) }
      .toDF("doc_id", "text", "lang")
    val dr = Curation.reservoirPerGroup(docs2, k = 7).collect().toSeq
    val sr = graft.operators.Skew.saltedReservoirPerGroup(docs2, k = 7)
      .collect().toSeq
    assert(sr == dr)
  }

  test("deterministicShuffle: exact permutation of [0,N), stable, " +
      "matches the single-window rank") {
    import org.apache.spark.sql.expressions.Window
    val docs = docsDF((0L until 300L).map(i => (i, s"t $i", "en")))
    val got = Curation.deterministicShuffle(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.map(_._2).sorted.toSeq == (0L until 300L))
    // equals the windowed definition (fine at test scale)
    val ref = docs.select(col("doc_id"))
      .withColumn("pos", row_number().over(
        Window.orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
        .cast("long") - 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.forall { case (id, p) => ref(id) == p })
  }

  test("dedupeNewBatchServe ≡ dedupeNewBatch from a persisted index") {
    val mk = (i: Long, t: String) => (i, t, "en")
    val corpus = docsDF((0L until 40L).map(i => mk(i, s"corpus text $i")) :+
      mk(40L, "shared exact text") :+ mk(41L, "alpha beta gamma delta"))
    val batch = docsDF(Seq(
      mk(100L, "shared exact text"),           // exact dup
      mk(101L, "alpha beta gamma delta zeta"), // near (shares shingles)
      mk(102L, "completely novel content")))
    val direct = Dedup.dedupeNewBatch(corpus, batch).collect().toSeq
    val idx = java.nio.file.Files.createTempDirectory("dedup-idx").toString
    Dedup.dedupIndexBuild(corpus, idx)
    val served = Dedup.dedupeNewBatchServe(batch, idx).collect().toSeq
    assert(served == direct)
    assert(direct.exists(r => r.getLong(0) == 100L && r.getLong(1) == 1L))
  }

  test("reservoirPerGroup: fixed count per group, deterministic") {
    val docs = docsDF((0L until 300L).map(i =>
      (i, s"d $i", if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr")))
    val a = Curation.reservoirPerGroup(docs, k = 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(a.groupBy(_._1).forall(_._2.length == 7), "exactly k per group")
    // stable under re-run and under a different row order
    val b = Curation.reservoirPerGroup(docs.orderBy(col("doc_id").desc), k = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("bpeMerges: greedy left-to-right non-overlapping merges, weighted " +
      "pair counts, lexicographic ties") {
    import spark.implicits._
    // "aaaa"×2 + "ab": step 1 (a,a) weight 3·2=6 merges GREEDILY to
    // [aa,aa] (overlap "aaa" must not produce a second merge at pos 2);
    // step 2 (aa,aa)=2; step 3 only (a,b)=1 remains
    val docs = Seq((0L, "aaaa aaaa ab")).toDF("doc_id", "text")
    val got = graft.pipeline.TextOps.bpeMerges(docs, nMerges = 3)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a", "a", "aa", 6L),
      (2L, "aa", "aa", "aaaa", 2L),
      (3L, "a", "b", "ab", 1L)))
  }

  test("countMinEstimates: est >= exact for every term, exact when the " +
      "vocabulary is far below the sketch width") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha alpha bravo charlie"),
      (1L, "alpha bravo bravo delta echo"),
      (2L, "charlie charlie charlie foxtrot")).toDF("doc_id", "text")
    val got = Sketch.countMinEstimates(docs, width = 1024, depth = 4,
      qTerms = 20, minLen = 5)
      .as[(String, Long, Long)].collect()
      .map { case (t, e, x) => t -> (e, x) }.toMap
    // 6 distinct tokens in a 4×1024 sketch: collision probability per
    // depth pair ~ 15/1024; with depth 4 the min over rows is exact here
    val want = Map("alpha" -> 3L, "bravo" -> 3L, "charlie" -> 4L,
      "delta" -> 1L, "foxtrot" -> 1L)
    want.foreach { case (t, x) =>
      assert(got(t)._2 == x, s"exact($t)")
      assert(got(t)._1 >= x, s"CMS lower bound violated for $t")
    }
    assert(got.forall { case (_, (e, x)) => e == x },
      s"unexpected collision at this size: $got")
  }

  test("boilerplateStats: segments repeated across >= dfThreshold docs " +
      "are counted per doc; short docs have zero segments") {
    import spark.implicits._
    val chrome = "subscribe to newsletter" // the planted boilerplate unit
    val docs = (0L until 5L).map(i =>
        (i, s"$chrome unique${i} body${i} tail${i} extra"))
      .toDF("doc_id", "text")
      .union(Seq((9L, "tiny doc")).toDF("doc_id", "text"))
    val got = TextOps.boilerplateStats(docs, segLen = 3, dfThreshold = 5)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // each long doc: 7 tokens → 2 segments, 1 boilerplate → 4 clean tokens
    (0L until 5L).foreach { i =>
      assert(got(i) == ((2L, 1L, 7L - 3L)), s"doc $i: ${got(i)}")
    }
    assert(got(9L) == ((0L, 0L, 2L))) // < segLen tokens: zero segments
    // raising the threshold above the corpus size finds no boilerplate
    val none = TextOps.boilerplateStats(docs, segLen = 3, dfThreshold = 6)
      .agg(sum("n_boiler")).collect().head.getLong(0)
    assert(none == 0L)
  }

  test("bm25Retrieve ranks term-dense short docs first, ties broken by doc_id") {
    import spark.implicits._
    val docs = Seq(
      (0L, "cat dog cat dog cat"),        // dense in both query terms
      (1L, "cat dog bird fish mouse horse goat sheep"), // both terms, longer
      (2L, "cat cat cat cat cat"),        // one term only, dense
      (3L, "bird fish mouse"),            // no query terms
      (4L, "cat dog cat dog cat"))        // tie with doc 0 → doc_id order
      .toDF("doc_id", "text")
    val got = TextOps.bm25Retrieve(docs, Seq(7 -> "cat dog"), k = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(4)))
    assert(got.length == 3)
    assert(got.map(_._1).forall(_ == 7))
    // docs 0 and 4 are identical → equal score, doc 0 first; doc 3 never appears
    assert(got.map(_._3).toSeq == Seq(0L, 4L, 1L))
    assert(got.map(_._4).toSeq == Seq(2L, 2L, 2L)) // both terms hit in top 3
    // the per-salt pre-pass never drops a global top-k row: salts=1 ≡ salts=8
    val oneSalt = TextOps.bm25Retrieve(docs, Seq(7 -> "cat dog"), k = 3, salts = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(4)))
    assert(oneSalt.toSeq == got.toSeq)
    // persistent index: serve ≡ one-shot; stale corpus detected
    val idx = java.nio.file.Files.createTempDirectory("bm25idx").toString
    TextOps.bm25BuildIndex(docs, idx)
    val served = TextOps.bm25QueryIndex(spark, idx, Seq(7 -> "cat dog"), k = 3,
        verifyCorpus = Some(docs))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(4)))
    assert(served.toSeq == got.toSeq)
    val grown = docs.union(Seq((9L, "cat dog extra")).toDF("doc_id", "text"))
    val e = intercept[IllegalArgumentException] {
      TextOps.bm25QueryIndex(spark, idx, Seq(7 -> "cat"), verifyCorpus = Some(grown))
    }
    assert(e.getMessage.contains("different corpus"))
  }
}
