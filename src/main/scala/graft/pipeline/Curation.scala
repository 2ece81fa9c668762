package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines:
  * benchmark decontamination, deterministic stratified sampling,
  * sequence packing, and vocabulary building.
  *
  * Scale design notes (100 TB corpus):
  *  - decontamination joins the (huge) train gram set against the (small)
  *    eval gram set — the eval side is a benchmark suite, orders of
  *    magnitude smaller, so Spark broadcasts it and the train side never
  *    shuffles;
  *  - sampling is a pure per-row hash predicate — no shuffle, and
  *    deterministic across re-runs/retries (a random() sample is neither);
  *  - packing needs a global prefix sum, computed as a distributed scan
  *    (per-bucket partial sums + a constant-size offset table) instead of
  *    a single-task `ORDER BY` window;
  *  - vocabulary counting is a plain groupBy — map-side partial
  *    aggregation keeps the shuffle at O(distinct words), not O(tokens).
  *
  * All arithmetic is integer-exact and engine-portable; every operator has
  * a DuckDB oracle computing the identical function.
  */
object Curation {

  /** (doc_id, gram) word 5-grams, NOT deduplicated. The token array is
    * materialized as its own projection before the gram lambda: inlining
    * `tokens(text)` into the transform would re-run the regex split per
    * element_at — O(positions × n) splits per document (measured ~6 s vs
    * ~1 s over 5000 docs). */
  private def wordGrams(docs: DataFrame, n: Int = 5): DataFrame = {
    val toks = col("toks")
    docs.select(col("doc_id").cast("long").as("doc_id"),
        TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(
        when(size(toks) >= n,
          transform(sequence(lit(1), size(toks) - (n - 1)), i =>
            concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))
          .otherwise(array().cast("array<string>"))).as("gram"))
  }

  /** Benchmark decontamination: flag training documents sharing any
    * DISCRIMINATIVE word 5-gram with the held-out eval split
    * (doc_id % 10 == 0 here; in production the eval side is the benchmark
    * suite). Returns one row per CONTAMINATED train document: the number
    * of distinct shared grams and the number of distinct eval documents
    * hit.
    *
    * Grams appearing in more than `maxEvalDf` eval documents are excluded
    * as boilerplate — they carry no contamination signal, and on template-
    * heavy corpora they are exactly what makes the gram join quadratic
    * (same reasoning as the LSH bucket-size cap): with the cap, join
    * output is ≤ maxEvalDf × |train gram pairs| — linear in the corpus.
    *
    * The eval gram set is explicitly broadcast: a benchmark suite is MBs
    * while the train corpus is TBs, so the contamination check must not
    * shuffle the train side on the gram key. The TRAIN side is neither
    * deduplicated nor shuffled before the join — one full-corpus pass
    * feeding a broadcast hash join; duplicate grams are absorbed by the
    * countDistinct aggregation over the (rare-capped, therefore small)
    * join output. The eval branch reads only eval documents (the split
    * predicate pushes to the scan) and computes its df-filter with one
    * gram-partitioned window over that small side. */
  def decontaminate(docs: DataFrame, maxEvalDf: Int): DataFrame =
    decontaminate(docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0), maxEvalDf)

  /** Oracle wrapper: the eval split is the doc_id % 10 == 0 slice of the
    * one `documents` table (a self-contained, hash-checkable shape). */
  def decontaminate(docs: DataFrame): DataFrame = decontaminate(docs, 16)

  /** The real API: flag `train` documents sharing discriminative grams
    * with a CALLER-SUPPLIED `eval` corpus (both (doc_id, text)-shaped) —
    * in production the eval side is the benchmark suite, not a slice of
    * the training corpus. */
  def decontaminate(train: DataFrame, eval: DataFrame,
      maxEvalDf: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val evalGrams = wordGrams(eval)
      .withColumnRenamed("doc_id", "eval_id").distinct()
      // distinct (eval_id, gram) rows → per-gram count == eval document freq
      .withColumn("df", count(lit(1)).over(Window.partitionBy("gram")))
      .filter(col("df") <= maxEvalDf)
      .select("eval_id", "gram")
    wordGrams(train).join(broadcast(evalGrams), Seq("gram"))
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_hit_grams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .orderBy("doc_id")
  }

  /** Per-language sampling rates in 1/1000ths for the stratified sample.
    * Unlisted languages fall back to [[DefaultRatePerMille]]. */
  val SampleRates: Map[String, Long] =
    Map("en" -> 500L, "de" -> 250L, "es" -> 125L, "fr" -> 62L)
  val DefaultRatePerMille = 100L

  /** Deterministic stratified sample: keep a document when a hash of its
    * id lands under the stratum's rate. Shuffle-free (pure row-local
    * predicate) and reproducible — rerunning the pipeline, or a recomputed
    * partition after executor loss, selects the SAME rows, which a
    * `rand()`-based sample does not guarantee. The hash is a 32-bit md5
    * prefix of the decimal id — engine-portable and overflow-free for any
    * id (a multiplicative `id * 2654435761` wraps Long past id ≈ 3.5e9,
    * i.e. exactly at corpus scale). */
  def stratifiedSample(docs: DataFrame): DataFrame = {
    val hash = conv(substring(md5(col("doc_id").cast("long").cast("string")),
      1, 8), 16, 10).cast("long") % 1000L
    val rate = SampleRates.foldLeft(lit(DefaultRatePerMille)) {
      case (acc, (lang, r)) => when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"))
      .filter(hash < rate)
      .orderBy("doc_id")
  }

  /** Deterministic train/val/test split: a SALTED per-mille hash bucket
    * of the document id assigns val (< valPerMille), test (next
    * testPerMille), or train. Row-local and shuffle-free; a document's
    * split never depends on other documents, so it is stable under
    * retries, repartitioning, AND corpus growth (appending documents
    * never reassigns existing ones — the property that keeps eval sets
    * uncontaminated across dataset refreshes). The "split:" salt
    * decorrelates these buckets from [[stratifiedSample]]'s, so
    * sub-sampling a corpus never biases its splits. */
  def trainValTestSplit(docs: DataFrame, valPerMille: Int = 100,
      testPerMille: Int = 100): DataFrame = {
    require(valPerMille >= 0 && testPerMille >= 0 &&
      valPerMille + testPerMille <= 1000, "per-mille budgets must fit in 1000")
    val bucket = conv(substring(md5(concat(lit("split:"),
      col("doc_id").cast("long").cast("string"))), 1, 8), 16, 10)
      .cast("long") % 1000L
    docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
      when(bucket < valPerMille, "val")
        .when(bucket < valPerMille + testPerMille, "test")
        .otherwise("train").as("split"))
  }

  /** Token-budget corpus selection: the documents a greedy
    * quality-descending pass would keep while the running token total
    * stays ≤ `budgetTokens` — computed WITHOUT the global sort that
    * definition implies. Quality is the [[TextOps.qualityColumns]]
    * composite quantized to an integer (q_milli = round(quality·10⁴)),
    * so the selection order (q_milli desc, doc_id asc) is exact and
    * engine-reproducible.
    *
    * Two-phase at scale: (1) one map-side-combinable groupBy over the
    * ≤ 10 001 distinct quality buckets finds, on the driver, the
    * threshold bucket where the cumulative token total crosses the
    * budget; (2) everything strictly above the threshold passes with a
    * plain filter (no sort, no window), and only the THRESHOLD BUCKET —
    * the one place the greedy order matters — runs a doc_id-ordered
    * prefix window over its own (bounded, single-bucket) rows. A 100 TB
    * corpus moves one filter pass plus a histogram; the classic
    * `ORDER BY quality DESC` formulation would shuffle-sort everything.
    * Output: (doc_id, q_milli, tok) of the selected documents. */
  def tokenBudgetSelect(docs: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0, got $budgetTokens")
    // qualityColumns order: n_chars, n_tokens, punct_ratio, stop_ratio, quality
    val q = TextOps.qualityColumns(col("text"))
    val perDoc = docs
      .select(col("doc_id").cast("long").as("doc_id"), q(4), q(1))
      .select(col("doc_id"),
        round(col("quality") * 10000).cast("long").as("q_milli"),
        col("n_tokens").as("tok"))
    val buckets = perDoc.groupBy("q_milli")
      .agg(sum("tok").as("btok")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(-_._1)
    var acc = 0L
    var threshold = Long.MinValue // everything selected if budget never crossed
    var aboveSum = 0L
    buckets.takeWhile { case (qm, btok) =>
      if (acc + btok > budgetTokens) { threshold = qm; aboveSum = acc; false }
      else { acc += btok; true }
    }
    if (threshold == Long.MinValue)
      perDoc.orderBy("doc_id")
    else {
      val above = perDoc.filter(col("q_milli") > threshold)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_milli").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val tie = perDoc.filter(col("q_milli") === threshold)
        .withColumn("cum", sum("tok").over(w))
        .filter(col("cum") <= budgetTokens - aboveSum)
        .drop("cum")
      above.unionByName(tie).orderBy("doc_id")
    }
  }

  /** Target mixture weights in 1/1000ths of a copy per language: 1000
    * keeps a doc exactly once, 2300 emits 2 copies plus a third for 30%
    * of docs, 700 keeps 70%. Unlisted languages fall back to
    * [[DefaultMixPerMille]]. */
  val MixWeights: Map[String, Long] =
    Map("en" -> 700L, "de" -> 1000L, "es" -> 1500L, "fr" -> 2300L, "zh" -> 2000L)
  val DefaultMixPerMille = 500L

  /** Deterministic corpus mixing (the "data mixture" step of a training
    * pipeline): re-weight strata by emitting ⌊w/1000⌋ copies of every
    * document plus one more when an id hash lands under w mod 1000 —
    * up-sampling (w > 1000) and down-sampling (w < 1000) in one
    * operator. Returns one row per EMITTED COPY (doc_id, lang, copy).
    *
    * Shuffle-free and reproducible: the copy count is a pure row-local
    * function of (doc_id, lang) — same md5-prefix hash as
    * [[stratifiedSample]], overflow-free for any id — so a recomputed
    * partition after executor loss emits the SAME copies. At 100 TB the
    * explode multiplies only row COUNT downstream; no data moves to
    * produce the mixture. */
  def mixCorpus(docs: DataFrame, weights: Map[String, Long] = MixWeights,
      defaultPerMille: Long = DefaultMixPerMille): DataFrame = {
    val hash = conv(substring(md5(col("doc_id").cast("long").cast("string")),
      1, 8), 16, 10).cast("long") % 1000L
    val w = weights.foldLeft(lit(defaultPerMille)) {
      case (acc, (lang, r)) => when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    // ⌊w/1000⌋ is exact through the double divide (w is human-scale)
    val copies = floor(w.cast("double") / 1000.0).cast("long") +
      when(hash < w % 1000L, 1L).otherwise(0L)
    docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        copies.as("n_copies"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("copy"))
      .orderBy("doc_id", "copy")
  }

  /** Sequence packing: assign documents (in doc_id order) to fixed-size
    * token windows — document d goes to window `floor(tokens_before(d) /
    * seqLen)`, the contiguous packing used to build fixed-length training
    * batches. Returns per-window stats.
    *
    * The prefix sum is computed as a DISTRIBUTED scan: ids are
    * range-bucketed, each bucket computes its local running sum in
    * parallel (partition-local window), and bucket offsets come from a
    * ≤ nBuckets × nBuckets self-join — the classic two-pass prefix sum.
    * No global `ORDER BY` window (which would sort the corpus in one
    * task) anywhere. */
  def packSequences(docs: DataFrame, seqLen: Long = 2048L,
      nBuckets: Int = 256, tokensCol: Option[String] = None,
      idBounds: Option[(Long, Long)] = None): DataFrame = {
    val spark = docs.sparkSession
    // `idBounds`: a caller that knows a SUPERSET contiguous id range can
    // pass it and skip the eager bounds scan — which, when `docs` is the
    // tail of a heavy derivation chain (curatePipeline: tokenize →
    // fingerprint → dedup → sample), re-executed that whole chain once
    // before the real computation ran it again. Bucketing is correct for
    // ANY superset range: buckets stay contiguous id ranges, so the
    // (bucket, doc_id) order is the global doc_id order and the two-pass
    // prefix sum is unchanged — a wider span only leaves some buckets
    // empty.
    val (lo, hi) = idBounds.getOrElse {
      // id bounds need no tokenization — scan doc_id alone (column-pruned)
      val stats = docs.agg(min(col("doc_id").cast("long")),
        max(col("doc_id").cast("long"))).head()
      if (stats.isNullAt(0))
        return spark.emptyDataFrame
          .select(lit(0L).as("seq_id"), lit(0L).as("n_docs"), lit(0L).as("n_tokens"),
            lit(0L).as("first_doc"), lit(0L).as("last_doc")).limit(0)
      (stats.getLong(0), stats.getLong(1))
    }
    val span = math.max(hi - lo + 1, 1L)
    val width = math.max(1L, (span + nBuckets - 1) / nBuckets)
    // `tokensCol` lets a caller that ALREADY tokenized (e.g. a quality
    // gate's n_tokens) thread the count through instead of paying a
    // second full-corpus tokenization. Both paths count the SAME
    // tokenizer ([[TextOps.tokens]]): a different default (e.g. an
    // un-lowercased alnum regexp) diverges on Unicode where lowercasing
    // changes alnum runs, so chained and standalone packing would bin
    // documents differently on the same corpus.
    val toks = tokensCol match {
      case Some(c) => docs.select(col("doc_id").cast("long").as("doc_id"),
        col(c).cast("long").as("toks"))
      case None => docs.select(col("doc_id").cast("long").as("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("toks"))
    }
    // integer-exact bucketing (`div`, not `/` — long `/` promotes to double).
    // Eagerly checkpointed: the frame is consumed by BOTH the running-sum
    // branch and the bucket-totals branch — without materialization the
    // full-corpus tokenization runs twice. Three long columns, so the
    // checkpoint is tiny relative to the text it replaces.
    val bucketed = toks.withColumn("bucket", expr(s"(doc_id - ${lo}L) div ${width}L"))
      .localCheckpoint(true)
    val win = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = bucketed.withColumn("cum", sum(col("toks")).over(win))
    // bucket offsets: sum of all LESSER buckets' totals — a windowless
    // ≤ nBuckets² self-join on a constant-size frame, then broadcast back
    val btot = bucketed.groupBy("bucket").agg(sum(col("toks")).as("btot"))
    val offsets = btot.as("x")
      .join(btot.as("y"), col("y.bucket") < col("x.bucket"), "left")
      .groupBy(col("x.bucket").as("bucket"))
      .agg(coalesce(sum(col("y.btot")), lit(0L)).as("off"))
    within.join(broadcast(offsets), Seq("bucket"))
      .withColumn("before", col("off") + col("cum") - col("toks"))
      .withColumn("seq_id", expr(s"before div ${seqLen}L"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("seq_id")
  }

  /** Deterministic corpus shuffle: the globally-randomized training
    * order (position = rank of md5(doc_id) over the whole corpus),
    * computed WITHOUT a global single-partition sort.
    *
    * `row_number() OVER (ORDER BY hash)` funnels the corpus through one
    * window partition; instead the hash's first byte buckets rows into
    * 256 hash-uniform groups (heaviest partition ≈ corpus/256 regardless
    * of data skew — the bucket is derived from the hash itself), ranks
    * within each bucket, and adds the lesser-buckets offset from a
    * constant-size (≤ 256²) self-join broadcast back — the same two-pass
    * prefix shape as sequence packing. Deterministic under re-runs,
    * retries, and input order: every quantity is a pure function of
    * doc_id. Output: (doc_id, pos), pos ∈ [0, N). */
  def deterministicShuffle(docs: DataFrame): DataFrame = {
    // coalesce: both columns are join/partition keys downstream, and a
    // nullable key makes the inner join infer IsNotNull and re-run the
    // md5/conv chain inside three pushed filters (conv is always-nullable
    // in Catalyst). Neither fallback can fire on a non-null doc_id.
    val hashed = docs.select(col("doc_id").cast("long").as("doc_id"))
      .withColumn("h", coalesce(md5(col("doc_id").cast("string")), lit("")))
      .withColumn("bucket",
        coalesce(conv(substring(col("h"), 1, 2), 16, 10).cast("long"), lit(0L)))
    val win = Window.partitionBy("bucket").orderBy("h", "doc_id")
    val within = hashed.withColumn("rk", row_number().over(win).cast("long"))
    val btot = hashed.groupBy("bucket").agg(count(lit(1)).as("btot"))
    val offsets = btot.as("x")
      .join(btot.as("y"), col("y.bucket") < col("x.bucket"), "left")
      .groupBy(col("x.bucket").as("bucket"))
      .agg(coalesce(sum(col("y.btot")), lit(0L)).as("off"))
    within.join(broadcast(offsets), Seq("bucket"))
      .select(col("doc_id"), (col("off") + col("rk") - 1L).as("pos"))
      .orderBy("doc_id")
  }

  /** The canonical curation chain COMPOSED end-to-end: quality gate →
    * exact dedup (keep-first by doc_id) → deterministic stratified
    * sample → sequence packing. Every stage is the production operator
    * defined above — gating the composition as ONE oracle query keeps
    * the inter-stage contracts (column shapes, ordering assumptions,
    * determinism under recompute) continuously checked, which per-stage
    * gates alone do not. Scale shape is the union of the parts: one
    * fingerprint shuffle (dedup), row-local predicates (gate + sample),
    * and the two-pass distributed prefix sum (packing). */
  def curatePipeline(docs: DataFrame, minTokens: Long = 20L,
      minQuality: Double = 0.3): DataFrame = {
    // fan-out: the gate stage's tokenize/quality columns are CPU-bound
    // row-local work, otherwise serialized by the corpus file count
    val q = graft.operators.FanOut.byKey(docs, col("doc_id"))
      .select(Seq(col("doc_id").cast("long").as("doc_id"),
        col("lang"), col("text")) ++ TextOps.qualityColumns(col("text")): _*)
      .filter(col("n_tokens") >= minTokens && col("quality") >= minQuality)
    val fp = q.withColumn("fp", TextOps.fingerprint(col("text")))
    val deduped = fp.join(
      fp.groupBy("fp").agg(min("doc_id").as("doc_id")),
      Seq("fp", "doc_id"), "left_semi")
    val sampled = deduped.join(
      stratifiedSample(deduped).select("doc_id"), Seq("doc_id"), "left_semi")
    // the gate stage already tokenized — reuse its n_tokens so the
    // corpus is tokenized ONCE across the whole chain.
    // id bounds from the RAW input (one column-pruned scan of doc_id):
    // sampled ⊆ docs, so the range is a valid superset and packSequences
    // skips its own bounds pass — which would have re-executed the whole
    // tokenize → fingerprint → dedup → sample chain a second time
    val b = docs.agg(min(col("doc_id").cast("long")),
      max(col("doc_id").cast("long"))).head()
    packSequences(sampled, tokensCol = Some("n_tokens"),
      idBounds = if (b.isNullAt(0)) None else Some((b.getLong(0), b.getLong(1))))
  }

  /** Corpus vocabulary: the k most frequent tokens (frequency counts over
    * ALL occurrences, not per-document presence), deterministic tie-break
    * by word. Map-side partial aggregation bounds the shuffle at
    * O(distinct words). */
  def topKTokens(docs: DataFrame, k: Int = 100): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(k)

  /** Best-of-group selection: the top-k documents per (lang, source) by
    * length — the shape of "keep the N highest-quality docs per domain"
    * curation passes. One shuffle on the group key, per-group window (no
    * global sort); deterministic tie-break by doc_id. */
  def topDocsPerGroup(docs: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("lang", "source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs.select(col("lang"), col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("lang", "source", "rank")
  }

  /** Deterministic fixed-SIZE sample per group (hash reservoir): the k
    * docs with the smallest md5(doc_id) per group. stratifiedSample
    * draws a fixed RATE; audits and eval-set construction need a fixed
    * COUNT per stratum, stable under re-runs and row order (a true
    * reservoir sample is neither). One shuffle on the group key,
    * per-group window, hash tie-break by doc_id. */
  def reservoirPerGroup(docs: DataFrame, k: Int = 5): DataFrame = {
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.select(col("lang"), col("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .orderBy("lang", "rk")
  }

  /** Exact per-group quantiles by RANK SELECTION (type-1 / discrete): the
    * p-quantile is the element at row ⌈p·n⌉ of the group's sort — pure
    * integer/comparison arithmetic, so Spark and DuckDB agree bit-for-bit
    * (an interpolating quantile mixes libm-shaped float math into the
    * result; an approximate sketch isn't oracle-checkable at all).
    *
    * Scale shape: one shuffle on the group key + partition-local sort.
    * For a SINGLE giant group this would need range-partitioned selection
    * instead (the packing operator's two-pass prefix-sum trick); grouped
    * corpus stats have group-bounded partitions, which is the case here. */
  def exactQuantiles(docs: DataFrame,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val byLang = Window.partitionBy("lang")
    val ranked = docs.select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("rnk", row_number().over(
        byLang.orderBy(col("n_chars"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(byLang))
    ranked
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .filter(col("rnk") === ceil(col("p") * col("n")))
      .select(col("lang"), col("p"), col("n_chars").as("q"))
      .orderBy("lang", "p")
  }

  /** DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): rank raw documents
    * by how much they look like a TARGET distribution, using hashed
    * n-gram models of both.
    *
    * The published method scores log p_target(x) − log p_raw(x) under
    * hashed-bigram bag models; libm logs aren't bit-identical across
    * engines, so — like [[LangModel.bigramScore]] — the per-bucket
    * likelihood RATIO is kept as a scaled integer,
    *   w(b) = ⌊(c_target(b) + 1) · 10⁶ / (c_raw(b) + 1)⌋
    * and a document's score is the integer mean of w over its bigram
    * stream: a monotone rank-equivalent importance statistic (smoothed,
    * so buckets unseen in the target down-weight rather than −∞).
    *
    * Scale shape: the tokenize + md5 gram stream — the CPU-dominant part —
    * is materialized ONCE as per-(doc, bucket) counts (map-side combine
    * bounds the shuffle at ≤ `buckets` rows per document regardless of
    * document length); the bucket model is a second-stage aggregate of
    * that compacted frame (≤ `buckets` rows total) and broadcasts back
    * onto it, so no per-gram row ever shuffles or is computed twice.
    * Selecting top-k is TakeOrdered, not a sort. (The previous shape
    * recomputed the whole gram stream on both sides of the model join —
    * two full tokenize+md5 passes over the corpus.) */
  def dsirTopDocs(docs: DataFrame, targetPred: Column,
      buckets: Int = 1024, topK: Int = 40): DataFrame = {
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), targetPred.as("is_target"),
        TextOps.tokens(col("text")).as("t"))
    val grams = base.select(col("doc_id"), col("is_target"),
        explode(TextOps.bigramsOf(col("t"))).as("g"))
      // coalesce carries a PROVABLY-NON-NULL bucket id downstream: `conv`
      // is always-nullable in Catalyst (whatever its input), so without it
      // the inner join on `b` infers IsNotNull(b), and pushing that filter
      // through this projection substitutes — and re-evaluates — the whole
      // md5→conv→pmod chain once more per gram (~20% of the query). The
      // branch itself never fires: md5 hex is always valid conv input.
      .withColumn("b",
        coalesce(pmod(conv(substring(md5(col("g")), 1, 8), 16, 10)
          .cast("long"), lit(buckets.toLong)), lit(0L)))
    // is_target is constant per doc, so it groups through for free
    val docBucket = grams.groupBy("doc_id", "is_target", "b")
      .agg(count(lit(1)).as("cnt"))
    val model = docBucket.groupBy("b").agg(
      sum(when(col("is_target"), col("cnt")).otherwise(0L)).as("ct"),
      sum(col("cnt")).as("cr"))
    docBucket.join(broadcast(model), "b")
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_grams"),
        expr("sum(cnt * (((ct + 1) * 1000000L) div (cr + 1)))").as("w_sum"))
      .withColumn("dsir_w", expr("w_sum div n_grams"))
      .select(col("doc_id"), col("n_grams"), col("dsir_w"))
      .orderBy(col("dsir_w").desc, col("doc_id"))
      .limit(topK)
  }
}
