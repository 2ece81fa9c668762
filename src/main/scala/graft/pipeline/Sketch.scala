package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches: KMV (k minimum values) and a
  * pinned-layout HyperLogLog.
  *
  * Off-the-shelf HyperLogLog implementations are engine-specific (register
  * layouts and bias tables differ), so they can't be oracle-checked across
  * engines; `hllDistinctDocs` sidesteps that by pinning the layout to
  * integer-exact md5 register math both engines compute identically.
  * KMV is the simpler portable sketch: hash every element to a uniform
  * 32-bit value, keep the k smallest DISTINCT hashes, and estimate
  * cardinality as `(k-1) / fraction-of-hash-space-covered`. With md5 as
  * the hash and integer-exact division, two engines produce bit-identical
  * sketches AND estimates.
  *
  * Scale: the per-partition work is a local top-k (Spark's
  * TakeOrderedAndProject — partial per partition, k-way merge of
  * k-element lists), so the full element set never shuffles; k is a small
  * constant (64 here; relative error ~ 1/sqrt(k) ≈ 12%). This is the
  * sketch pattern a 100 TB distinct-count runs on when an exact
  * countDistinct's shuffle is the bottleneck.
  */
object Sketch {

  /** KMV estimate of the number of DISTINCT documents (by raw text).
    * Returns one row: (k_actual, kth_hv, est_distinct, n_exact) — exact
    * count included for side-by-side error inspection. When the corpus has
    * fewer than k distinct hashes the sketch IS the exact count. */
  def kmvDistinctDocs(docs: DataFrame, k: Int = 64): DataFrame = {
    // first 8 md5 hex chars = uniform 32-bit hash, integer-exact everywhere.
    // NULL texts are excluded explicitly: Spark sorts nulls FIRST ascending
    // (a null hv would enter the top-k) while DuckDB sorts them LAST —
    // and a null is not a document either way.
    val hv = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
    val hashes = docs.filter(col("text").isNotNull).select(hv.as("hv")).distinct()
    val sketch = hashes.orderBy("hv").limit(k)
      .agg(count(lit(1)).as("k_actual"), max(col("hv")).as("kth_hv"))
    val exact = docs.agg(countDistinct(col("text")).as("n_exact"))
    sketch.crossJoin(exact)
      .select(col("k_actual"), col("kth_hv"),
        when(col("k_actual") < k, col("k_actual"))
          .otherwise(expr(s"((k_actual - 1) * 4294967296L) div kth_hv"))
          .as("est_distinct"),
        col("n_exact"))
  }

  /** HyperLogLog distinct estimate with FULLY DETERMINISTIC, integer-exact
    * register math — the cross-engine-checkable HLL the header note above
    * says generic HLLs can't be: registers, ranks, and the harmonic-mean
    * denominator are all integers derived from md5, and the only float op
    * is one division by a shared literal constant (same IEEE double in
    * both engines), so the estimate hash-matches the DuckDB oracle.
    *
    * Layout (m = 256): register = first md5 byte; w = next 24 bits;
    * rank = leading zeros of w in 24 bits + 1 (via `25 - length(bin(w))`,
    * integer in both engines; w = 0 → 25). The denominator Σ 2^(−M_j) is
    * scaled by 2^25 so every term is an integer: occupied registers
    * contribute 2^(25−M_j), empty ones 2^25. Raw estimate =
    * ⌊α·m²·2^25 / S⌋ with α·m²·2^25 embedded as one double literal.
    *
    * Scale: this is THE billion-row distinct-count shape — per-partition
    * register maxima merge associatively (shuffle is m rows after map-side
    * combine), registers merge across days/sources by max. `regime` flags
    * when production would switch to the linear-counting small-range
    * correction (est < 2.5m with empty registers) — reported rather than
    * applied because ln() is not cross-engine exact. */
  def hllDistinctDocs(docs: DataFrame): DataFrame = {
    val m = 256
    val h = md5(col("text"))
    val regs = docs.filter(col("text").isNotNull)
      .select(
        conv(substring(h, 1, 2), 16, 10).cast("long").as("reg"),
        conv(substring(h, 3, 6), 16, 10).cast("long").as("w"))
      .select(col("reg"),
        when(col("w") === 0L, lit(25L))
          .otherwise(lit(25L) - length(bin(col("w")))).as("rank"))
      .groupBy("reg").agg(max("rank").as("maxrank"))
    val s = regs.agg(
      count(lit(1)).as("n_occ"),
      sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(25 - maxrank AS INT))"))
        .as("s_occ"))
    val exact = docs.agg(countDistinct(col("text")).as("n_exact"))
    s.crossJoin(exact)
      .withColumn("s_scaled",
        col("s_occ") + (lit(m.toLong) - col("n_occ")) * lit(33554432L))
      .withColumn("est_hll",
        floor(lit(1579498136381.3938) / col("s_scaled").cast("double"))
          .cast("long"))
      .select(lit(m.toLong).as("m"), col("n_occ"), col("s_scaled"),
        col("est_hll"),
        when(col("n_occ") < m && col("est_hll") < lit((2.5 * m).toLong),
          lit("linear_counting")).otherwise(lit("raw")).as("regime"),
        col("n_exact"))
  }

  /** Per-group variant of `hllDistinctDocs` — same pinned register
    * layout, one sketch per group key (shuffle = groups × occupied
    * registers after map-side combine; the per-group state registers
    * merge associatively across days/sources by max, which is what makes
    * this the incremental-rollup distinct shape). */
  def hllDistinctPerGroup(df: DataFrame, valueCol: String,
      groupCol: String): DataFrame = {
    val h = md5(col(valueCol).cast("string"))
    val regs = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"),
        conv(substring(h, 1, 2), 16, 10).cast("long").as("reg"),
        conv(substring(h, 3, 6), 16, 10).cast("long").as("w"))
      .select(col("grp"), col("reg"),
        when(col("w") === 0L, lit(25L))
          .otherwise(lit(25L) - length(bin(col("w")))).as("rank"))
      .groupBy("grp", "reg").agg(max("rank").as("maxrank"))
    regs.groupBy("grp").agg(
        count(lit(1)).as("n_occ"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(25 - maxrank AS INT))"))
          .as("s_occ"))
      .withColumn("s_scaled",
        col("s_occ") + (lit(256L) - col("n_occ")) * lit(33554432L))
      .select(col("grp").as(groupCol), col("s_scaled"),
        floor(lit(1579498136381.3938) / col("s_scaled").cast("double"))
          .cast("long").as("est_distinct"))
      .orderBy(groupCol)
  }

  /** One-pass histogram quantiles: per-group fixed-width-bin counts, the
    * quantile estimate is the LOWER BOUND of the first bin whose
    * cumulative count reaches ⌈q‰·n/1000⌉. Error is bounded by
    * `binWidth` — choose it from the domain, not the data.
    *
    * This is the sketch answer to the exact-quantile scale caveat
    * (Curation.exactQuantiles documents it): exact rank selection
    * shuffles every row on the group key, and one giant group sorts in
    * one task. Here the shuffle is O(groups × occupied bins) after
    * map-side combine — a 100 TB column with 1000 bins reduces to
    * thousands of rows — and the cumulative window runs over ≤ bins rows
    * per group. Everything is integer arithmetic plus one exactly-
    * rounded division/multiplication, so estimates hash-match the DuckDB
    * oracle. */
  def histogramQuantiles(df: DataFrame, valueCol: String, groupCol: String,
      binWidth: Double, qPerMille: Seq[Int] = Seq(500, 900, 990)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val binned = df
      .select(col(groupCol).as("grp"),
        floor(col(valueCol) / binWidth).cast("long").as("bin"))
      .groupBy("grp", "bin").agg(count(lit(1)).as("cnt"))
    val cum = binned
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy("grp").orderBy("bin")))
      .withColumn("n", sum("cnt").over(Window.partitionBy("grp")))
    // ⌈q·n/1000⌉ = (q·n + 999) div 1000 — integer-exact in BIGINT range
    val qs = qPerMille.toDF("q_permille")
    cum.join(broadcast(qs),
        col("cum") >= floor((col("q_permille") * col("n") + 999L)
          .cast("double") / 1000.0).cast("long"))
      .groupBy("grp", "q_permille")
      .agg(min("bin").as("bin"), max("n").as("n"))
      .select(col("grp").as(groupCol), col("q_permille"),
        (col("bin").cast("double") * binWidth).as("est"), col("n"))
      .orderBy(groupCol, "q_permille")
  }

  /** Term-frequency spectrum (count-of-counts): how many distinct terms
    * occur exactly `cnt` times — the Zipf/Good-Turing diagnostic a
    * corpus-quality pass reads before choosing vocabulary and rare-word
    * thresholds (a healthy natural corpus has a hapax-heavy power-law
    * tail; machine-generated text does not). Two map-side-combinable
    * aggregations: shuffle O(vocab) then O(distinct counts). */
  def termFrequencySpectrum(docs: DataFrame, k: Int = 50): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .groupBy("cnt").agg(count(lit(1)).as("n_terms"))
      .orderBy("cnt").limit(k)

  /** Count–min sketch over the corpus token stream, with the estimates
    * read back for a deterministic query set and the exact counts
    * alongside (CMS guarantee: `est >= exact`, equality when no bucket
    * collisions — both engines verify it row by row).
    *
    * Hash j of term t = first 8 md5 hex chars of "j:t" mod `width` —
    * integer-exact and replicated verbatim in the DuckDB oracle. The
    * sketch build is ONE map-side-combinable aggregation whose result is
    * at most `depth × width` rows regardless of corpus size; that is the
    * whole point at 100 TB — a 4×1024 integer table answers frequency
    * queries over any token stream, and sketches from different
    * partitions/days merge by cell-wise addition. The query terms here
    * (first `qTerms` distinct tokens of length ≥ `minLen`) keep the gate
    * deterministic; a production caller passes its own terms. */
  def countMinEstimates(docs: DataFrame, width: Int = 1024, depth: Int = 4,
      qTerms: Int = 20, minLen: Int = 5): DataFrame = {
    // Aggregate the token stream to VOCAB counts first: the sketch is a
    // weighted sum over distinct terms (Σ occurrences into a bucket =
    // Σ per-term counts into that bucket), so the `depth` md5s run per
    // DISTINCT term, not per token occurrence (~100× fewer on natural
    // text), the tokenize pass runs once instead of three times (sketch /
    // query-terms / exact sides all derive from the vocab frame and share
    // its exchange), and the only corpus-sized shuffle is the map-side-
    // combinable groupBy(term).
    val vocab = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("exact_cnt"))
    // coalesce marks the bucket PROVABLY NON-NULL (`conv` is always-
    // nullable in Catalyst): without it the bucket join infers
    // IsNotNull(bucket) on the sketch side and pushes it through the
    // projection by substitution, running the per-term md5 chain twice.
    // The fallback never fires — md5 hex is always valid conv input.
    def bucket(j: Column, w: Column): Column =
      coalesce(pmod(conv(substring(md5(concat(j.cast("string"), lit(":"), w)),
        1, 8), 16, 10).cast("long"), lit(width.toLong)), lit(0L))
    val depths = array((0 until depth).map(lit): _*)
    val sketch = vocab
      .select(explode(depths).as("j"), col("w"), col("exact_cnt"))
      .select(col("j"), bucket(col("j"), col("w")).as("bucket"), col("exact_cnt"))
      .groupBy("j", "bucket").agg(sum("exact_cnt").as("cnt"))
    val qt = vocab.filter(length(col("w")) >= minLen).select("w")
      .orderBy("w").limit(qTerms)
    val est = qt.crossJoin(sketch.sparkSession.range(depth).toDF("qj"))
      .select(col("w"), col("qj"), bucket(col("qj"), col("w")).as("qbucket"))
      .join(sketch, col("qj") === col("j") && col("qbucket") === col("bucket"),
        "left")
      .groupBy(col("w").as("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
    est.join(vocab.select(col("w").as("term"), col("exact_cnt")), Seq("term"))
      .orderBy("term")
  }
}
