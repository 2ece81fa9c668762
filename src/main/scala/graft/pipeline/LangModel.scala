package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics language-model scoring for quality filtering — the
  * CCNet-style "train a small LM on the corpus, rank documents by how
  * predictable they are" pass, re-expressed with integer-exact arithmetic
  * so the score hash-matches a SQL oracle.
  *
  * Model: add-one-smoothed bigram LM trained on the full corpus. The
  * classic score is perplexity = geometric mean of 1/P(w2|w1); geometric
  * means need logs, and libm log() is not bit-identical across engines, so
  * the score here is the ARITHMETIC mean of the scaled inverse probability
  *   inv(w1,w2) = ⌊(c(w1) + V) · 10⁶ / (c(w1 w2) + 1)⌋
  * — a monotone-equivalent predictability statistic (low = boilerplate /
  * repeated templates, high = novel or garbled text) built from three
  * integers: unigram count, bigram count, vocabulary size.
  *
  * Scale: training is two explode+groupBy passes (shuffle bounded by
  * distinct unigrams/bigrams after map-side combine — the same shape as
  * topKBigrams). Scoring joins the scored docs' bigram stream to the two
  * count tables hash-partitioned on the n-gram key; the vocabulary scalar
  * rides a broadcast. Nothing is ever collected to the driver.
  */
object LangModel {

  /** Score `scoreDocs` (default: doc_id < 200) against a bigram LM trained
    * on ALL of `docs`; returns the `limit` most-predictable documents
    * (ascending score, doc_id tie-break). */
  def bigramScore(docs: DataFrame, scoreDocIdBelow: Long = 200L,
      limit: Int = 25): DataFrame = {
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("t"))
    // OUTER generates + a null filter on the generated attribute: the
    // non-outer form triggers InferFiltersFromGenerate, whose size>0 and
    // isnotnull conjuncts push through `base`'s projection by
    // substitution and re-run the tokenize chain once per conjunct
    // (three passes per side). Row-identical: only an empty token array
    // emits the one all-null row the filter drops.
    val uni = base.select(explode_outer(col("t")).as("w"))
      .filter(col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bgAll = base.select(col("doc_id"), col("lang"),
      explode_outer(TextOps.bigramsOf(col("t"))).as("bigram"))
      .filter(col("bigram").isNotNull)
    val bi = bgAll.groupBy("bigram").agg(count(lit(1)).as("c2"))
    bgAll.filter(col("doc_id") < scoreDocIdBelow)
      .join(bi, "bigram") // trained on a superset of the scored docs → inner join keeps every bigram
      // coalesce: element_at is always-nullable, and the join on w1 would
      // infer IsNotNull(w1) and re-split per row; never fires (bigram is
      // non-null and split yields >= 1 element)
      .withColumn("w1",
        coalesce(element_at(split(col("bigram"), " "), 1), lit("")))
      .join(uni, col("w1") === uni("w"))
      .crossJoin(broadcast(vocab))
      .withColumn("inv", expr("((c1 + v) * 1000000L) div (c2 + 1)"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(inv) div count(1)").as("ppl_proxy"))
      .orderBy(col("ppl_proxy").asc, col("doc_id").asc)
      .limit(limit)
  }
}
