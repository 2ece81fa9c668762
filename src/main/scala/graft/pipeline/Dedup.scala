package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: every step is shuffle-bounded by (doc, token) or by LSH
  * bucket — never all-pairs. Candidate generation is banded LSH
  * (shingle → minhash → band → bucket equi-join), so the quadratic step
  * only runs inside buckets. Hashing uses md5 hex strings compared
  * lexicographically — deterministic and engine-portable (the DuckDB
  * oracle computes the identical signatures).
  */
object Dedup {

  /** (doc_id, word) pairs, distinct — the word-set representation. */
  def wordSets(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("word")).distinct()

  /** (doc_id, shingle) pairs, distinct: character n-gram shingles over the
    * whitespace-normalized lowercase text — far more discriminative than
    * word sets when the vocabulary is small. */
  def shingleSets(docs: DataFrame, n: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " "))
    docs.select(col(idCol), explode(transform(
      sequence(lit(1), greatest(length(norm) - (n - 1), lit(1))),
      i => norm.substr(i, lit(n)))).as("word")).distinct()
  }

  /** Exact-dup statistics over the raw text. */
  def exactStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col(textCol)).as("n_unique"),
      (count(lit(1)) - countDistinct(col(textCol))).as("n_dups"))

  /** k-component MinHash signature per document: component i is the
    * lexicographic min over the word set of md5("i#" + word). */
  def minHashSignatures(words: DataFrame, k: Int): DataFrame = {
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(s"$i#"), col("word")))).as(s"sig$i"))
    words.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: signatures banded (2 components per band);
    * documents sharing any band bucket become a candidate pair (a < b).
    * Shingle-based (char 5-grams) — see shingleSets. */
  def minHashCandidatePairs(docs: DataFrame, k: Int = 8): DataFrame = {
    require(k % 2 == 0)
    val sigs = minHashSignatures(shingleSets(docs), k)
    val bands = (0 until k / 2).map(b =>
      struct(lit(b).as("band"), concat(col(s"sig${2 * b}"), col(s"sig${2 * b + 1}")).as("key")))
    val buckets = sigs.select(col("doc_id"), explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val l = buckets.select(col("band"), col("key"), col("doc_id").as("a"))
    val r = buckets.select(col("band"), col("key"), col("doc_id").as("b"))
    l.join(r, Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
      .orderBy("a", "b")
  }

  /** 16-bit SimHash from the word set: bit k is set when the majority of
    * words have the high bit of hex digit k of md5(word) set
    * (hex digit ≥ '8'). Returned as a 16-char '0'/'1' string. */
  def simHash16(docs: DataFrame): DataFrame = {
    val words = wordSets(docs)
    val bitCols = (1 to 16).map { k =>
      when(sum(when(substring(md5(col("word")), k, 1) >= "8", 1).otherwise(-1)) >= 0,
        lit("1")).otherwise(lit("0"))
    }
    words.groupBy("doc_id")
      .agg(concat(bitCols: _*).as("simhash16"))
      .orderBy("doc_id")
  }

  /** Word-set Jaccard between each document and its successor (by id)
    * within a language — integer intersection/union counts, thresholded
    * with exact cross-multiplication (inter*10 ≥ union ⇔ J ≥ 0.1). */
  def successorJaccard(docs: DataFrame, lang: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sel = docs.filter(col("lang") === lang).select("doc_id")
    val pairs = sel
      .withColumn("b", lead(col("doc_id"), 1).over(Window.orderBy("doc_id")))
      .filter(col("b").isNotNull)
      .select(col("doc_id").as("a"), col("b"))
    val words = wordSets(docs)
    val wa = words.select(col("doc_id").as("a"), col("word"))
    val wb = words.select(col("doc_id").as("b"), col("word"))
    val sizes = words.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = pairs.join(wa, "a").join(wb, Seq("b", "word"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("a", "b"), "left").na.fill(0L, Seq("inter"))
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
      .withColumn("uni", col("sza") + col("szb") - col("inter"))
      .filter(col("inter") * 10 >= col("uni"))
      .select(col("a"), col("b"), col("inter"), col("uni"))
      .orderBy("a", "b")
  }
}
