package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation for aggregation keys: two-stage SALTED aggregation.
  *
  * A `groupBy(key)` over a skewed corpus sends every row of a hot key to
  * one reducer — at 100 TB one partition carries a large fraction of the
  * data while the rest idle (map-side partial aggregation hides this only
  * while partials COMBINE; distinct-style or high-fanout states don't).
  * Salting splits each key into `salts` sub-groups first: stage 1
  * aggregates per (key, salt) — the hot key's rows spread over `salts`
  * reducers — and stage 2 merges exactly `salts` partial rows per key.
  * Results are identical to the direct aggregation for any decomposable
  * aggregate (count/sum/min/max).
  *
  * AQE's skew handling rebalances JOIN partitions at runtime; skewed
  * AGGREGATION keys still need explicit salting, which is why this ships
  * as a first-class operator. */
object Skew {

  /** Per-language doc counts and byte totals via salted two-stage
    * aggregation — bit-identical to the direct `groupBy("lang")`. The
    * salt is a deterministic function of doc_id (not `rand()`), so
    * retried tasks re-produce the same sub-groups. */
  def saltedDocStats(docs: DataFrame, salts: Int = 16): DataFrame =
    docs
      .withColumn("_salt", pmod(col("doc_id"), lit(salts.toLong)))
      .groupBy(col("lang"), col("_salt"))
      .agg(count(lit(1)).as("pc"), sum("n_chars").as("ps"),
        min("n_chars").as("pmin"), max("n_chars").as("pmax"))
      .groupBy("lang")
      .agg(sum("pc").as("n_docs"), sum("ps").as("sum_chars"),
        min("pmin").as("min_chars"), max("pmax").as("max_chars"))
      .orderBy("lang")

  /** Skew-safe top-k per group: two-stage SALTED window ranking,
    * row-identical to the direct per-group window for any TOTAL order.
    *
    * A plain `row_number().over(partitionBy(group))` sends EVERY row of a
    * hot group through one window partition — the aggregation-salting
    * problem again, but for ranking, where map-side combine never helps.
    * Stage 1 ranks within (group, salt) — a hot group's rows spread over
    * `salts` window partitions — and keeps each salt's top k, because a
    * row outside its own salt's top k cannot be in the group's top k.
    * Stage 2 re-ranks the ≤ k·salts survivors per group: the heaviest
    * partition anywhere in the plan holds max(|group|/salts, k·salts)
    * rows, never |group|. The order must be TOTAL (tie-broken) for the
    * two stages to be deterministic — the same requirement the direct
    * window already has for reproducibility.
    *
    * `rankCol` is appended (row_number, 1-based) after `df`'s columns. */
  def saltedTopK(df: DataFrame, groupCols: Seq[String],
      order: Seq[org.apache.spark.sql.Column], k: Int, salts: Int,
      saltOn: org.apache.spark.sql.Column,
      rankCol: String = "rank"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grp = groupCols.map(col)
    val w1 = Window.partitionBy(grp :+ col("_salt"): _*).orderBy(order: _*)
    val w2 = Window.partitionBy(grp: _*).orderBy(order: _*)
    df.withColumn("_salt", pmod(saltOn, lit(salts.toLong)))
      .withColumn("_srk", row_number().over(w1))
      .filter(col("_srk") <= k)
      .withColumn(rankCol, row_number().over(w2))
      .filter(col(rankCol) <= k)
      .drop("_salt", "_srk")
  }

  /** Skew-safe twin of `Curation.topDocsPerGroup` — identical output:
    * (lang, source, doc_id, n_chars, rank) by (lang, source, rank). */
  def saltedTopDocsPerGroup(docs: DataFrame, k: Int = 3,
      salts: Int = 16): DataFrame =
    saltedTopK(
      docs.select(col("lang"), col("source"), col("doc_id"), col("n_chars")),
      groupCols = Seq("lang", "source"),
      order = Seq(col("n_chars").desc, col("doc_id").asc),
      k = k, salts = salts, saltOn = col("doc_id"))
      .orderBy("lang", "source", "rank")

  /** Skew-safe equi-join for a HOT-KEY left side: the left's join key is
    * salted (deterministically, by `saltOn`), the ENTIRE right side is
    * replicated once per salt, and the join runs on (key, salt) — a hot
    * left key's rows land on `salts` reducers instead of one. Result is
    * row-identical to `left.join(right, keys)` (inner).
    *
    * This is the mitigation for the case AQE's skew-join split does NOT
    * cover: a build/probe side too large to broadcast, with left-key
    * frequencies so skewed that one post-shuffle partition still owns a
    * hot key after AQE splitting (AQE splits by partition size of the
    * LEFT; the matching right partition must then be replicated anyway —
    * this operator makes that replication explicit, bounded (`salts`×
    * |right|), and deterministic at plan time). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltOn: org.apache.spark.sql.Column, salts: Int = 8): DataFrame = {
    val l = left.withColumn("_salt", pmod(hash(saltOn), lit(salts)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }

  /** Skew-safe twin of `Curation.reservoirPerGroup` — the k smallest
    * md5(doc_id) per lang, identical output: (lang, doc_id, rk). A
    * fixed-count-per-stratum sample is exactly the shape that hits one
    * hot window partition per dominant language at corpus scale. */
  def saltedReservoirPerGroup(docs: DataFrame, k: Int = 5,
      salts: Int = 16): DataFrame =
    saltedTopK(
      docs.select(col("lang"), col("doc_id")),
      groupCols = Seq("lang"),
      order = Seq(md5(col("doc_id").cast("string")).asc, col("doc_id").asc),
      k = k, salts = salts, saltOn = col("doc_id"), rankCol = "rk")
      .orderBy("lang", "rk")
}
