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
}
