package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames.
  *
  * PageRank here is INTEGER-EXACT: ranks are scaled longs and every
  * update is `150000 + (85·Σ⌊r/deg⌋) div 100` — floor divisions and long
  * sums only, so a fixed iteration count produces bit-identical ranks on
  * any engine/partitioning (float PageRank sums contributions in
  * nondeterministic order and drifts in the last ulps). The ⌊·⌋ losses
  * are bounded (≤ deg per node per round) and irrelevant for ranking.
  *
  * Scale shape: per round, ranks (O(V)) shuffle onto the edge
  * partitioning (edges stay hash-partitioned on src across rounds —
  * Spark reuses the exchange), then one groupBy(dst) aggregates
  * contributions map-side. Nothing is collected to the driver and the
  * edge set is never rewritten. A production run at depth would
  * `localCheckpoint` the rank frame each round to truncate lineage
  * (exactly as `Dedup.duplicateClusters` does); at the fixed shallow
  * depth used by the gate the plan stays small without it.
  */
object Graph {

  /** `edges`: (src: Long, dst: Long), pre-symmetrized by the caller if
    * undirected semantics are wanted. Every node must appear as a src
    * (symmetric edges guarantee it), so there is no dangling mass.
    * Returns (id, r) after `iters` rounds from a uniform start. */
  def pageRank(edges: DataFrame, iters: Int = 3,
      scale: Long = 1000000L): DataFrame = {
    require(scale % 100L == 0L, "scale must keep 0.15·scale integral")
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "src")
    val nodes = e.select(col("src").as("id")).distinct()
    var ranks = nodes.withColumn("r", lit(scale))
    for (_ <- 0 until iters) {
      val contribs = ed.join(ranks, ed("src") === ranks("id"))
        .select(col("dst").as("id"), expr("r div deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("cs"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(15L * scale / 100L) +
            expr("(85 * coalesce(cs, CAST(0 AS BIGINT))) div 100")).as("r"))
    }
    ranks
  }
}
