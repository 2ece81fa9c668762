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
    // Deliberately LAZY loop frames (round-18 A/B): persisting ed/nodes
    // (with localCheckpoint lineage cuts, both at session-width and at
    // size-derived partitioning) measured 3.8-4.0 s vs 2.3 s for the lazy
    // plan at gate scale — the cached frames pin the loop joins at the
    // cache's partition layout (AQE cannot re-coalesce a cached plan) and
    // the extra materialization jobs outweigh re-deriving the (fanned-out,
    // parallel) edge subtree iters times for a bounded iteration count.
    // An unbounded-iteration CC-style loop wants the opposite trade —
    // see duplicateClusters, which persists + checkpoints per round.
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

  /** Exact triangle count over an undirected simple graph, by
    * degree-ordered edge orientation (the standard bounded-fan-out
    * construction): every edge points from its lower-(degree, id)
    * endpoint to the higher one, wedges are ordered out-neighbor pairs,
    * and a wedge closes iff the oriented (b, c) edge exists — each
    * triangle is counted exactly once, at its lowest-(degree, id) corner.
    *
    * `edges`: (src, dst) with src < dst, deduplicated (one row per
    * undirected edge). Returns one row (n_nodes, n_edges, n_triangles).
    *
    * Scale shape: after (degree, id) orientation the maximum out-degree
    * of ANY graph is O(√E), so the wedge join's fan-out is bounded at
    * E^{3/2} worst case and Σ outdeg² in practice — the reason this runs
    * on power-law graphs where a naive 3-way self-join explodes at the
    * hub nodes. Three shuffles total: degree count, wedge self-join on
    * the low corner, closing-edge join on (b, c). */
  def triangleStats(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src").as("u"), col("dst").as("v"))
    val deg = und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // oriented edge (a → b) with b's sort key carried for wedge ordering
    val oriented = withDeg.select(
      when(lowFirst, col("u")).otherwise(col("v")).as("a"),
      when(lowFirst, col("v")).otherwise(col("u")).as("b"),
      when(lowFirst, col("dv")).otherwise(col("du")).as("db"))
    val o1 = oriented.select(col("a"), col("b"), col("db"))
    val o2 = oriented.select(col("a"), col("b").as("c"), col("db").as("dc"))
    val wedges = o1.join(o2, "a")
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
      .select("b", "c")
    val closing = oriented.select(col("a").as("b"), col("b").as("c"))
    val tri = wedges.join(closing, Seq("b", "c"))
      .agg(count(lit(1)).as("n_triangles"))
    val counts = und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
    counts.crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }
}
