package graft

import graft.pipeline.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Connected components over candidate dup pairs (min-label propagation):
  * multi-hop chains converge, components get the min doc_id as label,
  * determinism across runs. */
class DedupClusterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("duplicateClusters: chains, triangles, and isolated pairs resolve " +
      "to min-id components; multi-hop propagation converges") {
    import spark.implicits._
    // components: {1,2,3} (path), {10,11} (edge), {20,21,22,23} (path of
    // diameter 3 — needs >1 propagation round), {30,31,32} (triangle)
    val pairs = Seq(
      (1L, 2L), (2L, 3L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L),
      (30L, 31L), (31L, 32L), (30L, 32L)
    ).toDF("a", "b")
    val got = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L)
    assert(got == expected)
    // deterministic across runs
    val again = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == expected)
  }

  test("duplicateClusters: long path still converges (diameter ~ 16)") {
    import spark.implicits._
    val pairs = (0L until 16L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 16L).map(_ -> 0L).toMap)
  }

  test("pointer jumping: a 512-edge chain converges in O(log diameter) " +
      "rounds, not O(diameter)") {
    import spark.implicits._
    // plain min-label propagation would need ~513 rounds (beyond the
    // default maxIter=50 guard); path halving must land in ~log2(512)+c
    val pairs = (0L until 512L).map(i => (i, i + 1)).toDF("a", "b")
    val (out, rounds) = Dedup.duplicateClustersWithRounds(pairs)
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 512L).map(_ -> 0L).toMap)
    assert(rounds <= 20, s"512-chain took $rounds rounds")
  }

  test("skew probe: one giant component holding 30% of vertices stays " +
      "cheap — bounded rounds, no ballooning partition") {
    import spark.implicits._
    // 3000 vertices; vertices [0,900) form ONE near-dup cluster shaped the
    // way bucket-capped LSH emits it (pairs within capped buckets → many
    // small stars sharing members, here: chained hubs every 30 vertices),
    // NOT a quadratic clique. Remaining vertices: isolated pairs.
    val giant = (1 until 900).map(i => ((i / 30) * 30L, i.toLong))
      .filter { case (a, b) => a != b } ++
      (30 until 900 by 30).map(h => (h.toLong - 30L, h.toLong))
    val rest = (1000L until 3000L by 2L).map(i => (i, i + 1))
    val pairs = (giant ++ rest).toDF("a", "b")
    val (out, rounds) = Dedup.duplicateClustersWithRounds(pairs)
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1))
    // correctness: the whole giant component labels to min id 0
    assert(got.filter(_._1 < 900L).forall(_._2 == 0L))
    assert(got.count(_._1 < 900L) == 900)
    assert(got.filter(_._1 >= 1000L).forall { case (id, l) => l == (id / 2) * 2 })
    // convergence: ~30 hub-to-hub hops of diameter, but path halving
    // walks it in O(log) — the bound that matters is rounds ≪ |V|, and
    // in absolute terms a small count, NOT thousands
    assert(rounds <= 15, s"giant component took $rounds propagation rounds")
    // skew: no partition of the per-round label frame balloons — labels
    // are keyed by vertex id, so the giant cluster spreads uniformly;
    // the heaviest partition must stay within a small factor of the mean
    val labelParts = out.rdd.mapPartitions(it => Iterator(it.size)).collect()
    val mean = labelParts.sum.toDouble / labelParts.count(_ > 0).max(1)
    assert(labelParts.max <= math.max(64.0, 4.0 * mean),
      s"label partition skew: max=${labelParts.max} mean=$mean")
  }

  test("duplicateClusters: non-converging guard trips at maxIter") {
    import spark.implicits._
    val pairs = (0L until 8L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Dedup.duplicateClusters(pairs, maxIter = 2)
    }
  }
}
