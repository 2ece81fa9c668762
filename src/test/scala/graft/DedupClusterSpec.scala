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

  test("duplicateClusters: non-converging guard trips at maxIter") {
    import spark.implicits._
    val pairs = (0L until 8L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Dedup.duplicateClusters(pairs, maxIter = 2)
    }
  }
}
