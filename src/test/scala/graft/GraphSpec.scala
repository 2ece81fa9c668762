package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer-exact PageRank semantics. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("hub of a symmetric star outranks every leaf") {
    import spark.implicits._
    val fwd = (1L to 20L).map(i => (0L, i))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(0L) > ranks(1L) * 5, s"hub ${ranks(0L)} vs leaf ${ranks(1L)}")
    assert((1L to 20L).map(ranks).distinct.size == 1) // leaves symmetric
  }

  test("ranks are bit-identical under row order and partitioning changes") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val fwd = (0 until 400).map(_ => (rnd.nextInt(30).toLong, 100L + rnd.nextInt(40))).distinct
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val a = Graph.pageRank(edges, iters = 3)
      .orderBy("id").collect().toSeq
    val b = Graph.pageRank(edges.orderBy(rand(99)).repartition(7), iters = 3)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("total rank mass stays within floor-loss bounds of V·scale") {
    import spark.implicits._
    val fwd = (0 until 200).map(i => (i.toLong % 17, 100L + i % 23)).distinct
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val v = edges.select(col("src")).distinct().count()
    val total = Graph.pageRank(edges, iters = 4)
      .agg(sum("r")).collect()(0).getLong(0)
    // every node's update loses < deg floor remainders + the /100 remainder;
    // with E edges per round total loss per round < E + V
    val e = edges.count()
    assert(total <= v * 1000000L)
    assert(total >= v * 1000000L - 4 * (e + v) * 100L,
      s"total=$total v=$v — mass leaked beyond floor losses")
  }

  test("triangleStats: K4 + pendant = 4 triangles; matches a brute-force " +
      "count on a hub graph with skewed degrees") {
    import spark.implicits._
    // K4 on {1,2,3,4} has C(4,3)=4 triangles; pendant 4-5 adds none
    val k4 = (for (a <- 1 to 4; b <- 1 to 4 if a < b) yield
      (a.toLong, b.toLong)) :+ ((4L, 5L))
    val r1 = graft.operators.Graph
      .triangleStats(k4.toDF("src", "dst")).collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) == ((5L, 7L, 4L)))

    // hub graph: node 0 connected to 1..20, plus ring edges i—(i+1) for
    // i in 1..19 → each ring edge closes exactly one triangle through 0
    val hub = (1 to 20).map(i => (0L, i.toLong)) ++
      (1 to 19).map(i => (i.toLong, (i + 1).toLong))
    val edges = hub.toDF("src", "dst")
    val got = graft.operators.Graph.triangleStats(edges).collect().head
    // brute force for reference
    val es = hub.toSet
    def has(a: Long, b: Long) = es.contains((math.min(a, b), math.max(a, b)))
    val ids = (0L to 20L)
    val brute = (for (a <- ids; b <- ids if a < b; c <- ids if b < c
      if has(a, b) && has(a, c) && has(b, c)) yield 1).size
    assert(got.getLong(2) == brute && brute == 19)
    assert((got.getLong(0), got.getLong(1)) == ((21L, 39L)))
  }
}
