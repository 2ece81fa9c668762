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
}
