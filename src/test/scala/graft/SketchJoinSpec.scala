package graft

import graft.operators.BloomJoin
import graft.pipeline.{LangModel, Sketch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-pruned join / deterministic HLL / bigram-LM scoring semantics. */
class SketchJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bloomPrunedJoin ≡ plain inner join (false positives filtered, " +
      "no false negatives), incl. null fact keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val fact = (0 until 5000)
      .map(i => (if (i % 97 == 0) null else java.lang.Long.valueOf(rnd.nextInt(2000).toLong), i.toLong))
      .toDF("fk", "payload")
    val dim = (0 until 300).map(i => (i * 3L, s"d$i")).toDF("dk", "name")
    val pruned = BloomJoin.bloomPrunedJoin(fact, dim, "fk", "dk",
        expectedItems = 300, fpp = 0.05)
      .select("fk", "payload", "name")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "name")
    assert(pruned.except(plain).isEmpty && plain.except(pruned).isEmpty)
    assert(pruned.count() == plain.count()) // multiplicity too (no dups dropped)
  }

  test("bloom pruning actually drops non-matching fact rows before the join") {
    import spark.implicits._
    val fact = (0 until 10000).map(i => (i.toLong, i)).toDF("fk", "p")
    val dim = Seq((5L, "x"), (500L, "y")).toDF("dk", "n")
    // with only 2 keys at 1% fpp, the pruned fact side must be tiny:
    // count the rows surviving the bloom filter alone
    val bf = dim.stat.bloomFilter("dk", 2, 0.01)
    val survived = (0 until 10000).count(i => bf.mightContainLong(i.toLong))
    assert(survived < 200, s"bloom let $survived of 10000 through")
  }

  test("hllDistinctDocs: estimate within rigorous error bounds of exact, " +
      "and identical when computed from a shuffled corpus (order-free)") {
    import spark.implicits._
    val docs = (0 until 2000).map(i => s"document number ${i % 700}").toDF("text")
    val r1 = Sketch.hllDistinctDocs(docs).collect()(0)
    val est = r1.getAs[Long]("est_hll")
    val exact = r1.getAs[Long]("n_exact")
    assert(exact == 700L)
    // m=256 → σ ≈ 1.04/16 = 6.5%; allow 4σ
    assert(math.abs(est - exact).toDouble / exact < 0.26, s"est=$est exact=$exact")
    val shuffled = docs.orderBy(rand(123))
    val r2 = Sketch.hllDistinctDocs(shuffled).collect()(0)
    assert(r2.getAs[Long]("est_hll") == est)
    assert(r2.getAs[Long]("s_scaled") == r1.getAs[Long]("s_scaled"))
  }

  test("hll register maxima merge associatively across splits " +
      "(the cross-day/source union story)") {
    import spark.implicits._
    val a = (0 until 500).map(i => s"a$i").toDF("text")
    val b = (0 until 500).map(i => s"b$i").toDF("text")
    val whole = Sketch.hllDistinctDocs(a.union(b)).collect()(0)
    // merging = unioning inputs; sketch of union must equal union of
    // sketches because max is associative — recompute from concatenation
    val again = Sketch.hllDistinctDocs(b.union(a)).collect()(0)
    assert(whole.getAs[Long]("s_scaled") == again.getAs[Long]("s_scaled"))
    assert(whole.getAs[Long]("est_hll") == again.getAs[Long]("est_hll"))
  }

  test("bigramScore ranks a repeated-template doc as more predictable " +
      "than a unique-text doc") {
    import spark.implicits._
    val boiler = "click here to subscribe to our newsletter today"
    val rows =
      (0L until 50L).map(i => (i, "en", boiler)) ++ // 50 identical docs
      Seq((50L, "en", "quixotic zephyrs baffled the vexed jackdaw quorum"))
    val docs = rows.toDF("doc_id", "lang", "text")
    val scored = LangModel.bigramScore(docs, scoreDocIdBelow = 51L, limit = 51)
      .collect()
    val byId = scored.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("ppl_proxy")).toMap
    assert(byId(0L) < byId(50L),
      s"boilerplate ${byId(0L)} should score below unique ${byId(50L)}")
  }
}
