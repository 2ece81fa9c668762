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

  test("heavyHitters ≡ exact top-k under Misra–Gries eviction pressure " +
      "(5k distinct terms, capacity 64, Zipf-ish skew)") {
    import graft.pipeline.TextOps
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // ~40 genuinely hot terms + a long tail of 5000 rare ones
    def doc(): String = {
      val hot = (0 until 30).map(_ => s"hot${rnd.nextInt(40)}")
      val tail = (0 until 10).map(_ => s"rare${rnd.nextInt(5000)}")
      rnd.shuffle(hot ++ tail).mkString(" ")
    }
    val docs = (0 until 2000).map(_ => doc()).toDF("text").repartition(8)
    val fast = TextOps.heavyHitters(docs, k = 20, mgCapacity = 64).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = docs
      .select(explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(20).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(fast == exact)
  }

  test("JL projection preserves neighborhood structure: planted near-dup " +
      "pairs stay far closer in the sketch than random pairs") {
    import graft.pipeline.Projection
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float]): Array[Float] =
      v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    val bases = (0 until 50).map(_ => vec())
    // ids 0..49 originals, 100..149 their near-dups
    val rows = bases.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
      bases.zipWithIndex.map { case (v, i) => (100L + i, perturb(v).toSeq) }
    val emb = rows.toDF("vec_id", "embedding")
    val proj = Projection.projectQ8(emb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def dist(a: Array[Long], b: Array[Long]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => val d = (x - y).toDouble; d * d }.sum)
    val nearAvg = (0 until 50).map(i => dist(proj(i.toLong), proj(100L + i))).sum / 50
    val farAvg = (0 until 50).map(i => dist(proj(i.toLong), proj(100L + ((i + 7) % 50)))).sum / 50
    assert(nearAvg * 2 < farAvg, s"near=$nearAvg far=$farAvg")
  }

  test("projectQ8 on embeddings LONGER than inDim: no null poisoning " +
      "(zip_with pads the shorter side), equals projecting the 64-prefix") {
    import graft.pipeline.Projection
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val long80 = (0 until 5).map(i =>
      (i.toLong, Seq.fill(80)(rnd.nextGaussian().toFloat)))
    val emb80 = long80.toDF("vec_id", "embedding")
    val emb64 = long80.map { case (id, v) => (id, v.take(64)) }
      .toDF("vec_id", "embedding")
    val got = Projection.projectQ8(emb80).collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val want = Projection.projectQ8(emb64).collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    for ((id, p) <- got) {
      assert(p.forall(_ != null), s"vec $id: null in projection $p")
      assert(p == want(id), s"vec $id: 80-dim input must project its 64-prefix")
    }
  }

  test("gramQ8: hand-computed Gram + sums on known vectors, " +
      "partition-order invariant") {
    import graft.pipeline.Projection
    import spark.implicits._
    // max|x| = 127 in every vector → quantization is the identity
    val rows = Seq(
      (0L, Seq(127f, 0f, 64f)),
      (1L, Seq(0f, 127f, -64f)),
      (2L, Seq(127f, 127f, 0f)))
    val emb = rows.toDF("vec_id", "embedding")
    val got = Projection.gramQ8(emb, dim = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // g(0,0)=127²+0+127², g(0,1)=0+0+127·127, g(0,2)=127·64+0+0,
    // g(1,1)=0+127²+127², g(1,2)=0−127·64+0, g(2,2)=64²+64²+0
    assert(got((0L, 0L)) == ((2L * 127 * 127, 254L, 254L, 3L)))
    assert(got((0L, 1L)) == ((127L * 127, 254L, 254L, 3L)))
    assert(got((0L, 2L)) == ((127L * 64, 254L, 0L, 3L)))
    assert(got((1L, 1L)) == ((2L * 127 * 127, 254L, 254L, 3L)))
    assert(got((1L, 2L)) == ((-127L * 64, 254L, 0L, 3L)))
    assert(got((2L, 2L)) == ((2L * 64 * 64, 0L, 0L, 3L)))
    val re = Projection.gramQ8(emb.repartition(5), dim = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(re == got)
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
