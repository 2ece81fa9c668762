package graft

import graft.pipeline.Curation
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random property checks for the curation operators — invariants
  * that must hold for ANY corpus, not just the pinned vectors:
  * packing partitions the corpus exactly, in id order, with exact
  * prefix-sum boundaries regardless of id sparsity or bucket count. */
class CurationPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val rnd = new scala.util.Random(20260812)

  private def randomDocs(n: Int): Seq[(Long, String, String)] = {
    // sparse, shuffled ids; docs of 0..40 tokens (some below gram/packing
    // thresholds, some empty)
    val ids = rnd.shuffle((0 until n).map(_ => rnd.nextLong(1L << 40)).distinct.toList)
    ids.map { id =>
      val toks = rnd.nextInt(41)
      (id, (1 to toks).map(t => s"w${rnd.nextInt(50)}").mkString(" "), "en")
    }
  }

  test("packSequences: random sparse corpora — exact partition of docs and " +
      "tokens, windows contiguous from 0, boundaries match the serial scan") {
    import spark.implicits._
    for (trial <- 1 to 5) {
      val rows = randomDocs(40 + rnd.nextInt(160))
      val seqLen = 8L + rnd.nextInt(64)
      val nBuckets = 1 + rnd.nextInt(9)
      val got = Curation.packSequences(
          rows.toDF("doc_id", "text", "lang"), seqLen, nBuckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))

      // serial reference: sort by id, running sum, window = before/seqLen
      val serial = rows.sortBy(_._1).map { case (id, text, _) =>
        (id, text.split("\\s+").count(_.nonEmpty).toLong)
      }
      var before = 0L
      val expected = serial.map { case (id, t) =>
        val w = before / seqLen; before += t; (w, id, t)
      }.groupBy(_._1).toSeq.sortBy(_._1).map { case (w, g) =>
        (w, g.size.toLong, g.map(_._3).sum, g.map(_._2).min, g.map(_._2).max)
      }
      assert(got.toSeq == expected, s"trial $trial seqLen=$seqLen nBuckets=$nBuckets")
    }
  }

  test("stratifiedSample: subset of input, deterministic across plans") {
    import spark.implicits._
    val rows = randomDocs(150)
    val df = rows.toDF("doc_id", "text", "lang")
    val a = Curation.stratifiedSample(df).collect().map(_.getLong(0)).toSeq
    val b = Curation.stratifiedSample(df.repartition(7)).collect()
      .map(_.getLong(0)).toSeq
    assert(a == b, "sample must not depend on physical partitioning")
    assert(a.toSet.subsetOf(rows.map(_._1).toSet))
  }
}
