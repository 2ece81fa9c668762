package graft

import graft.pipeline.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** ANN variants: exact baseline vs LSH and IVF recall. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("IVF and LSH approximate the brute-force baseline with reasonable recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, 5, 10))
    val ivf = pairs(Similarity.ivfTopK(emb, 5, 10))
    val lsh = pairs(Similarity.lshTopK(emb, 5, 10))
    assert(exact.size == 50)
    val ivfRecall = (exact intersect ivf).size.toDouble / exact.size
    assert(ivfRecall >= 0.9, s"IVF recall too low at nProbe=4/16: $ivfRecall")
    // probing every list must recover the exact answer (IVF partitions the
    // corpus; the union of all lists is the corpus)
    val ivfAll = pairs(Similarity.ivfTopK(emb, 5, 10, nProbe = 16))
    val allRecall = (exact intersect ivfAll).size.toDouble / exact.size
    assert(allRecall >= 0.9, s"IVF recall too low at nProbe=16/16: $allRecall")
    assert(ivf.nonEmpty && lsh.nonEmpty)
    // determinism (k-means update is quantized-integer, order-free exact)
    assert(pairs(Similarity.ivfTopK(emb, 5, 10)) == ivf)
  }
}
