package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter-pruned shuffle join — the planned-ahead cousin of Spark's
  * AQE runtime row-level filtering (`spark.sql.optimizer.runtime.bloomFilter`):
  * when the build side is too large to BROADCAST as a hash relation but its
  * key set still fits a few megabytes of Bloom bits, shipping the bits to the
  * probe side prunes non-matching fact rows BEFORE the shuffle, so the
  * exchange moves only rows that can possibly join.
  *
  * Correctness does not depend on the filter: Bloom filters have no false
  * negatives, so pruning drops only rows the join would drop anyway, and the
  * false positives that survive pruning are eliminated by the exact join —
  * the result is row-identical to the plain join (the oracle gate pins this).
  *
  * 100 TB sizing: bits ≈ 1.44·n·log2(1/fpp); 10M dim keys at 1% fpp ≈ 12 MB
  * — broadcastable where the dim's 10M wide rows are not. When even the bits
  * outgrow the driver (billions of keys), fall back to a storage-partitioned
  * or shuffle join and let AQE's adaptive variant decide per-query.
  */
object BloomJoin {

  /** Serializable carrier: the filter crosses the closure as its canonical
    * byte form and re-hydrates once per executor (BloomFilter's own
    * writeTo/readFrom — no reliance on Java serialization of the impl). */
  private final class Bits(val bytes: Array[Byte]) extends Serializable {
    @transient lazy val filter: BloomFilter =
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Inner-join `fact` to `dim` on a long key, Bloom-pruning the fact side
    * first. `expectedItems` sizes the filter (overestimating only wastes
    * bits; underestimating only raises the false-positive rate — never
    * correctness). */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bits = fact.sparkSession.sparkContext.broadcast(new Bits(bos.toByteArray))
    val mightContain = udf { (k: java.lang.Long) =>
      k != null && bits.value.filter.mightContainLong(k.longValue)
    }
    fact.filter(mightContain(col(factKey).cast("long")))
      .join(dim, fact(factKey) === dim(dimKey))
  }
}
