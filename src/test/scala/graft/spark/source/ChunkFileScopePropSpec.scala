package graft.spark.source

import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random property checks for the driver-side file scoping:
  *  - filesFor / filesByHash agree (one is the batched form of the other);
  *  - no file that could hold a wanted hash is ever dropped (soundness);
  *  - bucketSpan partitions the 32-bit prefix space exactly (every hash
  *    belongs to exactly one bucket's span — the manifest's own bucket). */
class ChunkFileScopePropSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(20260813)

  private def hash40(): String =
    (1 to 40).map(_ => "0123456789abcdef"(rnd.nextInt(16))).mkString

  private def ranges(n: Int): Array[(String, String, String)] =
    (1 to n).map { i =>
      val a = hash40(); val b = hash40()
      if (a <= b) (s"f$i", a, b) else (s"f$i", b, a)
    }.toArray

  test("filesByHash agrees with per-hash filesFor, and scoping is sound") {
    for (_ <- 1 to 50) {
      val ranged = ranges(1 + rnd.nextInt(30))
      // mix of random hashes and hashes guaranteed inside some range
      val hashes = (1 to 10).map(_ => hash40()) ++
        (1 to 5).map(_ => ranged(rnd.nextInt(ranged.length))._2)
      val byHash = ChunkFileScope.filesByHash(ranged, hashes.iterator)
      hashes.distinct.foreach { h =>
        val single = ChunkFileScope.filesFor(ranged, Iterator.single(h)).toSet
        assert(byHash.getOrElse(h, Array.empty).toSet == single, s"hash $h")
        // soundness: every file whose range can hold h is kept
        val want = ranged.collect { case (f, mn, mx) if mn <= h && h <= mx => f }
        assert(want.toSet == single, s"candidate files for $h")
      }
      // the whole-set scope is the union of the per-hash scopes
      val all = ChunkFileScope.filesFor(ranged, hashes.iterator).toSet
      assert(all == hashes.distinct
        .flatMap(h => byHash.getOrElse(h, Array.empty)).toSet)
      // null hashes (fill chunks) want no files
      assert(ChunkFileScope.filesFor(ranged, Iterator.single(null)).isEmpty)
    }
  }

  test("bucketSpan partitions the prefix space: every hash in exactly one " +
      "span, and it is the manifest's own bucket") {
    for (_ <- 1 to 30) {
      val nBuckets = 1 + rnd.nextInt(64)
      val spans = (0L until nBuckets).map(b =>
        ChunkFileScope.bucketSpan(b, nBuckets))
      // random hashes + prefix-boundary hashes (all-0s / all-fs tails)
      val hashes = (1 to 10).map(_ => hash40()) ++
        spans.take(3).flatMap { case (lo, hi) => Seq(lo + "0" * 32, hi) }
      hashes.foreach { h =>
        val holders = spans.zipWithIndex.collect {
          case ((lo, hi), b) if h >= lo && h <= hi => b
        }
        val h32 = java.lang.Long.parseLong(h.take(8), 16)
        val want = (h32 * nBuckets) / 4294967296L
        assert(holders == Seq(want.toInt),
          s"hash $h (nBuckets=$nBuckets) in spans $holders, manifest says $want")
      }
    }
  }
}
