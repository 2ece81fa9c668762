package graft.testtools

import graft.core.{DType, Slab, Slice}
import org.apache.spark.sql.SparkSession

/** Worker-process main for the cross-JVM writer-token test — the analog
  * of the reference's slave entrypoint (script.clj:54-83): bootstraps
  * ENTIRELY from argv (store root, dataset, token file, half), builds
  * its own SparkSession, rebuilds the in-flight writer from the token,
  * writes its disjoint chunk-aligned half, prints the done marker, and
  * exits. Nothing is shared with the master but the filesystem. */
object TokenWorkerMain {
  val DoneMarker = "GRAFT_WORKER_DONE"

  def main(args: Array[String]): Unit = {
    val Array(root, ds, tokenFile, half) = args
    val token = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(tokenFile)),
      java.nio.charset.StandardCharsets.UTF_8)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-token-worker-$half")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val store = new graft.spark.SparkStore(spark, root)
      val w = store.writerFromToken(ds, token)
      // NON-aligned halves (y chunks are 3 wide; the split at y=5 is
      // mid-chunk): both processes write the y∈[3,6) chunk column with
      // disjoint cells, so convergence requires the shared-writer
      // content-hash verify + re-merge to work ACROSS process
      // boundaries (separate JVMs, separate wall clocks) — the
      // mis-ordered lots-of-processes contract, concurrency.clj:162-243
      val slab =
        if (half == "0")
          Slab.empty(DType.DOUBLE, Slice(Seq(0L, 0L), Seq(9L, 5L)), 3.0)
        else
          Slab.empty(DType.DOUBLE, Slice(Seq(0L, 5L), Seq(9L, 10L)), 4.0)
      w.write("v", Seq(slab))
      println(DoneMarker)
    } finally spark.stop()
    System.exit(0) // Spark leaves non-daemon threads; exit explicitly
  }
}
