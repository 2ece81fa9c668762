package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** FanOut deficiency predicate: fires on SCAN-SPLIT deficiency, never on
  * mere file count (round-18 advice — a table of few LARGE files is many
  * byte-range splits and must not be shuffled wholesale at scale). */
class FanOutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fanned(df: DataFrame): Boolean =
    graft.operators.FanOut.byKey(df, col("id"))
      .queryExecution.logical.collectFirst {
        case r: RepartitionOperation => r
      }.nonEmpty

  private def writeOneFile(rows: Int, payload: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fanout").toString
    // per-row seeded random text: incompressible, so the parquet file's
    // on-disk size tracks rows × payload (a constant string would RLE
    // down to nothing and defeat the size-based split probe)
    (0 until rows).map { i =>
      (i.toLong, new scala.util.Random(i).alphanumeric.take(payload).mkString)
    }.toDF("id", "text").coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("fires on a single TINY file (one split, structurally deficient)") {
    val dir = writeOneFile(rows = 100, payload = 8)
    assert(fanned(spark.read.parquet(dir)),
      "a one-split scan on a multi-core session must fan out")
  }

  test("does NOT fire on a single LARGE file worth many byte-range splits") {
    // a ~100+ KB file with maxPartitionBytes forced to 16 KB is many
    // splits — the round-18 bug keyed on file count and would have fired
    val dir = writeOneFile(rows = 2000, payload = 256)
    val size = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    assert(size > 64 * 1024, s"fixture file too small ($size B) for the probe")
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes", "4MB")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16k")
    spark.conf.set("spark.sql.files.openCostInBytes", "1k")
    try assert(!fanned(spark.read.parquet(dir)),
      "a many-split single file is already wide — fan-out must not fire")
    finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
  }

  test("idempotent: an already-repartitioned frame is left alone") {
    val dir = writeOneFile(rows = 100, payload = 8)
    val once = graft.operators.FanOut.byKey(spark.read.parquet(dir), col("id"))
    val twice = graft.operators.FanOut.byKey(once, col("id"))
    val exchanges = twice.queryExecution.logical.collect {
      case r: RepartitionOperation => r
    }
    assert(exchanges.length == 1, "a second byKey must be the identity")
  }

  test("non-file-backed frames are left alone") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"t$i")).toDF("id", "text")
    assert(!fanned(df), "in-memory frames' parallelism tracks the cluster")
  }
}
