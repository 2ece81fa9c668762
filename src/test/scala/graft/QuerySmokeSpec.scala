package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes EVERY SparkEntry query end-to-end at sf0.001 — the in-repo
  * tripwire for environment drift. Round 7 lost 18 gate queries and the
  * whole bench to a testdata regeneration that changed `events.ts`'s
  * physical type: nothing in `sbt test` executed the affected fixtures
  * against the REAL testdata, so the breakage surfaced only in the
  * driver's correctness report. This spec makes that class of failure a
  * visible red test the same hour the data changes.
  *
  * Also pins the SparkEntry contract itself: every declared query has an
  * oracle (the driver records a weaker rows-only check for any query
  * missing one — which must be a deliberate choice, not a typo'd key).
  */
class QuerySmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  private def dataPresent = new java.io.File(s"$sfDir/events.parquet").exists()

  test("every query has a matching oracle key") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q diff o).isEmpty, s"queries without oracle: ${(q diff o).toSeq.sorted}")
    assert((o diff q).isEmpty, s"oracles without query: ${(o diff q).toSeq.sorted}")
  }

  test("entry() answers with rows on sf0.001 (driver smoke contract)") {
    assume(dataPresent)
    assert(SparkEntry.entry(spark).count() > 0L)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"smoke: $name") {
      assume(dataPresent)
      val df = fn(spark, sfDir)
      // The driver's pandas oracle hashes every output column; ARRAY /
      // MAP / STRUCT top-level columns crash it ("unhashable type:
      // numpy.ndarray") BEFORE any comparison — round 8 lost two gates
      // to exactly this. Gates must posexplode / checksum such columns.
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      val complex = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => f.name
      }
      assert(complex.isEmpty,
        s"gate '$name' has oracle-unhashable top-level columns: ${complex.mkString(", ")}")
      assert(df.count() >= 0L) // full execution, not just analysis
    }
  }
}
