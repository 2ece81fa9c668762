package graft.spark.source

import graft.SparkTestSession
import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import graft.spark.SparkStore
import org.scalatest.funsuite.AnyFunSuite

/** The SQL front door: `GraftCatalog` plugs a graft store into Spark's
  * catalog so datasets/variables are namespaces/tables — DDL, INSERT,
  * SELECT with pushdown, and VERSION AS OF time travel, all through the
  * existing DSv2 table. */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Register a catalog over a fresh store root. Catalog instances are
    * cached per session once referenced, so each test uses its own name. */
  private def mkCatalog(cat: String): String = {
    val root = java.nio.file.Files.createTempDirectory("graft-cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    root
  }

  test("DDL + INSERT + SELECT round trip, pushdown intact") {
    val root = mkCatalog("cat")
    spark.sql("CREATE NAMESPACE cat.climate")
    spark.sql("""CREATE TABLE cat.climate.temp (x BIGINT, y BIGINT, value DOUBLE)
      TBLPROPERTIES ('dims' = 'x:8:4,y:6:3', 'fill' = '-9')""")
    // catalog listings
    assert(spark.sql("SHOW NAMESPACES IN cat").collect().map(_.getString(0))
      .contains("climate"))
    assert(spark.sql("SHOW TABLES IN cat.climate").collect()
      .map(_.getString(1)).contains("temp"))
    // INSERT commits a version through the V1Write bridge
    spark.sql("""INSERT INTO cat.climate.temp
      SELECT x, y, CAST(x * 10 + y AS DOUBLE)
      FROM (SELECT explode(sequence(0L, 7L)) x) CROSS JOIN
           (SELECT explode(sequence(0L, 5L)) y)""")
    val store = new SparkStore(spark, root)
    assert(store.versions("climate").size == 2) // empty DDL v1 + insert v2
    // SELECT through the catalog, with dim pushdown
    val df = spark.sql("SELECT x, y, value FROM cat.climate.temp WHERE x >= 6")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftScan"), plan.take(800))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size == 12 && got((7L, 5L)) == 75.0 && got((6L, 0L)) == 60.0)
    // full scan sees fill value only where never written (nothing here)
    assert(spark.sql("SELECT count(*) FROM cat.climate.temp").head.getLong(0) == 48L)
  }

  test("VERSION AS OF and TIMESTAMP AS OF time travel through SQL") {
    val root = mkCatalog("catt")
    val store = new SparkStore(spark, root)
    store.create("ds")
    val meta = DatasetMeta(
      dimensions = Map("x" -> 6L), chunkDimensions = Map("x" -> 3L),
      variables = Map("v" -> VariableDef("double", Vector("x"), -1.0)))
    val w1 = store.addVersion("ds", meta)
    w1.write("v", Seq(Slab.fromDoubles(DType.DOUBLE,
      Slice(Seq(0L), Seq(6L)), (0 until 6).map(_.toDouble))))
    val v1 = w1.finishVersion()
    val w2 = store.addVersion("ds", store.metadata("ds", v1))
    w2.write("v", Seq(Slab.fromDoubles(DType.DOUBLE,
      Slice(Seq(0L), Seq(6L)), (0 until 6).map(i => i * 100.0))))
    w2.finishVersion()
    val latest = spark.sql("SELECT sum(value) FROM catt.ds.v").head.getDouble(0)
    assert(latest == 1500.0)
    val pinned = spark.sql(s"SELECT sum(value) FROM catt.ds.v VERSION AS OF $v1")
      .head.getDouble(0)
    assert(pinned == 15.0)
    // a timestamp far in the future resolves to the latest version
    val byTs = spark.sql(
      "SELECT sum(value) FROM catt.ds.v TIMESTAMP AS OF '2999-01-01'")
      .head.getDouble(0)
    assert(byTs == 1500.0)
    // a timestamp BEFORE the first commit fails loudly, not empty-silently
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM catt.ds.v TIMESTAMP AS OF '1970-01-02'").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("no version"),
      s"unexpected: ${e.getMessage}")
  }

  test("CTAS derives the value type; second variable joins the dataset") {
    val root = mkCatalog("catc")
    spark.sql("CREATE NAMESPACE catc.d2")
    spark.sql("""CREATE TABLE catc.d2.a
      TBLPROPERTIES ('dims' = 'x:10:5', 'fill' = '0') AS
      SELECT x, CAST(x * 2 AS BIGINT) AS value
      FROM (SELECT explode(sequence(0L, 9L)) AS x)""")
    val store = new SparkStore(spark, root)
    assert(store.metadata("d2", store.versions("d2").head._2)
      .variables("a").typeName == "long")
    assert(spark.sql("SELECT sum(value) FROM catc.d2.a").head.getLong(0) == 90L)
    // a second variable on the same grid: new version carries BOTH
    spark.sql("""CREATE TABLE catc.d2.b (x BIGINT, value DOUBLE)
      TBLPROPERTIES ('dims' = 'x:10:5', 'fill' = 'NaN')""")
    val m = store.metadata("d2", store.versions("d2").head._2)
    assert(m.variables.keySet == Set("a", "b"))
    // variable 'a' still reads back after b's DDL version
    assert(spark.sql("SELECT sum(value) FROM catc.d2.a").head.getLong(0) == 90L)
    // conflicting chunking for a shared dim is rejected
    val e = intercept[Exception] {
      spark.sql("""CREATE TABLE catc.d2.c (x BIGINT, value DOUBLE)
        TBLPROPERTIES ('dims' = 'x:10:2')""")
    }
    assert(e.getMessage.contains("chunk-dimension"), e.getMessage)
  }

  test("ALTER TABLE dims: grow exposes fill, shrink clips, time travel keeps the old shape") {
    mkCatalog("cata")
    spark.sql("CREATE NAMESPACE cata.d")
    spark.sql("""CREATE TABLE cata.d.v (x BIGINT, value DOUBLE)
      TBLPROPERTIES ('dims' = 'x:6:3', 'fill' = '-1')""")
    spark.sql("INSERT INTO cata.d.v SELECT explode(sequence(0L, 5L)), CAST(2 AS DOUBLE)")
    // grow x 6 → 9: existing cells shared, new region reads fill
    spark.sql("ALTER TABLE cata.d.v SET TBLPROPERTIES ('dims' = 'x:9')")
    val grown = spark.sql("SELECT count(*) AS n, sum(value) AS s FROM cata.d.v").head
    assert(grown.getLong(0) == 9L && grown.getDouble(1) == 2.0 * 6 - 3.0)
    // shrink x 9 → 4: reads clip to the new extent
    spark.sql("ALTER TABLE cata.d.v SET TBLPROPERTIES ('dims' = 'x:4:3')")
    assert(spark.sql("SELECT count(*) FROM cata.d.v").head.getLong(0) == 4L)
    // frozen chunk extent and unknown dimension are rejected
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE cata.d.v SET TBLPROPERTIES ('dims' = 'x:4:2')") }
    assert(e1.getMessage.contains("frozen"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE cata.d.v SET TBLPROPERTIES ('dims' = 'y:4')") }
    assert(e2.getMessage.contains("unknown dimension"), e2.getMessage)
    // time travel still reads the pre-shrink shape
    val sstore = new SparkStore(spark,
      spark.conf.get("spark.sql.catalog.cata.root"))
    val vids = sstore.versions("d").map(_._2)
    val preShrink = vids(1) // [shrink, grow, insert, ddl] reverse-chron
    assert(spark.sql(
      s"SELECT count(*) FROM cata.d.v VERSION AS OF $preShrink")
      .head.getLong(0) == 9L)
    // non-numeric version id gets a descriptive error, not NumberFormatException
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM cata.d.v VERSION AS OF 'abc'").collect() }
    assert(e3.getMessage.contains("numeric version id"), e3.getMessage)
  }

  test("errors: missing table, duplicate create, drop semantics") {
    mkCatalog("cate")
    spark.sql("CREATE NAMESPACE cate.e1")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM cate.e1.missing")
    }
    spark.sql("""CREATE TABLE cate.e1.v (x BIGINT, value DOUBLE)
      TBLPROPERTIES ('dims' = 'x:4:2')""")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("""CREATE TABLE cate.e1.v (x BIGINT, value DOUBLE)
        TBLPROPERTIES ('dims' = 'x:4:2')""")
    }
    // DROP TABLE appends a version WITHOUT the variable: the table is gone
    // from the latest state, the namespace (dataset) and history remain
    spark.sql("DROP TABLE cate.e1.v")
    assert(spark.sql("SHOW TABLES IN cate.e1").collect().isEmpty)
    assert(spark.sql("SHOW NAMESPACES IN cate").collect()
      .exists(_.getString(0) == "e1"))
    // multi-variable dataset: dropping one leaves the other readable
    spark.sql("CREATE NAMESPACE cate.e2")
    spark.sql("CREATE TABLE cate.e2.a (x BIGINT, value DOUBLE) TBLPROPERTIES ('dims' = 'x:4:2')")
    spark.sql("CREATE TABLE cate.e2.b (x BIGINT, value DOUBLE) TBLPROPERTIES ('dims' = 'x:4:2')")
    spark.sql("INSERT INTO cate.e2.b SELECT explode(sequence(0L, 3L)), CAST(1 AS DOUBLE)")
    spark.sql("DROP TABLE cate.e2.a")
    assert(spark.sql("SHOW TABLES IN cate.e2").collect().map(_.getString(1)).toSeq == Seq("b"))
    assert(spark.sql("SELECT sum(value) FROM cate.e2.b").head.getDouble(0) == 4.0)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM cate.e2.a")
    }
    spark.sql("DROP NAMESPACE cate.e2 CASCADE")
    assert(spark.sql("SHOW NAMESPACES IN cate").collect()
      .forall(_.getString(0) != "e2"))
  }

  test("CALL procedures: compact / expire_history / vacuum through SQL") {
    val root = mkCatalog("catp")
    val store = new SparkStore(spark, root)
    store.create("m")
    val meta = DatasetMeta(
      dimensions = Map("x" -> 8L), chunkDimensions = Map("x" -> 4L),
      variables = Map("v" -> VariableDef("long", Vector("x"), -1.0)))
    val w1 = store.addVersion("m", meta)
    w1.write("v", Seq(Slab.fromDoubles(DType.LONG,
      Slice(Seq(0L), Seq(8L)), (0 until 8).map(_.toDouble))))
    w1.finishVersion()
    Thread.sleep(2)
    val w2 = store.addVersion("m", meta)
    w2.write("v", Seq(Slab.empty(DType.LONG, Slice(Seq(0L), Seq(4L)), 9.0)))
    w2.finishVersion()

    // history BEFORE compaction: two plain versions, newest first
    val h0 = spark.sql("CALL catp.system.history('m')").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(h0.length == 2 && h0.forall(_._3 == 0L) && h0.forall(_._4 == 1L))
    assert(h0(0)._2 >= h0(1)._2) // newest first
    assert(h0.map(_._1).toSet == store.versions("m").map(_._2).toSet)

    val cp = spark.sql("CALL catp.system.compact('m')").head.getLong(0)
    assert(store.versions("m").head._2 == cp)
    // the checkpoint shows up flagged at the head of history
    val h1 = spark.sql("CALL catp.system.history('m')").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(h1.head == ((cp, 1L)) && h1.count(_._2 == 1L) == 1)
    assert(spark.sql("CALL catp.system.expire_history('m')").head.getLong(0) == 2L)
    assert(spark.sql("CALL catp.system.vacuum(0)").head.getLong(0) >= 1L)
    // default grace (15 min) keeps everything fresh
    assert(spark.sql("CALL catp.system.vacuum()").head.getLong(0) == 0L)
    // post-maintenance read intact, through SQL
    val got = spark.sql("SELECT x, value FROM catp.m.v ORDER BY x").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 4L).forall(got(_) == 9L) && got(7L) == 7L)
    // unknown procedure fails loudly
    intercept[Exception](spark.sql("CALL catp.system.nope()"))
  }
}
