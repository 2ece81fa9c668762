package graft.spark.source

import graft.core.DType
import graft.meta.{DatasetMeta, VariableDef}
import graft.spark.SparkStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** Spark `TableCatalog` over a graft store — the SQL front door
  * (reference surface analog: the schema/connect porcelain,
  * src/io/mandoline/impl/protocol.clj:105-123, re-expressed as Spark's
  * native catalog plugin instead of a bespoke connect API).
  *
  * {{{
  * spark.sql.catalog.graft      = graft.spark.source.GraftCatalog
  * spark.sql.catalog.graft.root = /data/graft-root
  *
  * CREATE NAMESPACE graft.climate;                 -- dataset
  * CREATE TABLE graft.climate.temp (x BIGINT, y BIGINT, value DOUBLE)
  *   TBLPROPERTIES ('dims' = 'x:100:10,y:50:25', 'fill' = '-9999');
  * INSERT INTO graft.climate.temp SELECT ...;      -- commits a version
  * SELECT * FROM graft.climate.temp WHERE x < 10;  -- pushdown-pruned scan
  * SELECT * FROM graft.climate.temp VERSION AS OF 1786...;
  * }}}
  *
  * Mapping: namespace (one level) = dataset, table = variable. Every
  * version of a dataset carries ALL its variables, so CREATE TABLE in a
  * committed dataset appends a version whose metadata adds the new
  * variable (dimension/chunk compatibility attested), and DROP TABLE is
  * only directly supported for a dataset's sole variable — dropping one
  * variable of many would require rewriting history (drop the namespace
  * to destroy the dataset).
  *
  * All reads/writes route through the existing DSv2 `GraftTable`, so SQL
  * gets the same pushdown, pruning, columnar decode, and V1Write ingest
  * as the options API. */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var store: SparkStore = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' needs spark.sql.catalog.$name.root"))
    store = new SparkStore(SparkSession.active, root)
  }

  override def name(): String = catalogName

  private def dsOf(ident: Identifier): String = {
    if (ident.namespace.length != 1) throw new NoSuchTableException(ident)
    ident.namespace()(0)
  }

  /** Latest committed metadata, or None for an uncommitted/absent dataset. */
  private def latestMeta(ds: String): Option[DatasetMeta] =
    if (!store.datasetExists(ds)) None
    else store.versions(ds).headOption.map { case (_, vid) => store.metadata(ds, vid) }

  private def tableOptions(ident: Identifier, extra: (String, String)*): Map[String, String] =
    (Map("root" -> store.root, "dataset" -> dsOf(ident),
      "variable" -> ident.name) ++ extra)

  // ---- procedures (CALL graft.system.<name>(...)) ----

  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    val inSystem = ident.namespace.isEmpty ||
      (ident.namespace.length == 1 && ident.namespace()(0) == "system")
    if (!inSystem || !MaintenanceProcedure.Names.contains(ident.name))
      throw new RuntimeException(
        s"graft: unknown procedure $ident — available: " +
          MaintenanceProcedure.Names.map(n => s"$catalogName.system.$n")
            .mkString(", "))
    new MaintenanceProcedure(store, ident.name)
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      MaintenanceProcedure.Names
        .map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.length != 1 || !store.datasetExists(namespace(0)))
      throw new NoSuchNamespaceException(namespace)
    latestMeta(namespace(0)).map(_.variables.keys.toArray.sorted
      .map(v => Identifier.of(namespace, v))).getOrElse(Array.empty)
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 &&
      latestMeta(ident.namespace()(0)).exists(_.variables.contains(ident.name))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftTable(tableOptions(ident))
  }

  /** `VERSION AS OF <id>` time travel. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    if (!version.matches("\\d+"))
      throw new IllegalArgumentException(
        s"graft: VERSION AS OF on ${ident.toString} must be a numeric " +
          s"version id, got '$version'")
    new GraftTable(tableOptions(ident, "version" -> version))
  }

  /** `TIMESTAMP AS OF <ts>` time travel (Spark hands MICROSECONDS). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val ms = Math.floorDiv(timestamp, 1000L)
    val vs = store.versions(dsOf(ident)).filter(_._1 <= ms)
    require(vs.nonEmpty, s"no version of ${dsOf(ident)} at or before $ms")
    new GraftTable(tableOptions(ident, "version" -> vs.head._2.toString))
  }

  /** Spark's dtype for a value column ↔ graft type names. */
  private def typeNameOf(dt: DataType): String = dt match {
    case ByteType => "byte"
    case ShortType => "short"
    case IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case other => throw new IllegalArgumentException(
      s"graft: unsupported value type $other")
  }

  /** CREATE TABLE (incl. CTAS): the variable definition comes from the
    * table properties — `dims` = "name:extent:chunkExtent,…" (+ optional
    * `fill`, default NaN; `type` falls back to the schema's value column)
    * or a full `metadata` dataset JSON. A non-empty schema must be exactly
    * (dims…, value) with BIGINT dims, in shape order. In a dataset with
    * committed versions, a new version is appended whose metadata adds
    * this variable (frozen attributes attested). */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      "graft tables are chunk-partitioned via the 'dims' property, not PARTITIONED BY")
    val ds = dsOf(ident)
    val props = properties.asScala.toMap.map {
      case (k, v) => (k.toLowerCase(java.util.Locale.ROOT), v)
    }
    // derive the value type from the schema when no explicit property
    val propsWithType = props.get("type") match {
      case Some(_) => props
      case None => schema.fields.find(_.name == "value")
        .map(f => props + ("type" -> typeNameOf(f.dataType))).getOrElse(props)
    }
    val proposed = GraftSource.metaFromOptions(propsWithType, ident.name)
    DatasetMeta.validate(proposed)
    require(proposed.variables.contains(ident.name),
      s"graft: the supplied metadata defines no variable '${ident.name}'")
    // a declared schema must agree with the definition
    if (schema.fields.nonEmpty) {
      val v = proposed.variables(ident.name)
      val want = v.shape.map(d => StructField(d, LongType, nullable = false)) :+
        StructField("value", DType(v.typeName).sparkType, nullable = false)
      val got = schema.fields.map(f => (f.name, f.dataType)).toSeq
      require(got == want.map(f => (f.name, f.dataType)),
        s"graft: schema ${got.mkString(", ")} does not match the dims/type " +
          s"definition ${want.map(f => s"(${f.name}, ${f.dataType})").mkString(", ")}")
    }
    val meta = latestMeta(ds) match {
      case Some(parent) =>
        // adding a variable: carry ALL existing variables forward (a graft
        // version is a complete dataset definition), attest shared dims
        val newDims = proposed.dimensions.filter {
          case (k, _) => !parent.dimensions.contains(k) }
        proposed.dimensions.foreach { case (k, ext) =>
          parent.dimensions.get(k).foreach(p => require(p == ext,
            s"graft: dimension '$k' is $p in dataset $ds, supplied as $ext")) }
        proposed.chunkDimensions.foreach { case (k, c) =>
          parent.chunkDimensions.get(k).foreach(p => require(p == c,
            s"graft: chunk-dimension '$k' is $p in dataset $ds, supplied as $c")) }
        parent.copy(
          dimensions = parent.dimensions ++ newDims,
          chunkDimensions = parent.chunkDimensions ++
            proposed.chunkDimensions.filter { case (k, _) => !parent.chunkDimensions.contains(k) },
          variables = parent.variables +
            (ident.name -> proposed.variables(ident.name)),
          versionId = None, parent = None)
      case None => proposed
    }
    if (!store.datasetExists(ds)) store.create(ds)
    // commit an EMPTY version carrying the definition: the table then
    // exists for INSERT / CTAS's follow-up write (which commits its own
    // version on top)
    val w = store.addVersion(ds, meta)
    w.finishVersion()
    new GraftTable(tableOptions(ident))
  }

  /** `ALTER TABLE … SET TBLPROPERTIES ('dims' = 'x:20[,y:7]')` — dimension
    * grow/shrink through SQL (reference behaviors:
    * src/io/mandoline/test/grow.clj:56-71, shrink.clj:55-70). Appends a
    * version whose metadata carries the new extents: all variables carry
    * forward, chunks inside the surviving extent are structurally shared,
    * newly exposed regions read fill, and time travel still sees the old
    * shape. Chunk extents are frozen — they define the content-addressed
    * chunk grid, so changing them would orphan every existing blob.
    * Any other table change is rejected (variable definitions are
    * immutable across versions). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val ds = dsOf(ident)
    val parent = latestMeta(ds).get
    val updated = changes.foldLeft(parent) {
      case (m, sp: TableChange.SetProperty) if sp.property == "dims" =>
        val entries = sp.value.split(',').toVector.map { part =>
          part.split(':') match {
            case Array(n, e) => (n.trim, e.trim.toLong, None)
            case Array(n, e, c) => (n.trim, e.trim.toLong, Some(c.trim.toLong))
            case _ => throw new IllegalArgumentException(
              s"graft: bad dims entry '$part' — want name:extent[:chunkExtent]")
          }
        }
        entries.foreach { case (n, e, c) =>
          require(m.dimensions.contains(n),
            s"graft: ALTER dims names unknown dimension '$n' of dataset $ds " +
              s"(have ${m.dimensions.keys.toSeq.sorted.mkString(", ")})")
          require(e > 0, s"graft: dimension '$n' extent must be positive, got $e")
          c.foreach(cc => require(cc == m.chunkDimensions(n),
            s"graft: chunk extent of '$n' is frozen at ${m.chunkDimensions(n)} " +
              s"(it defines the chunk grid); got $cc"))
        }
        m.copy(dimensions = m.dimensions ++ entries.map(t => t._1 -> t._2))
      case (_, other) => throw new UnsupportedOperationException(
        s"graft: unsupported ALTER (${other.getClass.getSimpleName}) — only " +
          "SET TBLPROPERTIES ('dims' = 'name:extent,…') for dimension " +
          "grow/shrink is supported; variable definitions are frozen")
    }
    val w = store.addVersion(ds, updated.copy(versionId = None, parent = None))
    w.finishVersion()
    loadTable(ident)
  }

  /** DROP TABLE appends a version whose metadata OMITS the variable — a
    * graft version is a complete dataset definition, so this is ordinary
    * MVCC: readers of older versions (time travel) still see it, the
    * latest does not, and its blobs stay live exactly as long as some
    * version references them (vacuum's refcount handles the rest). This
    * also makes CTAS rollback sound: a failed CTAS write drops the
    * just-created empty variable instead of wedging it forever. */
  override def dropTable(ident: Identifier): Boolean =
    latestMeta(dsOf(ident)) match {
      case Some(m) if m.variables.contains(ident.name) =>
        val w = store.addVersion(dsOf(ident), m.copy(
          variables = m.variables - ident.name,
          versionId = None, parent = None))
        w.finishVersion()
        true
      case _ => false
    }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft: variables cannot be renamed")

  // ---- namespaces (datasets) ----

  override def listNamespaces(): Array[Array[String]] =
    store.listDatasets.sorted.map(d => Array(d)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespace.length == 1 && store.datasetExists(namespace(0))) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && store.datasetExists(namespace(0))

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    val vs = store.versions(namespace(0))
    Map("versions" -> vs.size.toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    require(namespace.length == 1,
      "graft namespaces are single-level (one namespace = one dataset)")
    store.create(namespace(0))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft: datasets have no mutable metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    if (!cascade && latestMeta(namespace(0)).exists(_.variables.nonEmpty))
      throw new IllegalStateException(
        s"dataset ${namespace(0)} has committed variables; use DROP NAMESPACE … CASCADE")
    store.destroy(namespace(0))
    true
  }
}
