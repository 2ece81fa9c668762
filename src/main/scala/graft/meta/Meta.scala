package graft.meta

import com.fasterxml.jackson.core.{JsonGenerator, JsonParser}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.core.{ChunkGrid, DType, Slice}
import scala.jdk.CollectionConverters._

/** One variable of a dataset: a dense n-D array of one primitive type over
  * an ordered list of dimensions, with a mandatory fill value
  * (reference: README.md:120-140, src/io/mandoline/variable.clj:16-47). */
final case class VariableDef(
    typeName: String,
    shape: Vector[String],
    fillValue: Double,
    attributes: Option[String] = None) { // raw JSON, round-tripped opaquely
  def dtype: DType = DType(typeName)
}

/** A dataset definition / version token: dimensions + chunk-dimensions +
  * variables (+ version linkage once stamped)
  * (reference: src/io/mandoline/dataset.clj, README.md:114-140). */
final case class DatasetMeta(
    dimensions: Map[String, Long],
    chunkDimensions: Map[String, Long],
    variables: Map[String, VariableDef],
    filters: Seq[String] = Nil,
    versionId: Option[Long] = None,
    parent: Option[Long] = None,
    extra: Option[String] = None) { // raw JSON object of unrecognized keys

  def dtype(varName: String): DType = variables(varName).dtype
  def fill(varName: String): Double = variables(varName).fillValue

  /** Variable extent as a slice (reference: variable.clj:41-47). */
  def varSlice(varName: String): Slice = {
    val sh = variables(varName).shape
    Slice(
      Vector.fill(sh.size)(0L),
      sh.map(dimensions(_)),
      Vector.fill(sh.size)(1L))
  }

  /** Variable extent with chunk extents as the step
    * (reference: variable.clj:49-56). */
  def chunkGridSlice(varName: String): Slice = {
    val sh = variables(varName).shape
    Slice(
      Vector.fill(sh.size)(0L),
      sh.map(dimensions(_)),
      sh.map(chunkDimensions(_)))
  }

  /** Data-space slice of one chunk; overhangs the variable edge
    * (reference: variable.clj:58-74). */
  def chunkSlice(varName: String, coord: Seq[Long]): Slice =
    ChunkGrid.fromChunkCoordinate(chunkGridSlice(varName), coord)

  def toJson: String = MetaJson.write(this)
}

object DatasetMeta {
  def fromJson(json: String): DatasetMeta = MetaJson.read(json)

  /** NaN-aware equality (reference: src/io/mandoline/utils.clj:36-55). */
  def nanEq(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || a == b

  /** Validate a dataset definition, throwing IllegalArgumentException on
    * the same conditions as the reference
    * (reference: src/io/mandoline/dataset.clj:32-53). */
  def validate(m: DatasetMeta): Unit = {
    def attest(cond: Boolean, msg: String): Unit =
      if (!cond) throw new IllegalArgumentException(s"Attest failed: $msg")
    attest(m.dimensions.nonEmpty || m.variables.forall(_._2.shape.isEmpty),
      "metadata must contain dimensions, variables, and chunk-dimensions.")
    attest(m.dimensions.keySet == m.chunkDimensions.keySet,
      "there must be a 1:1 mapping from dimensions to chunk-dimensions.")
    attest(m.variables.forall { case (_, v) => v.typeName != null && v.shape != null },
      "each variable must contain shape, type and fill-value.")
    attest(m.variables.forall { case (_, v) => DType.isSupported(v.typeName) },
      "one or more of the provided variable types are unsupported.")
    attest(m.variables.forall { case (_, v) =>
      !v.fillValue.isNaN || v.dtype.allowsNaNFill
    }, "one or more of the provided variable fill values are invalid.")
    attest(m.variables.forall { case (_, v) => v.shape.forall(m.dimensions.contains) },
      "one or more of the provided variable shapes is not a provided dimension.")
  }

  /** Validate a child version against its parent and set up the parent
    * pointer. Frozen across versions: chunk-dimensions (inherited when the
    * child omits them), and each pre-existing variable's type / shape /
    * fill-value. Dimension lengths may change; new dimensions and variables
    * may be added (reference: src/io/mandoline/dataset.clj:55-110). */
  def inherit(child0: DatasetMeta, parent: DatasetMeta): DatasetMeta = {
    def attest(cond: Boolean, msg: String): Unit =
      if (!cond) throw new IllegalArgumentException(s"Attest failed: $msg")
    val child =
      (if (child0.chunkDimensions.isEmpty && parent.chunkDimensions.nonEmpty)
        child0.copy(chunkDimensions = parent.chunkDimensions)
      else child0).copy(parent = parent.versionId)
    attest(parent.chunkDimensions.forall { case (k, v) => child.chunkDimensions.get(k).contains(v) },
      "chunk-dimensions must match between versions.")
    child.variables.foreach { case (name, v) =>
      parent.variables.get(name).foreach { pv =>
        attest(pv.typeName == v.typeName, "type for var cannot change between child and parent versions.")
        attest(pv.shape == v.shape, "shape for var cannot change between child and parent versions.")
        attest(nanEq(pv.fillValue, v.fillValue), "fill for var cannot change between child and parent versions.")
      }
    }
    child
  }

  /** Stamp a new version id: epoch millis, kept strictly monotonic vs the
    * parent (reference: dataset.clj:120-122). */
  def newVersion(m: DatasetMeta): DatasetMeta = {
    val now = System.currentTimeMillis()
    val vid = m.parent.fold(now)(p => math.max(now, p + 1))
    m.copy(versionId = Some(vid))
  }
}

/** JSON codec for dataset metadata with the reference's non-standard literal
  * `NaN` tokens (reference: src/io/mandoline/utils.clj:106-122). */
object MetaJson {
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(JsonParser.Feature.ALLOW_NON_NUMERIC_NUMBERS, true)
    m.configure(JsonGenerator.Feature.QUOTE_NON_NUMERIC_NUMBERS, false)
    m
  }

  private val knownKeys = Set("dimensions", "chunk-dimensions", "variables",
    "filters", "version-id", "parent")

  def read(json: String): DatasetMeta = {
    val root = mapper.readTree(json).asInstanceOf[ObjectNode]
    def longMap(key: String): Map[String, Long] =
      Option(root.get(key)).map { n =>
        n.properties().asScala.map(e => e.getKey -> e.getValue.asLong).toMap
      }.getOrElse(Map.empty)
    val vars = Option(root.get("variables")).map { vn =>
      vn.properties().asScala.map { e =>
        val v = e.getValue
        val shape = Option(v.get("shape"))
          .map(_.elements().asScala.map(_.asText).toVector).getOrElse(Vector.empty)
        val fillNode = v.get("fill-value")
        val fill =
          if (fillNode == null) Double.NaN
          else if (fillNode.isTextual)
            throw new IllegalArgumentException("Attest failed: one or more of the provided variable fill values are invalid.")
          else fillNode.asDouble
        val attrs = Option(v.get("attributes")).map(_.toString)
        e.getKey -> VariableDef(
          Option(v.get("type")).map(_.asText).orNull, shape, fill, attrs)
      }.toMap
    }.getOrElse(Map.empty[String, VariableDef])
    val filters = Option(root.get("filters"))
      .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil)
    val extraNode = mapper.createObjectNode()
    root.properties().asScala.foreach { e =>
      if (!knownKeys.contains(e.getKey)) extraNode.set[JsonNode](e.getKey, e.getValue)
    }
    DatasetMeta(
      dimensions = longMap("dimensions"),
      chunkDimensions = longMap("chunk-dimensions"),
      variables = vars,
      filters = filters,
      versionId = Option(root.get("version-id")).map(_.asLong),
      parent = Option(root.get("parent")).filter(!_.isNull).map(_.asLong),
      extra = if (extraNode.isEmpty) None else Some(extraNode.toString))
  }

  def write(m: DatasetMeta): String = {
    val root = mapper.createObjectNode()
    m.extra.foreach { x =>
      mapper.readTree(x).asInstanceOf[ObjectNode].properties().asScala
        .foreach(e => root.set[JsonNode](e.getKey, e.getValue))
    }
    val dims = root.putObject("dimensions")
    m.dimensions.foreach { case (k, v) => dims.put(k, v) }
    val cdims = root.putObject("chunk-dimensions")
    m.chunkDimensions.foreach { case (k, v) => cdims.put(k, v) }
    val vars = root.putObject("variables")
    m.variables.foreach { case (name, v) =>
      val vn = vars.putObject(name)
      vn.put("type", v.typeName)
      val sh = vn.putArray("shape")
      v.shape.foreach(sh.add)
      putNumber(vn, "fill-value", v.fillValue)
      v.attributes.foreach(a => vn.set[JsonNode]("attributes", mapper.readTree(a)))
    }
    if (m.filters.nonEmpty) {
      val f = root.putArray("filters")
      m.filters.foreach(f.add)
    }
    m.versionId.foreach(root.put("version-id", _))
    m.parent.foreach(root.put("parent", _))
    mapper.writeValueAsString(root)
  }

  /** Keep integral fills as JSON integers (round-trip fidelity). */
  private def putNumber(node: ObjectNode, key: String, v: Double): Unit =
    if (!v.isNaN && !v.isInfinite && v == math.floor(v) && math.abs(v) < 9.007199254740992e15)
      node.put(key, v.toLong)
    else node.put(key, v)
}
