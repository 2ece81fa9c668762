package graft.functions

import graft.core.DType
import graft.filters.FilterChain
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_cells(bytes, volume, dtypeName, fill)` — decode one framed chunk
  * blob to a primitive value array (or a fill array when bytes is null,
  * i.e. a never-written chunk).
  *
  * This is the hot half of the exploded read: the per-cell work then runs
  * as `posexplode` + long arithmetic INSIDE whole-stage codegen, instead
  * of the boxed Row-per-cell mapPartitions it replaces (measured ~5 s of
  * an 8 s full read at the 216M-cell reference shape). `doGenCode` emits a
  * single call to [[decode]] returning an UnsafeArrayData backed by a
  * primitive array — no boxing anywhere.
  */
case class DecodeChunkCells(bytes: Expression, volume: Expression,
    dtypeName: Expression, fillExpr: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(bytes, volume, dtypeName, fillExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cells"

  override def checkInputDataTypes(): TypeCheckResult =
    if (bytes.dataType == BinaryType && volume.dataType == LongType &&
        dtypeName.foldable && fillExpr.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_cells expects (binary, bigint, literal string, literal double)")

  @transient private lazy val dt: DType =
    DType(dtypeName.eval(null).asInstanceOf[UTF8String].toString)
  @transient private lazy val fill: Double =
    fillExpr.eval(null).asInstanceOf[Number].doubleValue

  override def dataType: DataType = ArrayType(dt.sparkType, containsNull = false)

  /** Runtime kernel, also called from generated code. A decoded buffer
    * whose length disagrees with the expected chunk volume fails loudly
    * (a silent prefix-read would mislabel cells). Fill uses the same
    * bit-pattern test as Slab.empty so −0.0 and NaN fills round-trip. */
  def decode(framed: Array[Byte], vol: Long): ArrayData = {
    val n = vol.toInt
    val raw = if (framed == null) null else FilterChain.decode(framed)
    if (raw != null && raw.length != n * dt.size)
      throw new IllegalStateException(
        s"chunk blob decodes to ${raw.length} bytes but the chunk grid " +
          s"expects $n × ${dt.size} — corrupt blob or metadata mismatch")
    val bb = if (raw == null) null else java.nio.ByteBuffer.wrap(raw) // big-endian
    val needsFill =
      fill != 0.0 || java.lang.Double.doubleToRawLongBits(fill) != 0L
    dt match {
      case DType.BYTE =>
        val out = if (raw != null) raw else {
          val a = new Array[Byte](n)
          if (needsFill) java.util.Arrays.fill(a, fill.toByte); a
        }
        UnsafeArrayData.fromPrimitiveArray(out)
      case DType.SHORT =>
        val out = new Array[Short](n)
        if (bb != null) bb.asShortBuffer().get(out)
        else if (needsFill) java.util.Arrays.fill(out, fill.toShort)
        UnsafeArrayData.fromPrimitiveArray(out)
      case DType.CHAR => // exposed as UTF-16 code unit (IntegerType)
        val out = new Array[Int](n)
        if (bb != null) {
          val sb = bb.asShortBuffer()
          var i = 0
          while (i < n) { out(i) = sb.get(i) & 0xffff; i += 1 }
        } else if (needsFill) java.util.Arrays.fill(out, fill.toChar.toInt)
        UnsafeArrayData.fromPrimitiveArray(out)
      case DType.INT =>
        val out = new Array[Int](n)
        if (bb != null) bb.asIntBuffer().get(out)
        else if (needsFill) java.util.Arrays.fill(out, fill.toInt)
        UnsafeArrayData.fromPrimitiveArray(out)
      case DType.LONG =>
        val out = new Array[Long](n)
        if (bb != null) bb.asLongBuffer().get(out)
        else if (needsFill) java.util.Arrays.fill(out, fill.toLong)
        UnsafeArrayData.fromPrimitiveArray(out)
      case DType.FLOAT =>
        val out = new Array[Float](n)
        if (bb != null) bb.asFloatBuffer().get(out)
        else if (needsFill) java.util.Arrays.fill(out, fill.toFloat)
        UnsafeArrayData.fromPrimitiveArray(out)
      case DType.DOUBLE =>
        val out = new Array[Double](n)
        if (bb != null) bb.asDoubleBuffer().get(out)
        else if (needsFill) java.util.Arrays.fill(out, fill)
        UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val b = bytes.eval(input)
    val v = volume.eval(input)
    decode(if (b == null) null else b.asInstanceOf[Array[Byte]],
      v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("chunkDecoder", this, classOf[DecodeChunkCells].getName)
    val bytesGen = bytes.genCode(ctx)
    val volGen = volume.genCode(ctx)
    val code =
      code"""
        ${bytesGen.code}
        ${volGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.decode(${bytesGen.isNull} ? null : ${bytesGen.value}, ${volGen.value});
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(bytes = newChildren(0), volume = newChildren(1),
      dtypeName = newChildren(2), fillExpr = newChildren(3))
}

object ChunkFunctions {
  private val registered = java.util.Collections.synchronizedSet(
    new java.util.HashSet[String]())

  /** Register graft's chunk functions in the session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark.sessionState.toString)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_cells",
        exprs => DecodeChunkCells(exprs(0), exprs(1), exprs(2), exprs(3)),
        "built-in")
    }

  /** Decode a framed chunk blob column into a primitive value array. */
  def chunkCells(spark: SparkSession, bytes: Column, volume: Column,
      dtypeName: Column, fill: Column): Column = {
    register(spark)
    call_function("graft_cells", bytes, volume, dtypeName, fill)
  }
}
