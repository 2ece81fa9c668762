package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the ANN hot path: sequential-fold dot
  * product over two double arrays, with `doGenCode` so it stays inside
  * whole-stage codegen (the `aggregate(zip_with(...))` higher-order
  * formulation interprets its lambda per element per row).
  *
  * Summation is strictly left-to-right — bit-identical to both the HOF
  * fold it replaces and DuckDB's list_dot_product, so oracle hashes are
  * unchanged.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Native Catalyst expression for the LSH bucketing hot path: the whole
  * `nBits`-bit random-hyperplane signature in ONE pass over the vector.
  *
  * The higher-order-function formulation (`concat` of `nBits` ×
  * `aggregate(transform(v, …))` columns) materializes `nBits`
  * intermediate arrays PER ROW and interprets the weight lambda per
  * element; this expression runs the plane loops inline on the
  * ArrayData, allocating only the output bytes. The hyperplane weights
  * are the same two-round multiplicative-xorshift mixer as the DuckDB
  * oracles, CACHED in a per-instance table (they depend only on
  * (plane, dim index)), and the per-plane accumulation is strictly
  * left-to-right from 0.0 — bit-identical to the HOF fold it replaces,
  * so oracle hashes are unchanged.
  *
  * `offsetExpr` shifts the plane index: plane h of this signature uses
  * mixer row `offset + h`. Independent LSH tables (OR-amplification:
  * union candidates over r reseeded tables) use offsets 0, 24, 48, … so
  * no two tables share a hyperplane at any trim width ≤ 24. The mixer
  * input (offset+h)·40503 + j + 1 stays < 2^23 for offset ≤ 96 and
  * dim ≤ 2^15, so every product below remains exact in signed 64-bit —
  * DuckDB BIGINT arithmetic reproduces it bit-for-bit. */
case class LshSignature(child: Expression, nBitsExpr: Expression,
    offsetExpr: Expression) extends TernaryExpression {
  override def first: Expression = child
  override def second: Expression = nBitsExpr
  override def third: Expression = offsetExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
        nBitsExpr.foldable && nBitsExpr.dataType == IntegerType &&
        offsetExpr.foldable && offsetExpr.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_sig expects (array<double>, literal int nBits" +
        s"[, literal int planeOffset]), got (${child.dataType.simpleString}, " +
        s"${nBitsExpr.dataType.simpleString}, ${offsetExpr.dataType.simpleString})")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lsh_sig"

  @transient private lazy val nBits: Int =
    nBitsExpr.eval(null).asInstanceOf[Number].intValue
  @transient private lazy val planeOffset: Int =
    offsetExpr.eval(null).asInstanceOf[Number].intValue

  // weight table grown to the widest vector seen by this instance —
  // weights are a pure function of (h, j), laid out [h * table.dim + j].
  // The table and its stride travel together in one immutable holder
  // published through a single volatile reference, so a reader always
  // sees a (stride, entries) pair that agree: after the table grows for
  // a wider vector, narrower vectors index with the WIDER stride and
  // still read the pure mixer(h, j) values (entries for j < dim are
  // stride-independent).
  private final class WeightTable(val dim: Int, val w: Array[Double])
  @transient @volatile private var wt: WeightTable = _

  private def weights(dim: Int): WeightTable = {
    val cur = wt
    if (cur != null && cur.dim >= dim) return cur
    synchronized {
      val cur2 = wt
      if (cur2 != null && cur2.dim >= dim) cur2
      else {
        val t = new Array[Double](nBits * dim)
        var h = 0
        while (h < nBits) {
          var j = 0
          while (j < dim) {
            val k0 = (planeOffset + h) * 40503L + j + 1L
            val x1 = (k0 * 2654435761L) & 0xffffffffL
            val x2 = x1 ^ (x1 >>> 16)
            val x3 = (x2 * 49979693L) & 0xffffffffL
            val x4 = x3 ^ (x3 >>> 16)
            t(h * dim + j) = (x4 >>> 22).toDouble / 512.0 - 1.0
            j += 1
          }
          h += 1
        }
        val grown = new WeightTable(dim, t)
        wt = grown
        grown
      }
    }
  }

  /** Runtime kernel, also called from generated code. */
  def signature(a: ArrayData): UTF8String = {
    val dim = a.numElements()
    val tbl = weights(dim)
    val w = tbl.w
    val stride = tbl.dim
    val out = new Array[Byte](nBits)
    var h = 0
    while (h < nBits) {
      var acc = 0.0
      val base = h * stride
      var j = 0
      while (j < dim) { acc += a.getDouble(j) * w(base + j); j += 1 }
      out(h) = if (acc >= 0) '1'.toByte else '0'.toByte
      h += 1
    }
    UTF8String.fromBytes(out)
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    signature(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshSig", this, classOf[LshSignature].getName)
    nullSafeCodeGen(ctx, ev, (a, _, _) => s"${ev.value} = $ref.signature($a);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(child = f, nBitsExpr = s, offsetExpr = t)
}

object VectorFunctions {
  private val registered = java.util.Collections.synchronizedSet(
    new java.util.HashSet[String]())

  /** Register graft's native functions in the session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark.sessionState.toString)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_lsh_sig", exprs => LshSignature(exprs(0), exprs(1),
          if (exprs.length > 2) exprs(2)
          else org.apache.spark.sql.catalyst.expressions.Literal(0)), "built-in")
    }

  /** Codegen'd sequential dot product of two Array[Double] columns. */
  def dotProduct(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_dot", a, b)
  }

  /** Codegen'd one-pass LSH signature of an Array[Double] column.
    * `planeOffset` selects the hyperplane set — independent tables for
    * OR-amplified LSH use offsets 0, 24, 48, … */
  def lshSignature(spark: SparkSession, v: Column, nBits: Int,
      planeOffset: Int = 0): Column = {
    register(spark)
    call_function("graft_lsh_sig", v, org.apache.spark.sql.functions.lit(nBits),
      org.apache.spark.sql.functions.lit(planeOffset))
  }
}
