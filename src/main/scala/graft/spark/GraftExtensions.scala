package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProduct, LshSignature}

/** Config-driven deployment entry point: with
  * `spark.sql.extensions=graft.spark.GraftExtensions` every session in a
  * cluster gets graft's native Catalyst expressions as SQL functions —
  * no driver-side `register()` call, so pure-SQL users (JDBC, notebooks,
  * `spark-sql`) can write `graft_dot(a, b)` / `graft_lsh_sig(v, 16, 0)`
  * directly. The same codegen'd expressions back the Scala Column API
  * (`graft.functions.VectorFunctions`); this merely surfaces them
  * through the analyzer's function resolution.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_dot(arr, arr) takes 2 arguments")
        DotProduct(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_sig"),
      new ExpressionInfo(classOf[LshSignature].getName, "graft_lsh_sig"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 || exprs.length == 3,
          "graft_lsh_sig(arr, nBits[, planeOffset]) takes 2 or 3 arguments")
        LshSignature(exprs(0), exprs(1),
          if (exprs.length > 2) exprs(2) else Literal(0))
      }))
  }
}
