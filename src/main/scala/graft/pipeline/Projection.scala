package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection for embedding columns, with
  * INTEGER-EXACT arithmetic so the projected sketch is cross-engine
  * hash-checkable.
  *
  * The projection matrix is ±1 signs derived from md5("j_d") (input dim j,
  * output dim d) — a fixed pseudo-random Rademacher matrix both engines
  * can derive independently; JL holds for Rademacher entries just as for
  * Gaussians (Achlioptas 2003). Vectors are first int8-quantized exactly
  * like `Similarity.quantizedTopK` (integer-valued doubles ≤ 127), so each
  * projected coordinate is a sum of ≤ dim·127 — exact in doubles in ANY
  * summation order, hence deterministic under partitioning.
  *
  * Scale: row-local (no shuffle at all) — the standard pre-pass to cut
  * ANN memory/IO k/dim× before bucketing or indexing; the sign matrix is
  * 1024 literals folded into codegen, not a join.
  */
object Projection {

  /** ±1 from the first hex digit of md5("j_d") — mirrors the SQL oracle's
    * `md5(concat(j, '_', d))` exactly. */
  def sign(j: Int, d: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"${j}_${d}".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) < 8) 1 else -1
  }

  /** (vec_id, proj: Array[Long] of length `outDim`) — int8-quantized
    * input projected through the fixed Rademacher matrix. */
  def projectQ8(emb: DataFrame, inDim: Int = 64, outDim: Int = 16): DataFrame = {
    val q8 = emb
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("ma", array_max(transform(col("v"), x => abs(x))))
      .withColumn("qv", transform(col("v"),
        x => when(col("ma") === 0.0, 0.0).otherwise(round(x * (lit(127.0) / col("ma"))))))
    val proj = array((0 until outDim).map { d =>
      (0 until inDim).map { j =>
        element_at(col("qv"), j + 1) * lit(sign(j, d).toDouble)
      }.reduce(_ + _).cast("long")
    }: _*)
    q8.select(col("vec_id"), proj.as("proj"))
  }
}
