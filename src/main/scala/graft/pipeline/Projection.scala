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

  /** Integer-exact Gram accumulator over the q8-quantized corpus — the
    * one-pass statistic PCA/whitening starts from (covariance is
    * (g_ij − s_i·s_j/n)/n, all terms emitted here). Output: one row per
    * (i ≤ j) pair of the first `dim` components — (i, j, g, s_i, s_j,
    * n_vecs) — all integers.
    *
    * Scale shape: each vector emits its dim·(dim+1)/2 products ROW-
    * LOCALLY; the groupBy is map-side combinable, so the shuffle carries
    * at most partitions × pairs partial rows and the result is bounded
    * by the pair count whatever the corpus size. The float path would
    * not hash-check (summation order), the q8 path is exact in any
    * order — same tradeoff as [[projectQ8]]. */
  def gramQ8(emb: DataFrame, dim: Int = 16): DataFrame = {
    val q8 = emb
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("ma", array_max(transform(col("v"), x => abs(x))))
      .withColumn("qv", transform(col("v"),
        x => when(col("ma") === 0.0, 0.0).otherwise(round(x * (lit(127.0) / col("ma"))))))
    // (i, j) index pairs as ONE constant-folded array literal, with the
    // per-pair arithmetic in a single transform lambda — the former
    // unrolled form built dim·(dim+1)/2 = 136 struct terms with inlined
    // element_at trees (~700 expression nodes analyzed/optimized per
    // execution; the projectQ8 scaladoc documents the same pathology).
    // Arithmetic per element is unchanged (same element_at, product,
    // cast order), so the result is bit-identical.
    val idx = array((for { i <- 0 until dim; j <- i until dim } yield
      struct(lit(i.toLong).as("i"), lit(j.toLong).as("j"))): _*)
    val terms = transform(idx, t => {
      val qi = element_at(col("qv"), (t.getField("i") + 1).cast("int"))
      val qj = element_at(col("qv"), (t.getField("j") + 1).cast("int"))
      struct(t.getField("i").as("i"), t.getField("j").as("j"),
        (qi * qj).cast("long").as("p"),
        qi.cast("long").as("qi"), qj.cast("long").as("qj"))
    })
    q8.select(explode(terms).as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(sum("t.p").as("g"), sum("t.qi").as("s_i"),
        sum("t.qj").as("s_j"), count(lit(1)).as("n_vecs"))
      .orderBy("i", "j")
  }

  /** (vec_id, proj: Array[Long] of length `outDim`) — int8-quantized
    * input projected through the fixed Rademacher matrix.
    *
    * The matrix rides as ONE 16×64 literal and the per-row work is a
    * `transform`(rows) × `zip_with`+`aggregate`(dot product) over the
    * MATERIALIZED qv array — a compact expression Catalyst handles in
    * milliseconds. The previous form inlined `qv` (itself a transform
    * over the raw vector) into each of outDim×inDim = 1024 `element_at`
    * terms; the resulting expression forest cost seconds per execution
    * in analysis/codegen alone (observed 4.7 s for 2 000 rows).
    * Bit-identical results: `aggregate` folds left in index order —
    * the same order the unrolled `reduce(_ + _)` summed — over
    * integer-valued doubles, and `cast("long")` normalizes ±0.0. */
  def projectQ8(emb: DataFrame, inDim: Int = 64, outDim: Int = 16): DataFrame = {
    val q8 = emb
      // slice to inDim FIRST: zip_with pads the shorter side with nulls,
      // so an embedding longer than inDim would null-poison every dot
      // product through the aggregate fold; truncating up front keeps
      // the "project the first inDim entries" contract for any length
      .select(col("vec_id"),
        transform(slice(col("embedding"), 1, inDim), _.cast("double")).as("v"))
      .withColumn("ma", array_max(transform(col("v"), x => abs(x))))
      .withColumn("qv", transform(col("v"),
        x => when(col("ma") === 0.0, 0.0).otherwise(round(x * (lit(127.0) / col("ma"))))))
    // ONE Literal node of ArrayType(ArrayType(Double)) — the previous
    // `array(array(lit…))` form was 1 040 expression nodes the analyzer
    // and optimizer re-walked on every execution (~0.3 s/run of pure
    // plan-time); typedLit folds the whole matrix into a single constant.
    // Same values, same fold order — bit-identical output.
    val signs = typedLit((0 until outDim).map { d =>
      (0 until inDim).map(j => sign(j, d).toDouble)
    })
    q8.select(col("vec_id"),
      transform(signs, srow =>
        aggregate(zip_with(col("qv"), srow, (x, s) => x * s),
          lit(0.0), (acc, x) => acc + x).cast("long")).as("proj"))
  }
}
