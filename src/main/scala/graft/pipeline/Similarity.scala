package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor operators over an embedding column
  * (`Array[Float]`).
  *
  * - `bruteForceTopK` is the exact baseline: query-side broadcast cross
  *   join + codegen'd higher-order-function dot products (no UDFs).
  * - `lshTopK` is the scale path: random-hyperplane LSH buckets the
  *   vectors so the pairwise step runs per-bucket, not all-pairs —
  *   at 100 TB the cross join is the difference between feasible and not.
  */
object Similarity {

  /** Sequential-fold dot product — graft's native codegen expression
    * (graft.functions.DotProduct); left-to-right summation matches the
    * oracle's evaluation order bit-for-bit. */
  private def dot(emb: DataFrame)(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotProduct(emb.sparkSession, a, b)

  private def withNorm(emb: DataFrame): DataFrame = {
    val d = dot(emb) _
    emb.select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(d(col("v"), col("v"))))
  }

  /** Exact top-k cosine neighbors for the `nQueries` lowest vec_ids.
    * Output: (query_id, neighbor_id, rank). */
  def bruteForceTopK(emb: DataFrame, k: Int, nQueries: Int): DataFrame = {
    val n = withNorm(emb)
    val q = n.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cand = n.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    broadcast(q).join(cand, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", dot(emb)(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  /** IVF (inverted-file) ANN: vectors are assigned to their nearest of K
    * coarse centroids; queries probe only the `nProbe` nearest centroid
    * lists. Centroids here are the K lowest-id vectors (deterministic
    * seeding — a production build would run k-means refinement; the
    * partition/probe plumbing is identical). At scale the assignment is a
    * broadcast join against K ≈ √N centroids and the search touches
    * N·nProbe/K candidates instead of N. */
  def ivfTopK(emb: DataFrame, k: Int, nQueries: Int,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val n = withNorm(emb)
    val d = dot(emb) _
    val cents = broadcast(n.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn")))
    // assign every vector to its nearest centroid (rank 1 by cosine)
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("csim").desc, col("cent_id").asc)
    val assigned = n.crossJoin(cents)
      .withColumn("csim", d(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("crk", row_number().over(wAssign))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cent_id"))
    // queries probe their nProbe nearest centroids
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("csim").desc, col("cent_id").asc)
    val probes = n.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      .crossJoin(cents)
      .withColumn("csim", d(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cent_id"))
    // search only within the probed lists
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    probes.join(assigned.withColumnRenamed("vec_id", "neighbor_id"), Seq("cent_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", d(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  /** Random-hyperplane LSH: `nBits`-bit signature from fixed pseudo-random
    * hyperplanes (deterministic, seeded by dimension index — no RNG at
    * runtime). Vectors sharing a signature land in one bucket; top-k then
    * runs inside buckets only. Returns (query_id, neighbor_id, rank) for
    * neighbors found in the query's bucket — a recall/throughput tradeoff
    * tuned by nBits. */
  def lshTopK(emb: DataFrame, k: Int, nQueries: Int, nBits: Int = 8): DataFrame = {
    val n = withNorm(emb)
    // hyperplane h, component j = a fixed arithmetic hash mapped to (-1, 1)
    def plane(h: Int): Column =
      transform(col("v"), (x, j) => x * (pmod(lit(h * 2654435761L) + j * lit(40503L), lit(1024L)).cast("double") / 512.0 - 1.0))
    val sigBits = (0 until nBits).map(h =>
      when(aggregate(plane(h), lit(0.0), (acc, x) => acc + x) >= 0, lit("1")).otherwise(lit("0")))
    val sig = n.withColumn("bucket", concat(sigBits: _*))
    val q = sig.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"), col("bucket"))
    val cand = sig.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm"), col("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    q.join(cand, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", dot(emb)(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }
}
