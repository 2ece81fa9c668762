package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{ArrayQueries, PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers:
  *  - the SURVEY §2.7 array-engine query set (q_arr_*): every query runs
  *    the full distributed path — shred→shuffle-merge ingest, Parquet
  *    chunk/index tables, MVCC version resolve, pruned exploded reads;
  *  - the relational operator surface (q_rel_*): scan/filter/join/agg/
  *    window/semi-anti over the testdata;
  *  - training-data pipeline operators (q_pipe_*): exact + MinHash-LSH +
  *    SimHash + Jaccard dedup, dup clustering, brute-force/LSH/IVF ANN,
  *    language-ID, quality scoring, token counts, fingerprints,
  *    multimodal plumbing, sessionization, and curation (benchmark
  *    decontamination, deterministic stratified sampling, sequence
  *    packing, vocabulary).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ArrayQueries.queries("q_arr_slice")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ArrayQueries.queries ++ RelationalQueries.queries ++ PipelineQueries.queries

  /** DuckDB-equivalent SQL per query — every query key has an oracle
    * (including both approximate ANN variants, which are deterministic by
    * construction and replicated exactly in SQL). */
  def oracleSql: Map[String, String] =
    ArrayQueries.oracleSql ++ RelationalQueries.oracleSql ++ PipelineQueries.oracleSql
}
