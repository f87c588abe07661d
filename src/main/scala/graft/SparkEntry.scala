package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DedupOps, EventOps, MultiModalOps, PipelineOps, RefParity, Relational, SimOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator inventory (SURVEY.md §2.3):
  * Group A (reference parity through the MRJob kernel), Group B
  * (relational surface), Group C (training-data pipeline extensions).
  * Every SQL-expressible query has a DuckDB oracle in `oracleSql`;
  * non-SQL-expressible ones (LSH variants, lang-id) get the driver's
  * rows-only check and are covered by ScalaTest specs instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own shipped example (char count, word_count.cc) run
    * through the MRJob kernel.
    */
  def entry(spark: SparkSession): DataFrame =
    RefParity.mrCharCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefParity.queries ++ Relational.queries ++ TextOps.queries ++
      DedupOps.queries ++ SimOps.queries ++ EventOps.queries ++
      MultiModalOps.queries ++ PipelineOps.queries ++
      graft.streaming.EventStream.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RefParity.oracle ++ Relational.oracle ++ TextOps.oracle ++
      DedupOps.oracle ++ SimOps.oracle ++ EventOps.oracle ++
      MultiModalOps.oracle ++ PipelineOps.oracle ++
      graft.streaming.EventStream.oracle

  /** Oracle SQL whose text depends on data-trained plan literals (e.g.
    * the IVF codebook): generated against the verify-time tables, merged
    * into oracle_sql.json by Verify. Same correctness contract as
    * `oracleSql` — DuckDB replays the full query downstream of training.
    */
  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] =
    SimOps.dynamicOracle(spark, sfDir)
}
