package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout helpers for the 100 TB posture — the pieces that turn
  * recurring shuffles into one-time writes:
  *
  *  - **Bucketing**: persist both sides of a hot join bucketed on the join
  *    key; subsequent joins are shuffle-free (SortMergeJoin over
  *    co-located buckets, no Exchange). At 100 TB this converts the
  *    lineitem⋈orders shuffle (the biggest network cost in the corpus)
  *    into local disk reads. Verified shuffle-free in StorageSpec.
  *  - **Partitioning**: persist event/fact tables partitioned by a
  *    low-cardinality derived column (e.g. event date); predicate-pruned
  *    scans read only matching directories (PartitionFilters in the scan
  *    node), the standard time-series layout.
  *
  * The reference has no storage layer at all (inputs ride the RPC body,
  * `master.cc:270-293`; results live in master RAM, `job.h:86-88`).
  */
object Storage {

  /** Write `df` as a bucketed, sorted table into the session catalog
    * (requires a warehouse dir; buckets co-locate equal keys).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Write `df` partitioned by `partitionCols` (directory-per-value). */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
