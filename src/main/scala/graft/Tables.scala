package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * All queries take an `sfDir` (scale-factor directory) and read parquet
  * lazily so Catalyst can push filters/projections into the scan. At cluster
  * scale the same loaders work against any parquet path (HDFS/S3A/...) —
  * nothing here assumes local files.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize an events frame's `ts` to TimestampType. The driver has
    * shipped it under two physical types across corpus generations:
    * parquet TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
    * callers set the legacy nanosAsLong flag, so it arrives as raw-nanos
    * LongType and is converted with integer division, no double
    * round-trip) and plain TIMESTAMP(MICROS) (which Spark reads as
    * TIMESTAMP_NTZ). The session is pinned to UTC everywhere, so the NTZ
    * cast is exact and matches DuckDB's naive-timestamp reading. ONE
    * shared implementation for the batch loader and the streaming reader
    * — a new generation's encoding gets handled (or rejected) in one
    * place, never half-fixed.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        // A raw-int64 ts is only legitimately the legacy nanosAsLong read
        // of parquet TIMESTAMP(NANOS); a corpus shipping plain int64
        // micros (or seconds) under the same physical type would be
        // silently converted 1000× off. Nanoseconds for any date after
        // ~1973 exceed 1e17, while micros/seconds magnitudes sit orders
        // of magnitude below it — so reject implausible values loudly
        // (per row, inside the scan, no extra pass) instead of guessing.
        // NULL ts passes through as NULL timestamp (the pre-guard
        // behavior); without the explicit arm it would fall into the
        // ELSE branch, and concat's null propagation would hand
        // raise_error a NULL message — a scan-wide crash that never
        // names this function.
        df.withColumn("ts", expr(
          "CASE WHEN ts IS NULL THEN CAST(NULL AS TIMESTAMP) " +
            "WHEN ts >= 100000000000000000L " +
            "THEN timestamp_micros(ts div 1000) " +
            "ELSE CAST(raise_error(concat('normalizeTs: int64 ts value ', " +
            "CAST(ts AS STRING), ' is too small to be nanoseconds — " +
            "unrecognized encoding, convert ts explicitly')) AS TIMESTAMP) END"))
      case TimestampType => df
      // Plain TIMESTAMP(MICROS) without isAdjustedToUTC arrives as NTZ;
      // the session is pinned UTC so the cast is exact.
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"normalizeTs: unrecognized ts encoding $other — refusing to guess " +
          "a conversion; normalize the corpus or extend normalizeTs deliberately")
    }
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view (for spark.sql-style access). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
