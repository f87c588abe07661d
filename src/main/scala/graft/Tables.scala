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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // The driver has shipped events.ts under two physical types across
      // corpus generations: parquet TIMESTAMP(NANOS) (which Spark's
      // vectorized reader rejects — read as raw nanos via the legacy flag
      // and convert with integer division, no double round-trip) and plain
      // TIMESTAMP(MICROS) (which Spark reads as TIMESTAMP_NTZ). Normalize
      // both to TimestampType; the session is pinned to UTC everywhere, so
      // the NTZ cast is exact and matches DuckDB's naive-timestamp reading.
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampType => raw
        case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view (for spark.sql-style access). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
