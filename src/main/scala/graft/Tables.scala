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
      // The driver-generated events.ts is parquet TIMESTAMP(NANOS), which
      // Spark's vectorized reader rejects; read it as raw nanos and convert
      // (integer division — no double round-trip) to a real TimestampType.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view (for spark.sql-style access). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
