package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive a larger scale factor from an existing driver-generated one —
  * the scale-proof corpus for measuring how query times grow with data
  * size (BASELINE.md records the ratios). Usage:
  *
  *   runMain graft.ScaleGen <srcSfDir> <outDir> [multiplier=10]
  *
  * The derived corpus is `multiplier` id-offset copies of the source
  * tables, NOT fresh synthesis — so value distributions, key skew, text
  * token frequencies, and embedding geometry all match the driver's
  * corpus by construction. Deterministic (no RNG): reruns produce
  * byte-identical data. Per-copy perturbations keep the derived corpus
  * honest at scale:
  *
  *  - documents: a per-copy suffix token is appended to `text` (copy 0 is
  *    verbatim), so exact-duplicate rates match the source per copy while
  *    cross-copy pairs become NEAR-duplicates (~1-token Jaccard delta) —
  *    a 10× web crawl genuinely has more near-dups, and this exercises
  *    the dedup family's banding/CC under growing cluster sizes;
  *  - events: ids and user_ids are offset per copy, timestamps are kept —
  *    10× event density over the same window, the shape of a service
  *    with 10× traffic (user count also grows 10×);
  *  - embeddings: vec_ids offset; a small deterministic jitter
  *    (xxhash64-derived, ±0.005) decorrelates copies so ANN buckets grow
  *    with corpus size instead of filling with exact clones.
  *
  * Only the tables the scale-sensitive families read (documents, events,
  * embeddings) are multiplied; the TPC-H-ish star tables are copied
  * verbatim for loaders that expect the full directory.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val mult = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try generate(spark, src, out, mult)
    finally spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, mult: Int): Unit = {
    val copies = spark.range(mult).toDF("copy")

    def offsetBy(df: DataFrame, idCols: Seq[String]): DataFrame = {
      // id' = id + copy · (max+1) per id column — collision-free, stable.
      // All maxes in ONE aggregate action: a per-column agg would scan
      // the full source once per id column.
      val maxRow = df.agg(max(col(idCols.head)),
        idCols.tail.map(c => max(col(c))): _*).head()
      val offsets = idCols.zipWithIndex
        .map { case (c, i) => c -> (maxRow.getLong(i) + 1L) }.toMap
      idCols.foldLeft(df.crossJoin(copies)) { (d, c) =>
        d.withColumn(c, col(c) + col("copy") * offsets(c))
      }
    }

    val docs = Tables.load(spark, src, "documents")
    offsetBy(docs, Seq("doc_id"))
      .withColumn("text",
        when(col("copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" cpy"), col("copy"))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("copy")
      .repartition(8).write.mode("overwrite").parquet(s"$out/documents.parquet")

    offsetBy(Tables.load(spark, src, "events"), Seq("event_id", "user_id"))
      .drop("copy")
      .repartition(8).write.mode("overwrite").parquet(s"$out/events.parquet")

    val emb = Tables.load(spark, src, "embeddings")
    offsetBy(emb, Seq("vec_id"))
      .withColumn("embedding",
        when(col("copy") === 0, col("embedding")).otherwise(
          // deterministic per-(vec, dim) jitter in [-0.005, 0.005); the
          // jitter array is sized FROM the embedding (a hardcoded width
          // would null-pad zip_with and silently corrupt a corpus
          // generation with a different dimension)
          zip_with(col("embedding"),
            transform(sequence(lit(1), size(col("embedding"))),
              j => (pmod(xxhash64(col("vec_id"), j), lit(1000L))
                .cast("double") / 100000.0 - 0.005).cast("float")),
            (v, e) => v + e)))
      .drop("copy")
      .repartition(8).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    for (t <- Tables.all)
      System.err.println(s"[scalegen] $t: " +
        spark.read.parquet(s"$out/$t.parquet").count() + " rows")
  }
}
