package graft.tools

import org.apache.spark.sql.functions._

/** Accuracy audit of the BOUNDED semantic gate vs its unbounded twin —
  * the measurement behind c2_incremental_semantic_topc's cap (VERDICT
  * r16 ask #1): run both resolutions on a corpus and count per-arrival
  * decision drift. `identical` = rows equal on (is_novel, match_id,
  * match_cosine); `false_novel` = bounded said novel where unbounded
  * found a match (the only drift the ADC pre-rank can introduce);
  * `extra_match` must be 0 by construction (the bounded candidate set
  * is a subset) and is counted as a sanity check; `cos_drift` = rows
  * where both matched but the bounded pick's cosine is lower (a true
  * match ADC-ranked out of the top-c while a weaker one survived).
  *
  * Usage: `runMain graft.tools.SemTopcAccuracy <sfDir>`. Prints one
  * JSON line; results recorded in BASELINE.md.
  */
object SemTopcAccuracy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val c = args.lift(1).map(_.toInt)
      .getOrElse(graft.queries.SimOps.IncSemTopC)
    val m = args.lift(2).map(_.toInt).getOrElse(graft.queries.SimOps.IncSemSubspaces)
    val spark = graft.Graft.session()
    // Single-process tool on the persistent default warehouse: sweep
    // dead processes' layout directories once, up front (see
    // Storage.sweepOrphanWarehouseDirs — builders never sweep).
    graft.sources.Storage.sweepOrphanWarehouseDirs(spark)
    // Materialize each twin before constructing the next: a non-default
    // `m` builds a differently-parameterized scaled layout, and the
    // one-live-configuration sweep drops the other twin's tables at
    // CONSTRUCTION time (ensure runs eagerly in the builder).
    val tmp = java.nio.file.Files.createTempDirectory("graft_sem_acc").toString
    graft.queries.SimOps.c2IncrementalSemantic(spark, dir)
      .write.mode("overwrite").parquet(s"$tmp/full")
    graft.queries.SimOps
      .c2IncrementalSemanticTopc(spark, dir, topc = c, subspaces = m)
      .write.mode("overwrite").parquet(s"$tmp/topc")
    val full = spark.read.parquet(s"$tmp/full").alias("f")
    val topc = spark.read.parquet(s"$tmp/topc").alias("t")
    val r = full.join(topc, "vec_id").agg(
      count(lit(1)).as("n"),
      sum(when(col("f.is_novel") === col("t.is_novel") &&
        col("f.match_id") <=> col("t.match_id") &&
        col("f.match_cosine") <=> col("t.match_cosine"), 1L)
        .otherwise(0L)).as("identical"),
      sum(when(col("t.is_novel") && !col("f.is_novel"), 1L)
        .otherwise(0L)).as("false_novel"),
      sum(when(!col("t.is_novel") && col("f.is_novel"), 1L)
        .otherwise(0L)).as("extra_match"),
      sum(when(!col("t.is_novel") && !col("f.is_novel") &&
        col("t.match_cosine") < col("f.match_cosine"), 1L)
        .otherwise(0L)).as("cos_drift"),
      // where the drift lives: the strongest unbounded match the
      // bounded gate declared novel (null = no drift at all)
      max(when(col("t.is_novel") && !col("f.is_novel"),
        col("f.match_cosine"))).as("worst_missed_cosine")).head()
    val worst = if (r.isNullAt(5)) "null" else r.getDouble(5).toString
    println(s"""{"tool":"sem_topc_accuracy","dir":"$dir","topc":$c,""" +
      s""""n":${r.getLong(0)},""" +
      s""""identical":${r.getLong(1)},"false_novel":${r.getLong(2)},""" +
      s""""extra_match":${r.getLong(3)},"cos_drift":${r.getLong(4)},""" +
      s""""worst_missed_cosine":$worst}""")
    spark.stop()
  }
}
