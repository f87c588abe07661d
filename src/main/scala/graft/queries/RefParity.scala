package graft.queries

import graft.Tables
import graft.mr.{JobTypeRegistry, MRJob}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group A — strict reference parity: the shipped word_count example
  * (char and word variants) run THROUGH the MRJob kernel, surfaced as
  * DataFrames for the DuckDB oracle.
  *
  * Reference: `/root/reference/example/word_count/word_count.cc` (the only
  * query the reference ships) over `documents.text` in place of the
  * Gutenberg fixtures.
  */
object RefParity {

  /** documents → (key = doc_id, value = text) KV input, the launch shape
    * of `gateway.cc:87-106`.
    */
  private def docsAsKv(spark: SparkSession, sfDir: String) = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select($"doc_id".cast("string"), $"text")
      .as[(String, String)]
  }

  /** Parse the kernel's "key\tcount" reduce output into typed columns. */
  private def parseCounts(spark: SparkSession, out: org.apache.spark.sql.Dataset[String],
                          keyName: String): DataFrame = {
    import spark.implicits._
    out.map { line =>
      val i = line.indexOf('\t')
      (line.substring(0, i), line.substring(i + 1).toLong)
    }.toDF(keyName, "cnt")
  }

  private val tabbedSum: MRJob.ReduceFn = (k, values) =>
    Iterator.single(s"$k\t${values.iterator.map(_.toLong).sum}")

  /** A1: word count over documents.text via the MR kernel. The sum reduce
    * is a declared commutative monoid, so the kernel map-side combines —
    * the shuffle carries one row per (word, partition), not per occurrence.
    */
  def mrWordCount(spark: SparkSession, sfDir: String): DataFrame = {
    val out = MRJob.run(spark, docsAsKv(spark, sfDir),
      JobTypeRegistry.wordCountMap, tabbedSum, mappers = 32, reducers = 32,
      combineFn = Some(JobTypeRegistry.sumCombine))
    parseCounts(spark, out, "word").orderBy("word")
  }

  /** A2: per-character count (exact word_count.cc:5-22 semantics:
    * lowercase letters + digits only). Without the combiner this shuffles
    * one row PER INPUT CHARACTER — the round-8 bench outlier; with it the
    * shuffle is ≤ 36 keys × partitions rows.
    */
  def mrCharCount(spark: SparkSession, sfDir: String): DataFrame = {
    val out = MRJob.run(spark, docsAsKv(spark, sfDir),
      JobTypeRegistry.charCountMap, tabbedSum, mappers = 32, reducers = 32,
      combineFn = Some(JobTypeRegistry.sumCombine))
    parseCounts(spark, out, "c").orderBy("c")
  }

  /** A3 surface check: DISTINCT spelled as a map/reduce job. */
  def mrDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val out = MRJob.run(spark, docsAsKv(spark, sfDir),
      JobTypeRegistry.wordCountMap, JobTypeRegistry.distinctReduce,
      mappers = 32, reducers = 32,
      combineFn = Some(JobTypeRegistry.anyCombine))
    out.toDF("word").orderBy("word")
  }

  val oracle: Map[String, String] = Map(
    "a1_mr_wordcount" ->
      ("SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS word FROM documents) " +
        "WHERE word <> '' GROUP BY word ORDER BY word"),
    "a2_mr_charcount" ->
      ("SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM " +
        "(SELECT unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), '')) AS c " +
        "FROM documents) WHERE c <> '' GROUP BY c ORDER BY c"),
    "a3_mr_distinct" ->
      ("SELECT DISTINCT word FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS word FROM documents) " +
        "WHERE word <> '' ORDER BY word")
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_mr_wordcount" -> (mrWordCount _),
    "a2_mr_charcount" -> (mrCharCount _),
    "a3_mr_distinct" -> (mrDistinct _)
  )
}
