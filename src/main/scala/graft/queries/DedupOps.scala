package graft.queries

import graft.Tables
import graft.dedup.{MinHash, SimHash}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group C (near-dup) — C2: n-gram Jaccard, MinHash+LSH, SimHash
  * (SURVEY.md §2.3; band/bucket pattern per the public V-SMART-Join /
  * MMDS ch.3 literature referenced in PAPERS.md).
  *
  * Scale design: the oracle-checked exact-Jaccard query joins documents on
  * shared tokens and is deliberately restricted to candidate pairs that
  * co-occur in at least one bucket — never an O(n²) cross join. The LSH
  * variants (`c2_minhash_lsh`, `c2_simhash`) are the 100 TB path: candidate
  * generation is a group-by on (band, signature-slice) / fingerprint, so
  * the shuffle volume is O(n · bands), not O(n²); exactness of the final
  * Jaccard on the candidates is verified in MinHashSpec against brute force.
  */
object DedupOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** C2a: exact token-set Jaccard for pairs above a threshold, via a
    * token-inverted-index join (each pair is generated once per shared
    * token, then de-duplicated by counting): standard set-similarity join.
    */
  def c2NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
    val exploded = base.select(col("doc_id"), col("n"), explode(col("toks")).as("tok"))
    val a = exploded.toDF("a_id", "a_n", "tok")
    val b = exploded.toDF("b_id", "b_n", "tok")
    a.join(b, Seq("tok"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_n"), col("b_n"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("a_n") + col("b_n") - col("common")).cast("double"))
      .filter(col("jaccard") >= 0.8)
      .select(col("a_id"), col("b_id"), col("common"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** C2b: MinHash + LSH banding — the sub-quadratic near-dup path.
    * Rows-only driver check; recall vs exact Jaccard asserted in MinHashSpec.
    */
  def c2MinHashLsh(spark: SparkSession, dir: String): DataFrame =
    MinHash.nearDuplicates(
      docs(spark, dir), col("doc_id"), col("text"),
      numHashes = 64, bands = 16, threshold = 0.5)
      .orderBy("a_id", "b_id")

  /** C2c: SimHash fingerprints + Hamming-bucket candidates. Rows-only. */
  def c2SimHash(spark: SparkSession, dir: String): DataFrame =
    SimHash.nearDuplicates(docs(spark, dir), col("doc_id"), col("text"), maxHamming = 8)
      .orderBy("a_id", "b_id")

  val oracle: Map[String, String] = Map(
    "c2_ngram_jaccard" ->
      ("WITH base AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks " +
        "FROM documents), " +
        "ex AS (SELECT doc_id, len(toks) AS n, unnest(toks) AS tok FROM base) " +
        "SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS common, " +
        "round(CAST(count(*) AS DOUBLE) / (a.n + b.n - count(*)), 6) AS jaccard " +
        "FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id " +
        "GROUP BY a.doc_id, b.doc_id, a.n, b.n " +
        "HAVING CAST(count(*) AS DOUBLE) / (a.n + b.n - count(*)) >= 0.8 " +
        "ORDER BY a_id, b_id")
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c2_ngram_jaccard" -> (c2NgramJaccard _),
    "c2_minhash_lsh" -> (c2MinHashLsh _),
    "c2_simhash" -> (c2SimHash _)
  )
}
