package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join (Jaccard >= t) with **prefix filtering**
  * — the standard sub-quadratic exact algorithm (cf. Vernica/Carey/Li's
  * MapReduce set-similarity join and the PPJoin family; see PAPERS.md).
  *
  * Instead of indexing every token of every set (which degenerates to
  * ~all-pairs on high-overlap corpora), each set is sorted by ascending
  * global token frequency and only its first ⌊(1−t)·|s|⌋+1 tokens (the
  * rarest) are indexed: two sets with J(a,b) ≥ t MUST share at least one
  * prefix token, so joining on prefix tokens loses no pairs, while bucket
  * sizes shrink from "every doc containing the token" to "docs whose
  * prefix contains it".
  *
  * Why the guarantee holds: J(a,b) ≥ t ⇒ |a∩b| ≥ t·|a∪b| ≥ t·|a|. If a's
  * prefix (length |a| − ⌈t·|a|⌉ + 1) had no common token, all common
  * tokens would sit in the remaining ⌈t·|a|⌉ − 1 suffix positions —
  * fewer than t·|a| ≤ |a∩b|, a contradiction. (Symmetric for b; the join
  * requires a shared token in BOTH prefixes, which the same argument
  * delivers by picking the set whose prefix ends later in the global
  * order — the classic prefix-filter lemma.)
  *
  * Scale: one small global token-frequency aggregate (vocab-sized,
  * broadcast back), one narrow per-row re-sort of each token set, one
  * shuffle on prefix tokens with bucket sizes ~|docs with token t in
  * prefix|, then exact verification per candidate pair. No O(n²) stage.
  */
object SetSimJoin {

  /** All pairs `(a_id, b_id, common, jaccard)` with token-set Jaccard >=
    * `threshold`; `df` must carry (idCol, tokens array) semantics.
    */
  def jaccardSelfJoin(
      df: DataFrame,
      id: Column,
      tokens: Column,
      threshold: Double): DataFrame = {
    val base = df.select(id.as("doc_id"), tokens.as("toks"))

    // Global ascending token frequencies (vocab-sized — tiny relative to
    // the corpus; the join below is a broadcast).
    val freq = base
      .select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))

    // Per-set prefix: sort tokens by (freq, tok) ascending, keep the first
    // floor((1-t)|s|)+1. Done via explode + window rank — the sort key is
    // global, so rank is deterministic.
    val exploded = base
      .select(col("doc_id"), size(col("toks")).as("n"), explode(col("toks")).as("tok"))
      .join(broadcast(freq), "tok")
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("freq"), col("tok"))
    val prefixes = exploded
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= floor(lit(1.0 - threshold) * col("n")) + 1)
      .select(col("doc_id"), col("n"), col("tok"))

    // Candidate pairs: share >= 1 prefix token (deduped), then exact
    // verification via array_intersect on the full token sets.
    val a = prefixes.select(col("doc_id").as("a_id"), col("n").as("a_n"), col("tok"))
    val b = prefixes.select(col("doc_id").as("b_id"), col("n").as("b_n"), col("tok"))
    val candidates = a.join(b, Seq("tok"))
      .filter(col("a_id") < col("b_id"))
      // Length filter: J >= t needs t·|a| <= |b| (and vice versa).
      .filter(col("b_n") >= ceil(lit(threshold) * col("a_n")) &&
        col("a_n") >= ceil(lit(threshold) * col("b_n")))
      .select("a_id", "b_id").distinct()

    val sets = base.select(col("doc_id"), col("toks"))
    candidates
      .join(sets.select(col("doc_id").as("a_id"), col("toks").as("a_toks")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("toks").as("b_toks")), "b_id")
      .withColumn("common", size(array_intersect(col("a_toks"), col("b_toks"))))
      .withColumn("jaccard",
        col("common").cast("double") /
          (size(col("a_toks")) + size(col("b_toks")) - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("common"),
        round(col("jaccard"), 6).as("jaccard"))
  }
}
