package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group C (round 2) — C7: deterministic corpus sampling and dataset
  * splitting, the reproducibility primitives of a training-data pipeline
  * (language rebalancing, train/val/test carve-out).
  *
  * Everything keys off a Knuth multiplicative hash bucket
  * `(doc_id * 2654435761) mod 2^32` — pure 64-bit integer arithmetic that
  * evaluates identically in Spark and DuckDB, so unlike `rand(seed)` or
  * engine hash functions the sample is *portable*: the same rows are
  * selected by any engine, any partitioning, any row order. That is the
  * property a 100 TB pipeline needs (resume/backfill reproduces the same
  * split without a stored assignment table), and it makes these fully
  * oracle-checkable. The bucket is rendered in the OVERFLOW-SAFE split
  * form ([[knuthBucketSql]]) so the guarantee holds over the FULL int64
  * id range, not just below ~3.47e9.
  *
  * Scale posture: both operators are pure narrow projections/filters —
  * no shuffle at all before the (tiny) final aggregate/sort.
  */
object PipelineOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** The shared bucket, rendered OVERFLOW-SAFE over the full int64 id
    * range: equals the exact mathematical `(id · 2654435761) mod 2^32`
    * for EVERY bigint id (sign-safe reduce into [0,2^32), then the
    * multiply split at 2^16 — each partial product < 2^16·m ≈ 1.7e14 ≪
    * 2^63). The naive `(id * m) % 2^32` overflows int64 once
    * id ≳ 3.47e9 — ANSI Spark (the 4.x default) fails the whole job,
    * non-ANSI Spark wraps silently, DuckDB raises: at exactly the id
    * scale a 100 TB corpus reaches, the pipeline either dies or
    * diverges from its oracle (KnuthBucketSpec pins all three arms).
    * For in-range ids the split form is bit-identical to the
    * naive one, so every existing selection/hash is unchanged; integer
    * division spells `div` in Spark and `//` in DuckDB, hence the
    * `idiv` parameter (the only difference between the engine and
    * oracle renderings — [[bucketSql]] vs [[bucketSqlDuck]]).
    * Uniform in [0, 2^32) and decorrelated from the id's natural order.
    */
  private[queries] def knuthBucketSql(id: String, idiv: String): String = {
    val r = s"((($id) % 4294967296) + 4294967296) % 4294967296"
    s"((((($r) $idiv 65536) * 2654435761) % 65536) * 65536 " +
      s"+ (($r) % 65536) * 2654435761) % 4294967296"
  }

  private val bucketSql = knuthBucketSql("doc_id", "div")
  private val bucketSqlDuck = knuthBucketSql("doc_id", "//")

  /** Column rendering of [[knuthBucketSql]] — the identical sign-safe
    * reduce + 16/16 split-multiply arithmetic as Column expressions
    * (shiftright == div-by-2^16 on the already-non-negative reduced
    * value). Every in-repo Knuth bucket routes through this or the SQL
    * renderings, so the overflow-safe form is universal — no raw
    * `id * 2654435761` multiplication anywhere outside the bounded
    * hash-family coefficients.
    */
  private[graft] def knuthBucketCol(id: Column): Column = {
    val r = pmod(id, lit(4294967296L))
    pmod(pmod(shiftright(r, 16) * lit(2654435761L), lit(65536L)) *
      lit(65536L) + pmod(r, lit(65536L)) * lit(2654435761L),
      lit(4294967296L))
  }

  /** C7a: stratified (per-language) deterministic sampling — downsample
    * dominant languages harder (en keeps 10%, others 40%): the language-
    * rebalancing shape. Emits the surviving rows.
    */
  def c7SampleStrat(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("bucket", expr(bucketSql))
      .withColumn("keep_below",
        when(col("lang") === "en", lit((0.10 * 4294967296L).toLong))
          .otherwise(lit((0.40 * 4294967296L).toLong)))
      .filter(col("bucket") < col("keep_below"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")

  /** C7b: train/val/test split assignment (80/10/10 on the same portable
    * bucket) with per-split corpus stats — the carve-out must be disjoint
    * and exhaustive by construction.
    */
  def c7SplitAssign(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("bucket", expr(bucketSql))
      .withColumn("split",
        when(col("bucket") < (0.8 * 4294967296L).toLong, "train")
          .when(col("bucket") < (0.9 * 4294967296L).toLong, "val")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("split")

  /** C7v: LEAKAGE-SAFE split assignment — the split key is the
    * duplicate-CLUSTER representative (MinHash-CC transitive closure,
    * the c2_minhash_cc labels), not the doc id, so every member of a
    * near-duplicate cluster lands in the SAME split by construction.
    * The contamination control a per-doc hash split ([[c7SplitAssign]])
    * cannot give: with per-doc hashing, ~20% of each near-dup cluster's
    * members leak across the train/test boundary — memorization measured
    * as generalization. Same portable Knuth bucket, applied to
    * cluster_rep; the assignment stays a pure function of content
    * (resume/backfill reproduce it with no stored table).
    *
    * Scale posture: the CC assignment is the proven O(n·bands) banding +
    * min-propagation path (no pair materialization); the split itself is
    * a narrow projection over the O(n) assignment output. The bucket is
    * the shared overflow-safe form ([[knuthBucketSql]]) — exact over the
    * full int64 rep range.
    */
  def c7SplitClusterSafe(spark: SparkSession, dir: String): DataFrame = {
    import graft.dedup.MinHash
    val asg = MinHash.dedupAssignmentsCC(
      docs(spark, dir), col("doc_id"), col("text"), numHashes = 64, bands = 16)
    asg.select(col("doc_id"), col("cluster_rep"))
      // The shared overflow-safe Knuth bucket ([[knuthBucketSql]])
      // applied to the cluster rep instead of the doc id.
      .withColumn("bucket", expr(knuthBucketSql("cluster_rep", "div")))
      .withColumn("split",
        when(col("bucket") < (0.8 * 4294967296L).toLong, "train")
          .when(col("bucket") < (0.9 * 4294967296L).toLong, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("cluster_rep"), col("split"))
      .orderBy("doc_id")
  }

  /** C7j: temperature-based source mixing — the standard "data mixture"
    * operator of a multi-corpus training pipeline: allocate a total doc
    * budget across sources with exponent-α smoothing (quota ∝ n_s^α,
    * α = 0.5 — the exponentiated-weighting family used by the public
    * multilingual-pretraining literature to upweight small sources), cap
    * each rate at 1, and select deterministically via the portable Knuth
    * bucket so the SAME docs are picked by any engine / partitioning /
    * run (resume and backfill reproduce the mixture without a stored
    * assignment table).
    *
    * Float discipline (both engines must agree bit-for-bit): sqrt is
    * IEEE-correctly-rounded in both, rounded to 6dp, and SUMMED AS
    * DECIMAL — a double fold over sources would be partial-aggregation-
    * order dependent and could flip the floor() quotas between engines;
    * the decimal sum is exact, and the remaining arithmetic is a fixed
    * left-to-right double expression evaluated identically by both.
    *
    * Scale: two passes over documents (counts, then the filtered
    * selection — inherent: rates depend on global counts), both pure
    * narrow scans into tiny per-source aggregates; the quota table is
    * O(sources) and broadcast. No window touches corpus rows (the
    * normalizing total is a window over the per-source aggregate only).
    * Output: per-source allocation audit (quota vs achieved) plus an
    * exact selection fingerprint (sum of kept doc_ids), so the oracle
    * hash pins WHICH docs were chosen, not just how many.
    */
  def c7MixSources(spark: SparkSession, dir: String, budget: Long = 300L): DataFrame =
    mixSources(docs(spark, dir), budget)

  /** [[c7MixSources]] over an explicit (doc_id, source) frame — the
    * testable core (the sf fixtures have uniformly-sized sources, so the
    * upweighting behavior needs a skewed synthetic corpus to show).
    */
  private[queries] def mixSources(d: DataFrame, budget: Long): DataFrame = {
    val counts = d.groupBy("source").agg(count(lit(1)).as("n_avail"))
      .withColumn("sq", expr("CAST(round(sqrt(n_avail), 6) AS DECIMAL(18,6))"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val quotas = counts
      .withColumn("tot", sum(col("sq")).over(w))
      .withColumn("quota", expr(
        s"CAST(floor($budget * CAST(sq AS DOUBLE) / CAST(tot AS DOUBLE)) AS BIGINT)"))
      .withColumn("keep_below", expr(
        "CAST(floor(4294967296 * least(1.0, CAST(quota AS DOUBLE) / n_avail)) AS BIGINT)"))
      .select("source", "n_avail", "quota", "keep_below")
    val kept = d.join(broadcast(quotas), "source")
      .filter(expr(bucketSql) < col("keep_below"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_idsum"))
    quotas.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_avail"), col("quota"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_idsum"), lit(0L)).as("kept_idsum"))
      .orderBy("source")
  }

  /** Scale-safe per-language running sum of `valueCol` in ascending
    * `doc_id` order, emitted as `cumName`. A plain
    * `Window.partitionBy(lang)` would ship EVERY row of a language
    * through one task — a language is not a bounded partition (English
    * is half of a real corpus), and window exchanges get no map-side
    * combine and no AQE skew split. Instead, the two-phase zip-with-index
    * construction proven in [[graft.dedup.SetSimJoin]]: range-partition
    * by (lang, doc_id) so partitions are size-bounded, compute one
    * (partition, lang) token subtotal per partition-run (a partial
    * aggregate; O(partitions + languages) rows to the driver), turn the
    * subtotals into per-(pid, lang) prefix offsets, broadcast the tiny
    * offset table back, and add a running sum windowed by (pid, lang) —
    * bounded by the range partitioner, never by language mass.
    *
    * The `ranged` frame is CHECKPOINTED (not merely persisted) because
    * its pids must be identical between the offset action and the final
    * pass: with a plain persist, an executor loss would silently
    * recompute the frame — repartitionByRange resamples its bounds, the
    * pids shift, and the broadcast offsets would corrupt every cum sum
    * downstream. localCheckpoint truncates the lineage, so a lost block
    * FAILS the job loudly instead (on a real cluster, set a durable
    * `spark.sparkContext.setCheckpointDir` and swap in `checkpoint()` —
    * the [[graft.dedup.ConnectedComponents.starRoots]] posture — to
    * survive executor loss too). Bench/Verify clear the cache between
    * queries; checkpoint blocks are reclaimed when the RDD is GC'd.
    */
  private[queries] def withRunningSum(df: DataFrame, valueCol: String,
      cumName: String, keyCol: String = "lang",
      orderCols: Seq[String] = Seq("doc_id")): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val rangeCols = (keyCol +: orderCols).map(col)
    val ranged = df
      .repartitionByRange(rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    val partSums = ranged.groupBy("pid", keyCol)
      .agg(sum(col(valueCol)).as("psum"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets = partSums.groupBy(_._2).toSeq.flatMap { case (key, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.map(_._1).zip(sorted.map(_._3).scanLeft(0L)(_ + _))
        .map { case (pid, off) => (pid, key, off) }
    }
    val session = df.sparkSession
    import session.implicits._
    val offsetDf = offsets.toDF("pid", keyCol, "offset")
    val wPart = w.partitionBy(col("pid"), col(keyCol))
      .orderBy(orderCols.map(col): _*)
    ranged
      .join(broadcast(offsetDf), Seq("pid", keyCol))
      .withColumn(cumName, col("offset") + sum(col(valueCol)).over(wPart))
      .drop("pid", "offset")
  }

  /** C7c: token-budget selection — greedily take documents (in stable
    * doc_id order) per language until a per-language token budget is
    * filled: the "assemble a training mix to N tokens per language"
    * operator. The running sum is the two-phase bounded-partition
    * construction (see [[withRunningSum]]), so the selection is
    * deterministic, resumable, and never serializes a whole language
    * through one task.
    */
  def c7TokenBudget(spark: SparkSession, dir: String, budget: Long = 5000L): DataFrame = {
    val base = docs(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .select(col("lang"), col("doc_id"), col("n_tokens"))
    withRunningSum(base, "n_tokens", "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .orderBy("lang", "doc_id")
  }

  /** C7b': [[c7TokenBudget]] priced in BPE TOKENS — the budget unit a
    * real pipeline allocates in (compute cost is tokenizer tokens, not
    * whitespace words): per-doc counts come from the trained tokenizer
    * ([[TextOps.bpeTrain]]'s final vocab, priced once per word TYPE and
    * joined — the c4_bpe_encode shape), then the same per-lang greedy
    * prefix selection through the two-phase bounded-partition running
    * sum. Budget default 20000 ≈ the whitespace query's 5000-word
    * budget at the corpus's ~4 BPE tokens/word.
    */
  def c7TokenBudgetBpe(spark: SparkSession, dir: String,
      budget: Long = 20000L, rounds: Int = TextOps.BpeRounds,
      cap: Int = TextOps.BpeBatchCap): DataFrame = {
    val enc = spark.table(TextOps.ensureBpeVocab(spark, dir, rounds, cap))
    val perDoc = docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(enc.select("word", "n_bpe"), "word")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_bpe")).cast("long").as("n_bpe_tokens"))
    val base = docs(spark, dir).select(col("doc_id"), col("lang"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("lang"), col("doc_id"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
    withRunningSum(base, "n_bpe_tokens", "cum_bpe")
      .filter(col("cum_bpe") <= budget)
      .select(col("lang"), col("doc_id"), col("n_bpe_tokens"), col("cum_bpe"))
      .orderBy("lang", "doc_id")
  }

  /** C7d'': SUBSTRING-level decontamination — the published
    * "contiguous ≥L-token overlap" rule (the form the k-gram report
    * approximates): a training document is contaminated when it shares
    * a MAXIMAL repeated span of ≥16 tokens with any held-out test
    * document, at ANY offset. Reuses [[TextOps.substringSpans]] (the
    * Lee et al. machinery) filtered to pairs straddling the portable
    * train/test split; per contaminated train doc: span count, the
    * longest shared span, total shared-span tokens, and the worst
    * (longest-span, smallest-id) test doc as evidence.
    *
    * Scale: the span analysis's linear occurrence-capped cost (see
    * c4_substring_dup) plus one partial aggregate keyed by the train
    * doc — the cross-split filter is a narrow predicate on the span
    * stream, never a second corpus pass.
    */
  def c7DecontaminateSpan(spark: SparkSession, dir: String,
      window: Int = 16, maxOcc: Int = 16): DataFrame = {
    val lo = (0.8 * 4294967296L).toLong
    val hi = (0.9 * 4294967296L).toLong
    // Overflow-safe Knuth bucket over the FULL int64 doc-id range — the
    // 16/16 split mulmod of [[c7SplitClusterSafe]]: a naive id·m
    // overflows int64 past ~3.47e9 (Spark wraps silently, DuckDB raises
    // BIGINT overflow, so engine and oracle would diverge exactly at the
    // 100 TB id scale this operator targets). Reduce sign-safe into
    // [0,2^32), split the multiply at 2^16 (each partial product
    // < 2^16·m ≈ 1.7e14 ≪ 2^63); bit-identical to the naive form for
    // in-range ids.
    def bucket(c: Column): Column = knuthBucketCol(c)
    val spans = TextOps.substringSpans(spark, dir, window, maxOcc)
      .withColumn("a_train", bucket(col("doc_a")) < lo)
      .withColumn("a_test", bucket(col("doc_a")) >= hi)
      .withColumn("b_train", bucket(col("doc_b")) < lo)
      .withColumn("b_test", bucket(col("doc_b")) >= hi)
      .filter((col("a_train") && col("b_test")) ||
        (col("a_test") && col("b_train")))
      .select(
        when(col("a_train"), col("doc_a")).otherwise(col("doc_b"))
          .as("doc_id"),
        when(col("a_train"), col("doc_b")).otherwise(col("doc_a"))
          .as("test_doc"),
        col("span_len"))
    spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        max(col("span_len")).as("max_span_len"),
        sum(col("span_len")).cast("long").as("sum_span_len"),
        max(struct(col("span_len"), (-col("test_doc")).as("negid"))).as("b"))
      .select(col("doc_id"), col("n_spans"), col("max_span_len"),
        col("sum_span_len"), (-col("b.negid")).as("worst_test_doc"))
      .orderBy("doc_id")
  }

  /** C7d: train/test decontamination — flag training documents sharing
    * any word k-gram with the held-out test split (the standard n-gram
    * benchmark-decontamination pass). Both splits come from the same
    * portable bucket as c7_split_assign, so the operator composes with
    * the split it protects. Shape: narrow shingling on both sides, one
    * shuffle join KEYED BY xxhash64 OF THE SHINGLE — the shuffle moves
    * 8-byte hashes, not full k-gram strings (~40 bytes each), which at
    * 100 TB is the difference between shuffling the corpus text again
    * and shuffling a fifth of it — tiny aggregate out.
    *
    * Collision note: two different shingles colliding on the 64-bit hash
    * ACROSS the train/test boundary would add a spurious hit (and the
    * per-doc distinct count collapses colliding shingles). The
    * probability is ~n_train·n_test/2^64 per doc — ~1e-11 at sf0.01 and
    * still <1e-3 for a billion-shingle test split — and a false "contains
    * benchmark text" flag only ever REMOVES a training doc, so the
    * decontamination guarantee (no test contamination survives) is
    * unconditional; the string-exact DuckDB oracle holds whenever no
    * collision occurs.
    */
  /** Train-side `(doc_id, h)` hashed-shingle rows and the distinct
    * held-out test shingle hashes — shared by the exact and
    * bloom-prefiltered decontamination variants. Hashing happens BEFORE
    * the exchange on both sides, so nothing shingle-string-sized ever
    * shuffles.
    */
  /** `(doc_id, split-bucket, xxhash64(shingle))` rows — the hashed
    * word-k-gram stream every decontamination/contamination variant is
    * built on. Hashing happens in the narrow scan, before any exchange.
    */
  private def hashedShingleBase(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val toks = split(col("text"), " ")
    val shingles = when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array().cast("array<string>"))
    docs(spark, dir)
      .withColumn("bucket", expr(bucketSql))
      .select(col("doc_id"), col("bucket"), explode(shingles).as("sh"))
      .select(col("doc_id"), col("bucket"), xxhash64(col("sh")).as("h"))
  }

  private def shingleSides(spark: SparkSession, dir: String, k: Int): (DataFrame, DataFrame) = {
    val base = hashedShingleBase(spark, dir, k)
    val train = base.filter(col("bucket") < (0.8 * 4294967296L).toLong)
      .select(col("doc_id"), col("h"))
    val test = base.filter(col("bucket") >= (0.9 * 4294967296L).toLong)
      .select(col("h")).distinct()
    (train, test)
  }

  private def decontamTail(hits: DataFrame): DataFrame =
    hits.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("h")).as("n_shingles_hit"))
      .orderBy("doc_id")

  /** The exact decontamination flag list. Since round 19 this runs the
    * SAME bloom-prefiltered physical strategy as [[c7DecontaminateBloom]]
    * (guide §3.2): the test side is a DISTINCT hash set, so the confirm
    * join is semantically a semi-join filter with multiplicity 1 — a
    * bloom prefilter on the train side drops definitely-non-matching
    * shingles BEFORE the exchange and has no false negatives, so the
    * output is bit-identical for ANY bloom sizing and the oracle SQL is
    * unchanged. Measured (r18 driver): 12.9 s exact-shuffle vs 2.1 s for
    * the bloom twin at sf0.1 — the exact variant shuffled every train
    * shingle only to discard >90% of them at the join.
    */
  def c7Decontaminate(spark: SparkSession, dir: String, k: Int = 4): DataFrame =
    c7DecontaminateBloom(spark, dir, k)

  /** C7g: bloom-prefiltered decontamination — the 100 TB posture for
    * c7_decontaminate. The exact variant shuffles EVERY train shingle
    * into the join; here a bloom filter built over the (benchmark-sized)
    * test shingles — one bounded aggregate, OR-merged so the bits are
    * arrival-order-independent — is embedded as a ~1 MB binary literal
    * and filters train shingles with the codegen'd `might_contain`
    * BEFORE the shuffle: only might-contain rows (true matches + the
    * bloom's false-positive sliver) reach the exact confirm join. Bloom
    * filters have no false negatives, so the output is bit-identical to
    * c7_decontaminate for ANY bloom parameters — the oracle is literally
    * the same SQL. This is the runtime-filter / semi-join-reduction
    * pattern lifted to an explicit operator (Spark's own injection can't
    * see through the distinct-aggregate build side here).
    */
  /** Bloom binary over the distinct test shingles, sized for
    * `expectedItems` (Spark's default FPP target, 3%). Accepts any frame
    * with a string `sh` column OR pre-hashed long `h` column — keys are
    * always the xxhash64 values, matching the join key. Factored out so
    * the sizing behavior is testable without the full operator.
    */
  private[queries] def testShingleBloom(test: DataFrame, expectedItems: Long): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge
    val key =
      if (test.columns.contains("h")) col("h") else xxhash64(col("sh"))
    test.select(ColumnBridge.column(
        new BloomFilterAggregate(
          ColumnBridge.expression(key),
          math.max(expectedItems, 1L))
          .toAggregateExpression()))
      .head().getAs[Array[Byte]](0)
  }

  def c7DecontaminateBloom(spark: SparkSession, dir: String, k: Int = 4,
      expectedTestShingles: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.ColumnBridge
    val (train, test0) = shingleSides(spark, dir, k)
    // The test side feeds three consumers (count, bloom build, exact
    // confirm join). The first two are construction-time actions — hence
    // the explicit persist BEFORE them; CacheScope releases the cache
    // after the returned frame's confirm join materializes.
    val test = test0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Size the bloom from the data, not a constant: with a hardcoded
    // expectation, a test split much larger than it degrades the FPP
    // toward 1 and the prefilter silently stops pruning at exactly the
    // scale it was built for. The count is one cheap aggregate over the
    // (benchmark-sized) held-out side — and the result is unchanged for
    // ANY sizing (no false negatives + exact confirm).
    val expected = expectedTestShingles.getOrElse(test.count())
    val bloomBin = testShingleBloom(test, expected)
    // Observability: the sketch's own achieved-FPP estimate under the
    // actual load, so the prefilter's selectivity is visible in logs.
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBin))
    System.err.println(
      f"[graft] c7_decontaminate_bloom: test_shingles=$expected%d " +
        f"bloom_bits=${bf.bitSize()}%d expected_fpp=${bf.expectedFpp()}%.4f")
    // The train side already carries the 64-bit hash the join is keyed
    // by — might_contain probes it directly (no re-hash) BEFORE the
    // exchange, so only might-contain hashes reach the shuffle.
    val prefiltered = train.filter(ColumnBridge.column(
      BloomFilterMightContain(
        Literal.create(bloomBin, org.apache.spark.sql.types.BinaryType),
        ColumnBridge.expression(col("h")))))
    graft.util.CacheScope.releaseAfterMaterialize(
      decontamTail(prefiltered.join(test, "h")), Seq(test))
  }

  /** C7q: per-test-doc CONTAMINATION report — the mirror of
    * c7_decontaminate: instead of flagging train docs to drop, measure
    * for every HELD-OUT doc what fraction of its distinct word k-grams
    * already leak into the train split (the "dirty benchmark" statistic
    * the GPT-3/Gopher appendices report per eval set). A doc is flagged
    * `dirty` when ≥10% of its shingles are leaked — the comparison is
    * pure integer cross-multiplication (`n_hit·10 ≥ n_shingles`), so no
    * float threshold can flip the hash.
    *
    * Scale shape: the train side is reduced FIRST by a semi join against
    * the (benchmark-sized) distinct test-shingle hash set — only train
    * shingles that can possibly matter survive to the distinct — so the
    * big side never builds a corpus-wide distinct. Every exchange moves
    * 8-byte hashes (same collision note as c7_decontaminate).
    */
  def c7Contamination(spark: SparkSession, dir: String, k: Int = 4): DataFrame = {
    // Persisted: both split filters scan the same hashed-shingle pass.
    val base = hashedShingleBase(spark, dir, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val te = base.filter(col("bucket") >= (0.9 * 4294967296L).toLong)
      .select(col("doc_id"), col("h")).distinct()
    val teH = te.select("h").distinct()
    // Train-side hashes restricted to the test vocabulary before the
    // distinct: the set of test shingles that occur anywhere in train.
    val leaked = base.filter(col("bucket") < (0.8 * 4294967296L).toLong)
      .select("h").join(teH, "h").distinct()
    graft.util.CacheScope.releaseAfterMaterialize(
      te.join(leaked.withColumn("hit", lit(1)), Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hit"))
        .withColumn("dirty", col("n_hit") * 10 >= col("n_shingles"))
        .orderBy("doc_id"),
      Seq(base))
  }

  /** C7r: FUZZY decontamination — near-duplicate leakage the exact
    * k-gram join can't see: a train doc that is a lightly-edited copy of
    * a held-out doc shares high Jaccard but possibly not one exact
    * 4-gram. Reuses the incremental-dedup machinery wholesale
    * (DedupOps.IncBands MinHash banding on both splits, band-bucket
    * candidate join, exact-Jaccard confirm on candidates only): every
    * train doc resolves to `contaminated` with its best-matching test
    * doc (highest Jaccard, smallest id on ties) or clean. Same posture
    * as c2_incremental_dedup — train is "the batch", the held-out split
    * is "the corpus" — so the 100 TB shape is already proven: O(doc)
    * signatures, shuffle on 8-byte band buckets, Ω(candidates) confirm.
    */
  def c7DecontaminateFuzzy(spark: SparkSession, dir: String,
      threshold: Double = 0.8): DataFrame =
    fuzzyDecontam(spark, dir, threshold, topC = None)

  /** C7r': [[c7DecontaminateFuzzy]] with the BOUNDED confirm — the
    * duplicate-saturated-corpus scale path, exactly the
    * c2_incremental_dedup_topc posture: measured at the derived sf1,
    * the full variant's exact confirm went 5.1 → 111 s for 10× docs
    * (candidate-pair growth on a high-baseline-similarity corpus —
    * Ω(candidates) is inherent to the exact confirm). Both super-linear
    * stages are bounded: candidate GENERATION by per-band-bucket caps
    * on BOTH sides (DedupOps.IncBucketCap smallest ids per bucket,
    * drops logged loudly — O(buckets·cap²) pairs at any duplication
    * density; round 13's per-stage counters showed the test-side-only
    * form still grew 13.6× per dense decade because uncapped train
    * occupancy multiplies the cap), and the confirm by the
    * per-train-doc top-`c` rerank on LSH band-agreement count
    * (deterministic (agreement desc, c_id asc) order through the
    * bounded-heap TopKAggregator) — O(train · c) exact Jaccards.
    * Bucket caps and agreement rank are replayed verbatim by the
    * oracle, so the approximation itself is hash-checked.
    */
  def c7DecontaminateFuzzyTopC(spark: SparkSession, dir: String,
      threshold: Double = 0.8, c: Int = 64): DataFrame =
    fuzzyDecontam(spark, dir, threshold, topC = Some(c))

  private def fuzzyDecontam(spark: SparkSession, dir: String,
      threshold: Double, topC: Option[Int]): DataFrame = {
    import graft.dedup.MinHash
    val d = docs(spark, dir).withColumn("sb", expr(bucketSql))
    def toksOf(side: Column) = d.filter(side)
      .select(col("doc_id"), MinHash.tokenSet(col("text")).as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Persisted: each side feeds its banding pass AND the confirm join.
    val trainToks = toksOf(col("sb") < (0.8 * 4294967296L).toLong)
    val testToks = toksOf(col("sb") >= (0.9 * 4294967296L).toLong)
    def memOf(toks: DataFrame) = MinHash.membershipsFromSets(
      toks, col("doc_id"), col("toks"), DedupOps.IncHashes, DedupOps.IncBands)
    val cand = topC match {
      case None =>
        memOf(trainToks).withColumnRenamed("doc_id", "n_id")
          .join(memOf(testToks).withColumnRenamed("doc_id", "c_id"),
            Seq("band", "bucket"))
          .select("n_id", "c_id").distinct()
      case Some(c) =>
        // Bounded candidate GENERATION first (the DedupOps.IncBucketCap
        // contract: the held-out side keeps its cap smallest ids per
        // band bucket, drops logged loudly), then band-agreement count
        // per surviving pair and the bounded-heap top-c rerank per
        // train doc.
        val testCapped = DedupOps.capBuckets(
          memOf(testToks), DedupOps.IncBucketCap,
          "graft_fuzzy_decontam_bucket_cap")
        // BOTH sides of the candidate join are bucket-capped. The r13
        // per-stage counters caught the test-side-only form's growing
        // stage red-handed: on the dense sf10 decade, agree pairs grew
        // 13.6× per 10× docs (Σ_buckets train_members · cap — the
        // uncapped train occupancy multiplies the cap), while every
        // capped stage grew ≤6×. With the train side capped too, the
        // candidate stage is O(buckets · cap²) — bounded per bucket at
        // any duplication density; a train doc capped out of one
        // oversized bucket keeps its 15 other bands, the same recall
        // argument as the test-side cap. The oracle replays both caps.
        val trainCapped = DedupOps.capBuckets(
          memOf(trainToks), DedupOps.IncBucketCap,
          "graft_fuzzy_decontam_train_cap")
        // Per-stage observed counters (r12 verdict #4): pairs surviving
        // the bucket caps (candidate generation) and pairs surviving the
        // top-c rerank — with the caps' own drop counters and the
        // confirm counter in resolveBatch, every stage of a scale
        // decade is named from one run's stderr.
        val agree = trainCapped.withColumnRenamed("doc_id", "n_id")
          .join(testCapped.withColumnRenamed("doc_id", "c_id"),
            Seq("band", "bucket"))
          .groupBy("n_id", "c_id")
          .agg(count(lit(1)).as("bandsc"))
          .observe("graft_fuzzy_decontam_agree",
            count(lit(1)).as("agree_pairs"))
        val session = spark
        import session.implicits._
        val topk = new graft.functions.TopKAggregator[(Double, Long)](
          c, _._1, _._2).toColumn.name("topc")
        agree
          .select(col("n_id"), col("bandsc").cast("double"), col("c_id"))
          .as[(Long, Double, Long)]
          .groupByKey(_._1)
          .mapValues(r => (r._2, r._3))
          .agg(topk)
          .toDF("n_id", "topc")
          .select(col("n_id"), explode(col("topc")).as("p"))
          .select(col("n_id"), col("p._2").as("c_id"))
          .observe("graft_fuzzy_decontam_topc",
            count(lit(1)).as("reranked_pairs"))
    }
    graft.util.CacheScope.releaseAfterMaterialize(
      DedupOps.resolveBatch(cand, trainToks, testToks, threshold,
        confirmMetric =
          if (topC.isDefined) Some("graft_fuzzy_decontam_confirmed") else None)
        .select(col("doc_id"), (!col("is_novel")).as("contaminated"),
          col("match_id").as("test_match_id"), col("match_jaccard")),
      Seq(trainToks, testToks))
  }

  /** C7w: cross-source duplication forensics — for each unordered pair
    * of sources, how many near-dup clusters (the c2_minhash_lsh
    * one-round assignment) contain documents from BOTH: the overlap
    * matrix a pipeline consults before mixing sources (two crawls of
    * the same sites double-count; a benchmark mirrored inside a crawl
    * is leakage). O(n) cluster assignments → distinct (cluster, source)
    * → a self-join keyed by cluster whose output is bounded by
    * clusters·sources² — never a doc-level pair expansion, so
    * duplication density cannot blow it up.
    */
  def c7SourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    import graft.dedup.MinHash
    val d = docs(spark, dir)
    val cs = MinHash.dedupAssignments(
      d, col("doc_id"), col("text"), numHashes = 64, bands = 16)
      .join(d.select(col("doc_id"), col("source")), "doc_id")
      .select(col("cluster_rep"), col("source")).distinct()
    cs.toDF("rep", "source_a")
      .join(cs.toDF("rep", "source_b"), "rep")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy("source_a", "source_b")
  }

  /** C7e: end-to-end corpus curation — the composition a training
    * pipeline actually ships: exact-dedup first-copy flag, language
    * agreement (LangId.detect vs the declared lang), and a minimum-length
    * gate, combined into one per-doc keep decision. The first-copy min is
    * a partial (map-side combining) aggregate on the content shuffle-
    * joined back — NOT a window over text: a corpus with a million copies
    * of one boilerplate string would funnel them all into a single window
    * task (no partial agg, no AQE skew split), whereas the groupBy
    * collapses each text map-side and AQE skew-join handles the probe.
    * Fully oracle-checked — dedup, lang-id scoring, argmax tie-break and
    * the final conjunction are all replayed in SQL.
    */
  def c7Curate(spark: SparkSession, dir: String, minTokens: Int = 40): DataFrame = {
    val base = docs(spark, dir)
    val firstIds = base.groupBy(col("text"))
      .agg(min(col("doc_id")).as("first_id"))
    // Left join: a null text equi-joins nothing, and null text can't be a
    // duplicate of anything — such rows keep first_copy = true rather
    // than silently dropping out of the corpus (the oracle spells out the
    // same null rule).
    graft.text.LangId.detect(base, col("text"))
      .join(firstIds, Seq("text"), "left")
      .withColumn("first_copy",
        col("first_id").isNull || col("doc_id") === col("first_id"))
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("keep",
        col("first_copy") && col("detected_lang") === col("lang") &&
          col("n_tokens") >= minTokens)
      .select(col("doc_id"), col("lang"), col("detected_lang"),
        col("first_copy"), col("keep"))
      .orderBy("doc_id")
  }

  /** C7f: causal-LM sequence packing — concatenate documents in stable
    * order and chunk the token stream into fixed-length training
    * sequences (docs split across boundaries, the standard GPT-style
    * packing). Emits, per doc, the first/last sequence index it lands in
    * and how many sequences it spans — the assignment a tokenizer shard
    * needs to materialize packed examples. Pure integer arithmetic off
    * the running token sum, so any engine reproduces the same packing
    * bit-for-bit (resume/backfill-safe, like the other C7 operators).
    * Packing is per-language (the mix is assembled per source stream);
    * the running sum is the two-phase bounded-partition construction
    * (see [[withRunningSum]]) — no global-order scan, and no
    * one-task-per-language window either.
    */
  def c7PackSequences(spark: SparkSession, dir: String, seqLen: Long = 2048L): DataFrame = {
    val base = docs(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .select(col("lang"), col("doc_id"), col("n_tokens"))
    withRunningSum(base, "n_tokens", "cum")
      .select(col("lang"), col("doc_id"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $seqLen").as("first_seq"),
        expr(s"(cum - 1) div $seqLen").as("last_seq"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1L)
      .orderBy("lang", "doc_id")
  }

  /** C7h: the END-TO-END curation pipeline a training run actually
    * ships, composed from the engine's own operators in ONE declarative
    * plan: MinHash-LSH near-dup first-copy selection (not just exact
    * dedup — the [[graft.dedup.MinHash.dedupAssignments]] one-round
    * assignment), language agreement (LangId), a minimum-length gate,
    * the portable 80% train carve-out, and GPT-style sequence packing
    * of the surviving train docs (the [[withRunningSum]] two-phase
    * prefix sum). Catalyst sees the whole composition: the corpus scans
    * fuse, filters push, and each stage keeps its individually-pinned
    * scale posture (bucket-min partial agg, bounded-partition prefix
    * sum). Fully oracle-checked — every stage already has a bit-exact
    * SQL replay (mhChainSql, langIdCtes, bucketSql, the pack window),
    * so the COMPOSITION is hash-verified end-to-end, which is the real
    * statement: a user chains these operators and the result is still
    * engine-independent.
    */
  /** The pipeline's shared doc-level prologue — first-copy MinHash
    * dedup, langid agreement, length floor, train-split carve-out —
    * returning survivors WITH text (the span stage needs it).
    * (minTokens = 10, not c7_curate's 40: the pipeline's length gate is
    * a floor against fragments, and the corpus's first-copy survivors
    * skew short — 40 would leave a near-empty train set at sf0.01.)
    */
  private[queries] def pipelineKept(spark: SparkSession, dir: String,
      minTokens: Int): DataFrame = {
    val base = docs(spark, dir)
    // 4 bands × 16 rows ⇒ collision threshold ≈ (1/4)^(1/16) ≈ 0.92
    // Jaccard: curation dedup merges only true near-duplicates — the
    // 16×4 banding of c2_minhash_lsh (threshold ≈ 0.5) would collapse
    // most of a self-similar corpus into a handful of survivors, which
    // is recall tuning, not a different operator.
    val firstCopy = graft.dedup.MinHash
      .dedupAssignments(base, col("doc_id"), col("text"), numHashes = 64, bands = 4)
      .select(col("doc_id"), col("is_kept").as("first_copy"))
    graft.text.LangId.detect(base, col("text"))
      .select(col("doc_id"), col("lang"), col("detected_lang"), col("text"))
      .join(firstCopy, "doc_id")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .filter(col("first_copy") && col("detected_lang") === col("lang") &&
        col("n_tokens") >= minTokens &&
        expr(bucketSql) < lit((0.8 * 4294967296L).toLong))
      .select(col("lang"), col("doc_id"), col("text"), col("n_tokens"))
  }

  def c7Pipeline(spark: SparkSession, dir: String, minTokens: Int = 10,
      seqLen: Long = 2048L): DataFrame = {
    val kept = pipelineKept(spark, dir, minTokens)
      .select(col("lang"), col("doc_id"), col("n_tokens"))
    withRunningSum(kept, "n_tokens", "cum")
      .select(col("lang"), col("doc_id"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $seqLen").as("first_seq"),
        expr(s"(cum - 1) div $seqLen").as("last_seq"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1L)
      .orderBy("lang", "doc_id")
  }

  /** C7u: the curation pipeline WITH span-level scrub composed in — the
    * order real pipelines run: doc-level near-dup dedup and the
    * langid/length/carve-out gates first ([[pipelineKept]]), THEN
    * substring-level keep-first scrub among the SURVIVORS (a dropped
    * duplicate must not scrub the copy that became the first surviving
    * occurrence — the span analysis runs over the survivor set, not the
    * raw corpus), the length floor re-applied on the EFFECTIVE
    * (post-scrub) token count, and sequence packing over effective
    * tokens. Output adds `n_removed`/`n_eff` per doc so the packed
    * budget is auditable against the doc-level counts.
    *
    * Scale posture: the prologue's banding is O(n·bands); the span
    * stage is the occurrence-capped linear machinery of
    * c4_substring_dup over the (smaller) survivor set with a
    * model-sized interval aggregate (no token explode — the removed
    * count is Σ interval lengths); packing is the proven partitioned
    * prefix sum. Every stage composes without a second corpus
    * tokenization of the raw input.
    */
  def c7PipelineV2(spark: SparkSession, dir: String, minTokens: Int = 10,
      seqLen: Long = 2048L, window: Int = 16, maxOcc: Int = 16): DataFrame = {
    val kept = pipelineKept(spark, dir, minTokens)
    val rm = TextOps.scrubRemovedCounts(
      kept.select(col("doc_id"), col("text")), window, maxOcc)
    val k2 = kept.join(rm, Seq("doc_id"), "left")
      .withColumn("n_removed", coalesce(col("n_removed"), lit(0L)))
      .withColumn("n_eff", col("n_tokens") - col("n_removed"))
      .filter(col("n_eff") >= minTokens)
      .select(col("lang"), col("doc_id"), col("n_tokens"),
        col("n_removed"), col("n_eff"))
    withRunningSum(k2, "n_eff", "cum")
      .select(col("lang"), col("doc_id"), col("n_tokens"),
        col("n_removed"), col("n_eff"),
        expr(s"(cum - n_eff) div $seqLen").as("first_seq"),
        expr(s"(cum - 1) div $seqLen").as("last_seq"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1L)
      .orderBy("lang", "doc_id")
  }

  /** C7x: the FULL CCNet-shaped curation pipeline — [[pipelineKept]]'s
    * dedup/langid/length/carve-out prologue, THEN the reference-LM
    * perplexity tercile among the SURVIVORS (per-lang (nll, doc_id)
    * rank, exact integer tercile, head+middle kept — the c7_ppl_filter
    * selection applied where CCNet applies it: AFTER dedup, so a
    * dropped duplicate can neither occupy a tercile slot nor shift a
    * boundary), THEN substring scrub among the ppl-kept survivors, the
    * effective-length floor re-applied, and packing over effective
    * tokens. Output carries nll next to the packing columns so the
    * selection is auditable per doc.
    *
    * Scale posture: every stage is the proven machinery of its
    * standalone query — the prologue's O(n·bands) banding, the LM
    * scoring join against the fingerprint-keyed reference layout
    * (model-sized; never retrained in-pipeline), the per-lang rank via
    * the partitioned prefix sum (no global window), the
    * occurrence-capped span chain over the (twice-shrunk) survivor
    * set, and the two-phase packing sum. Nothing re-tokenizes the raw
    * corpus a second time.
    */
  /** Per-lang CCNet tercile machinery shared by [[c7PplFilter]] and
    * [[c7PipelineV3]] — ONE source of truth for the oracle-pinned
    * boundary: deterministic (nll, doc_id) rank via the partitioned
    * prefix sum, broadcast per-lang totals (O(langs) rows), exact
    * integer bucket `(3·(rk−1)) div n`. Input must carry
    * (lang, doc_id, nll); columns pass through plus `bucket`.
    */
  private def withPplTercile(df: DataFrame): DataFrame = {
    val ranked = withRunningSum(df.withColumn("one", lit(1L)), "one", "rk",
      keyCol = "lang", orderCols = Seq("nll", "doc_id"))
    val totals = ranked.groupBy("lang").agg(count(lit(1)).as("n"))
    ranked.join(broadcast(totals), "lang")
      .withColumn("bucket", expr("(3 * (rk - 1)) div n"))
  }

  def c7PipelineV3(spark: SparkSession, dir: String, minTokens: Int = 10,
      seqLen: Long = 2048L, window: Int = 16, maxOcc: Int = 16): DataFrame = {
    val kept = pipelineKept(spark, dir, minTokens)
    val ppl = TextOps.c4LmPplRef(spark, dir).select(col("doc_id"), col("nll"))
    val pplKept = withPplTercile(kept.join(ppl, "doc_id"))
      .filter(col("bucket") <= 1)
      .select(col("lang"), col("doc_id"), col("text"), col("n_tokens"),
        col("nll"))
    val rm = TextOps.scrubRemovedCounts(
      pplKept.select(col("doc_id"), col("text")), window, maxOcc)
    val k2 = pplKept.join(rm, Seq("doc_id"), "left")
      .withColumn("n_removed", coalesce(col("n_removed"), lit(0L)))
      .withColumn("n_eff", col("n_tokens") - col("n_removed"))
      .filter(col("n_eff") >= minTokens)
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("nll"),
        col("n_removed"), col("n_eff"))
    withRunningSum(k2, "n_eff", "cum")
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("nll"),
        col("n_removed"), col("n_eff"),
        expr(s"(cum - n_eff) div $seqLen").as("first_seq"),
        expr(s"(cum - 1) div $seqLen").as("last_seq"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1L)
      .orderBy("lang", "doc_id")
  }

  /** C7w: PERPLEXITY-bucketED curation — the CCNet head/middle/tail
    * pass: every document's nll under the reference-trained LM
    * ([[TextOps.c4LmPplRef]]) ranks within its language, the rank
    * splits into exact terciles by INTEGER arithmetic
    * (`bucket = (3·(rank−1)) div n` — no float percentile can
    * hash-flip a boundary), and head+middle survive (`keep = bucket ≤
    * 1`), the published CCNet selection. Ranking is deterministic
    * ((nll, doc_id) order), so the buckets are portable across
    * engines and partitionings like every other C7 carve-out.
    *
    * Scale posture: the per-lang rank is the proven two-phase
    * partitioned prefix sum ([[withRunningSum]] over ones — no
    * single-partition window over a language's full mass); per-lang
    * totals are a tiny broadcast join.
    */
  def c7PplFilter(spark: SparkSession, dir: String): DataFrame = {
    val ppl = TextOps.c4LmPplRef(spark, dir).select(col("doc_id"), col("nll"))
    withPplTercile(docs(spark, dir).select(col("doc_id"), col("lang"))
        .join(ppl, "doc_id"))
      .withColumn("keep", col("bucket") <= 1)
      .select("lang", "doc_id", "nll", "bucket", "keep")
      .orderBy("lang", "doc_id")
  }

  /** C7i: exact-QUOTA stratified sampling — exactly min(k, |lang|) docs
    * per language, chosen as the k SMALLEST portable hash buckets (the
    * same Knuth bucket as c7_sample_strat, so the quota sample is
    * deterministic, engine- and partitioning-independent, and composes
    * with the other C7 carve-outs). Bernoulli bucket sampling gives a
    * RATE; evaluation sets need exact counts per stratum. Physical
    * shape: the bounded-heap [[graft.functions.TopKAggregator]] keyed
    * by lang — O(langs · k) aggregation state with map-side combine,
    * never a window over a language's full mass (the c7 prefix-sum
    * lesson applied to sampling). The sort key is the NEGATED bucket
    * (the aggregator keeps largest keys; the sample wants smallest
    * buckets); bucket < 2^32 is exact in a double.
    */
  def c7SampleTopk(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    import spark.implicits._
    val topk = new graft.functions.TopKAggregator[(Double, Long)](k, _._1, _._2)
      .toColumn.name("topk")
    docs(spark, dir)
      .selectExpr("lang", s"CAST(-($bucketSql) AS DOUBLE) AS negb", "doc_id")
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(topk)
      .toDF("lang", "topk")
      .select(col("lang"), posexplode(col("topk")))
      .select(col("lang"),
        col("col._2").as("doc_id"),
        (-col("col._1")).cast("long").as("bucket"),
        (col("pos") + 1).cast("int").as("rn"))
      .orderBy("lang", "rn")
  }

  /** C7l: Gopher-style composite quality filter — the rule-based document
    * gate every pretraining pipeline applies before expensive stages
    * (public Gopher/C4 heuristics adapted to the corpus): token-count
    * bounds, mean-word-length bounds, top-token concentration cap,
    * duplicated-bigram cap, and a minimum-stopword-diversity floor. Every
    * rule is INTEGER arithmetic (`a·k ≤ b·m` forms — no float threshold
    * can hash-flip a verdict), emitted per-rule so the pipeline can audit
    * WHY a doc was dropped, plus the composite `keep`.
    *
    * Scale: the per-token and per-bigram concentration stats shuffle on
    * (doc_id, token) with map-side partial aggregation (the c4_diversity
    * posture — never a per-row O(len²) HOF, which would die on a 100k-token
    * doc); the three per-doc tables then equi-join on doc_id.
    */
  def c7QualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val stopArr = array(TextOps.stopwords.map(lit): _*)
    val base = docs(spark, dir).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      length(regexp_replace(col("text"), "[^a-z]", "")).cast("long").as("alpha_chars"))
    val tokStats = docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("max_c"),
        // rows are distinct (doc, token), so this counts distinct
        // stopword TYPES present, not occurrences
        count(when(array_contains(stopArr, col("tok")), 1)).as("n_stop_types"))
    val toks = split(col("text"), " ")
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val bgStats = docs(spark, dir)
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("n_dup"))
    base
      .join(tokStats, Seq("doc_id"), "left")
      .join(bgStats, Seq("doc_id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("n_dup", coalesce(col("n_dup"), lit(0L)))
      .select(col("doc_id"),
        col("n_tokens").between(30L, 10000L).as("r_len"),
        (col("alpha_chars") >= col("n_tokens") * 2 &&
          col("alpha_chars") <= col("n_tokens") * 12).as("r_word_len"),
        (col("max_c") * 5 <= col("n_tokens")).as("r_top_tok"),
        (col("n_dup") * 10 <= col("n_bigrams") * 3).as("r_dup_bigram"),
        (col("n_stop_types") >= 2).as("r_stopwords"))
      .withColumn("keep",
        col("r_len") && col("r_word_len") && col("r_top_tok") &&
          col("r_dup_bigram") && col("r_stopwords"))
      .orderBy("doc_id")
  }

  /** C7m: canonical-document selection — near-dup clusters (the
    * c2_minhash_cc transitive closure) resolved by a QUALITY policy
    * instead of min-id: within each cluster keep the doc with the most
    * tokens (ties to the smallest id). This is the form real curation
    * takes — min-id keeps an arbitrary copy; a policy keeps the best
    * one (longest text stands in for the quality signal; swapping in
    * any per-doc score is a one-column change).
    *
    * Scale: the closure is the distributed large-star/small-star
    * contraction (O(log n) rounds); the argmax is ONE partial aggregate
    * `max(struct(n_tokens, -doc_id))` per cluster — no window over a
    * possibly mega-sized cluster — then a shuffle join back on the
    * cluster rep.
    */
  def c7DedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val cc = graft.dedup.MinHash.dedupAssignmentsCC(
      docs(spark, dir), col("doc_id"), col("text"), numHashes = 64, bands = 16)
      .select("doc_id", "cluster_rep")
    val stats = docs(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
    // Persisted: the CC assignment feeds both the per-cluster argmax and
    // the final join — without the cache the whole MinHash signature +
    // star-contraction subtree runs twice (measured: 5.2 s -> ~2.6 s).
    val joined = cc.join(stats, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val best = joined.groupBy("cluster_rep")
      .agg(max(struct(col("n_tokens"), (-col("doc_id")).as("negid"))).as("b"))
      .select(col("cluster_rep"), (-col("b.negid")).as("keep_id"))
    graft.util.CacheScope.releaseAfterMaterialize(
      joined.join(best, "cluster_rep")
        .select(col("doc_id"), col("cluster_rep"), col("n_tokens"),
          col("keep_id"), (col("doc_id") === col("keep_id")).as("is_kept"))
        .orderBy("doc_id"),
      Seq(joined))
  }

  /** C7n: curriculum phase assignment — order the corpus by a difficulty
    * proxy (token count, ties by doc_id: a deterministic TOTAL order) and
    * split it into `phases` equal-size contiguous phases (easy -> hard),
    * the data-ordering operator of curriculum training. The phase is an
    * exact global ntile: `((rank-1)·P) div N + 1` — pure integer
    * arithmetic off the exact global rank, so unlike percentile-threshold
    * bucketing nothing can hash-flip, and phase sizes differ by at most
    * one doc.
    *
    * Scale: the global rank uses the two-phase zip-with-index
    * construction (the [[withRunningSum]] posture, global instead of
    * per-language): range-partition by the sort key so partitions are
    * size-bounded, count each partition (O(partitions) driver rows),
    * broadcast the prefix offsets back, and rank within partitions —
    * never a corpus-wide single-task window. The ranged frame is
    * localCheckpoint'ed for the same pid-stability reason documented
    * there.
    */
  def c7Curriculum(spark: SparkSession, dir: String, phases: Int = 4): DataFrame = {
    val (ranked, nd) = tokenRank(spark, dir)
    ranked
      .withColumn("phase",
        expr(s"CAST(((rank - 1) * $phases) div $nd + 1 AS INT)"))
      .select("doc_id", "n_tokens", "rank", "phase")
      .orderBy("doc_id")
  }

  /** Exact global `(doc_id, n_tokens, rank)` over the (n_tokens, doc_id)
    * total order via the two-phase bounded-partition construction, plus
    * the corpus doc count — shared by curriculum phasing and shard
    * assignment.
    */
  private def tokenRank(spark: SparkSession, dir: String): (DataFrame, Long) = {
    val base = docs(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val ranged = base
      .repartitionByRange(col("n_tokens"), col("doc_id"))
      .sortWithinPartitions("n_tokens", "doc_id")
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    val partCounts = ranged.groupBy("pid").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val nd = partCounts.map(_._2).sum
    val offsets = partCounts.map(_._1)
      .zip(partCounts.map(_._2).scanLeft(0L)(_ + _))
    val session = spark
    import session.implicits._
    val offsetDf = offsets.toSeq.toDF("pid", "offset")
    val wPart = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("n_tokens"), col("doc_id"))
    (ranged
      .join(broadcast(offsetDf), "pid")
      .withColumn("rank", col("offset") + row_number().over(wPart))
      .select("doc_id", "n_tokens", "rank"), nd)
  }

  /** C7s: size-balanced output SHARD assignment — the step that turns a
    * curated corpus into the fixed set of training shards (WebDataset/
    * tfrecord-style) a loader streams: shard = (global token rank − 1)
    * mod S stripes docs across shards by size, so every shard gets the
    * same doc count (±1) and near-equal token mass (consecutive ranks
    * differ minimally in n_tokens) — greedy bin packing balances
    * marginally better but is inherently sequential; striping is fully
    * parallel, deterministic at any partitioning, and reproducible on
    * resume like every C7 selection. Output is the per-shard audit
    * (count, token mass, id-sum fingerprint pinning WHICH docs landed
    * where). The rank reuses [[tokenRank]]'s two-phase construction —
    * never a corpus-wide single-task window.
    */
  def c7ShardBalance(spark: SparkSession, dir: String, shards: Int = 16): DataFrame = {
    val (ranked, _) = tokenRank(spark, dir)
    ranked
      .withColumn("shard", ((col("rank") - 1) % shards).cast("int"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("doc_id")).as("idsum"))
      .orderBy("shard")
  }

  /** C7o: deterministic source interleaving — a reproducible "global
    * shuffle" for the training order: docs are pseudo-shuffled WITHIN
    * each source by the portable Knuth bucket (engine/partitioning/run
    * independent, like every C7 selection), then the sources are
    * round-robin interleaved by slot `(rank_s−1)·n_sources + src_idx`:
    * consecutive training positions cycle through sources while each
    * lasts (slots of exhausted sources stay empty — position is an
    * ORDER KEY, not a dense index). This is the data-ordering operator
    * that keeps any training-window mixture-balanced without a stored
    * permutation table.
    *
    * Scale: the within-source rank is the two-phase bounded-partition
    * construction ([[withRunningSum]] with source as the key and
    * (bucket, doc_id) as the order — a source is NOT a bounded
    * partition); the source-index table is O(sources) and broadcast.
    */
  def c7Interleave(spark: SparkSession, dir: String): DataFrame = {
    val session = spark
    import session.implicits._
    val base = docs(spark, dir)
      .select(col("doc_id"), col("source"), expr(bucketSql).as("bucket"))
      .withColumn("one", lit(1L))
    val ranked = withRunningSum(base, "one", "rank_s",
      keyCol = "source", orderCols = Seq("bucket", "doc_id"))
    val srcs = docs(spark, dir).select("source").distinct()
      .collect().map(_.getString(0)).sorted
    val srcIdx = srcs.zipWithIndex.map { case (s, i) => (s, i.toLong) }
      .toSeq.toDF("source", "src_idx")
    ranked
      .join(broadcast(srcIdx), "source")
      .withColumn("position",
        (col("rank_s") - 1) * srcs.length + col("src_idx") + 1)
      .select("doc_id", "source", "rank_s", "position")
      .orderBy("doc_id")
  }

  /** C7t: deterministic WEIGHTED priority sampling — select the k docs
    * whose inclusion chance is monotone in a weight column (n_chars:
    * longer docs more likely), reproducibly on any engine / partitioning
    * / run. Each doc gets the integer priority
    * `(bucket * 2^20) div weight`: the portable Knuth bucket scaled down
    * by its weight, so doubling a doc's weight halves its expected
    * priority, and the k SMALLEST priorities form the weighted sample.
    * The 2^20 pre-scale keeps resolution when bucket < weight — a bare
    * `bucket div w` collapses to priority 0 for ≈ total_chars/2^32 docs
    * (tens of thousands at the 100 TB posture, far above k), after which
    * the doc_id tie-break, not weight, would decide the sample; bucket
    * < 2^32 so the scaled product stays under 2^52 — safely in int64.
    * This is the integer-arithmetic
    * analog of the exponential-key (Efraimidis–Spirakis) scheme — chosen
    * over u^(1/w) keys because pow/ln are not bit-portable across
    * engines while 64-bit integer division is; the induced inclusion
    * probabilities are approximately (not exactly) proportional to w,
    * which is the usual contract of a size-biased corpus sample.
    * Ties (same priority) break on doc_id, so the selection is a total
    * order and the oracle hash pins WHICH docs were picked.
    *
    * Scale: a narrow projection into TakeOrderedAndProject(k) — no
    * shuffle, no window, no global sort; each task keeps a k-row heap
    * and the driver merges O(partitions·k).
    */
  def c7SampleWeighted(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        expr(s"(($bucketSql) * 1048576) div greatest(n_chars, 1)").as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)

  /** C7u: per-epoch training-order reshuffle — a DIFFERENT reproducible
    * permutation of the corpus for each training epoch (epoch-salted
    * Knuth key, ties by doc_id), the multi-epoch counterpart of
    * [[c7Interleave]]'s single ordering: re-shuffling between epochs is
    * standard training practice, and doing it as a pure function of
    * (doc_id, epoch) means resume/backfill replays the exact batch
    * order of any epoch without a stored permutation table. The salt
    * enters as an epoch-dependent odd MULTIPLIER
    * `m(e) = (2654435761 + 2·e·2246822519) mod 2^32` — odd for every
    * epoch, hence bijective mod 2^32 — so each epoch is a genuinely
    * different permutation. (An ADDITIVE salt `doc·K + e·P` would make
    * every epoch a cyclic rotation of epoch 0's order: same training
    * sequence, shifted — the round-10 advisor caught exactly that.)
    *
    * Scale: position is an exact per-epoch global rank via the same
    * two-phase bounded-partition construction as [[c7Curriculum]]
    * ([[withRunningSum]] keyed by epoch) — an epoch is NOT a bounded
    * partition, so a plain `Window.partitionBy(epoch)` would funnel the
    * whole corpus through one task; the range-partitioned construction
    * keeps every task bounded at any corpus size.
    */
  def c7EpochOrder(spark: SparkSession, dir: String, epochs: Int = 3): DataFrame = {
    // ekey = (doc_id · m(e)) mod 2^32, computed OVERFLOW-SAFE for the
    // full int64 id range: a naive doc_id * m with m up to 2^32−1
    // overflows int64 once doc_id exceeds ~2.1e9 — Spark wraps silently
    // while DuckDB errors, so engine and oracle would diverge on very
    // large ids. Reduce doc_id into [0, 2^32) first (sign-safe double
    // mod — portable where pmod is Spark-only), then split the multiply
    // 16/16: d·m ≡ ((d÷2^16)·m mod 2^16)·2^16 + (d mod 2^16)·m
    // (mod 2^32); every intermediate stays below 2^49. The oracle
    // replays the identical split, so the permutation is bit-portable
    // at any id.
    val base = docs(spark, dir)
      .select(col("doc_id"))
      .withColumn("epoch",
        explode(array((0 until epochs).map(e => lit(e)): _*)))
      .withColumn("em",
        expr("(2654435761 + 2 * epoch * 2246822519) % 4294967296"))
      .withColumn("d32",
        expr("((doc_id % 4294967296) + 4294967296) % 4294967296"))
      .withColumn("ekey",
        expr("((((d32 div 65536) * em) % 65536) * 65536 " +
          "+ (d32 % 65536) * em) % 4294967296"))
      .withColumn("epoch_s", concat(lit("e"), col("epoch")))
      .withColumn("one", lit(1L))
    withRunningSum(base, "one", "position",
      keyCol = "epoch_s", orderCols = Seq("ekey", "doc_id"))
      .select(col("epoch"), col("doc_id"), col("position"))
      .orderBy("epoch", "doc_id")
  }

  /** C7p: dataset-card profile — the per-(source, lang) summary a
    * pipeline publishes with a corpus release: doc/token counts,
    * exact-duplicate rate (non-first copies by content hash), the
    * quality-filter pass rate, and mean lexical diversity. Pure
    * composition of per-doc signals this engine already computes
    * ([[c7QualityFilter]], [[TextOps.c4Diversity]], the c1 md5
    * first-copy rule) grouped once — the "one plan, one pass over each
    * signal" form, not a driver-side report script. Simpson means sum
    * as DECIMAL(20,6) (the [[graft.queries.Exact]] discipline) so
    * aggregation order can never drift the hash.
    */
  def c7DatasetCard(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), md5(col("text")).as("h"))
    val fst = d.groupBy("h").agg(min(col("doc_id")).as("first_id"))
    val qf = c7QualityFilter(spark, dir).select(col("doc_id"), col("keep"))
    val dv = TextOps.c4Diversity(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("simpson"))
    d.join(fst, "h")
      .withColumn("is_dup", col("doc_id") =!= col("first_id"))
      .join(qf, "doc_id")
      .join(dv, "doc_id")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality"),
        sum(col("simpson").cast("decimal(20,6)")).as("sumdec"))
      .select(col("source"), col("lang"), col("n_docs"), col("total_tokens"),
        col("n_dup_docs"),
        round(col("n_dup_docs").cast("double") / col("n_docs"), 6).as("dup_rate"),
        col("n_quality"),
        round(col("n_quality").cast("double") / col("n_docs"), 6).as("quality_rate"),
        round(col("sumdec").cast("double") / col("n_docs"), 6).as("mean_simpson"))
      .orderBy("source", "lang")
  }

  /** C7w: the dataset card EXTENDED with the round-15 signal families —
    * a release profile that under-reports perplexity, PII and
    * repeated-span exposure documents the corpus the pipeline had, not
    * the one it ships. Adds to [[c7DatasetCard]]'s per-(source, lang)
    * row: the CCNet perplexity-tercile composition (head/middle/tail
    * doc counts under the reference LM — [[c7PplFilter]]'s exact
    * integer bucket), PII exposure (total detected spans and the share
    * of docs carrying any — [[graft.queries.TextOps.c4PiiScrub]]'s
    * counts), and repeated-span exposure (docs with a scrub-eligible
    * repeated span and the removed-token share of the group's mass —
    * [[graft.queries.TextOps.scrubRemovedCounts]]). One declarative
    * plan composed from the existing per-doc frames; every new rate is
    * one rounded division over exact integer sums.
    *
    * Scale posture: each component is its own proven linear plan; the
    * card adds only doc_id equi-joins and one partial+final aggregate
    * to (source, lang) — model-sized output, no new corpus-sized
    * exchange beyond the components' own.
    */
  def c7DatasetCardV2(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), md5(col("text")).as("h"))
    val fst = d.groupBy("h").agg(min(col("doc_id")).as("first_id"))
    val qf = c7QualityFilter(spark, dir).select(col("doc_id"), col("keep"))
    val dv = TextOps.c4Diversity(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("simpson"))
    val ppl = c7PplFilter(spark, dir).select(col("doc_id"), col("bucket"))
    val pii = TextOps.c4PiiScrub(spark, dir).select(col("doc_id"), col("n_pii"))
    val spans = TextOps.scrubRemovedCounts(docs(spark, dir))
    d.join(fst, "h")
      .withColumn("is_dup", col("doc_id") =!= col("first_id"))
      .join(qf, "doc_id")
      .join(dv, "doc_id")
      .join(ppl, "doc_id")
      .join(pii, "doc_id")
      .join(spans, Seq("doc_id"), "left")
      .withColumn("n_removed", coalesce(col("n_removed"), lit(0L)))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality"),
        sum(col("simpson").cast("decimal(20,6)")).as("sumdec"),
        sum(when(col("bucket") === 0L, 1L).otherwise(0L)).as("n_ppl_head"),
        sum(when(col("bucket") === 1L, 1L).otherwise(0L)).as("n_ppl_mid"),
        sum(when(col("bucket") === 2L, 1L).otherwise(0L)).as("n_ppl_tail"),
        sum(col("n_pii")).as("total_pii"),
        sum(when(col("n_pii") > 0L, 1L).otherwise(0L)).as("n_pii_docs"),
        sum(col("n_removed")).as("total_span_tokens"),
        sum(when(col("n_removed") > 0L, 1L).otherwise(0L)).as("n_span_docs"))
      .select(col("source"), col("lang"), col("n_docs"), col("total_tokens"),
        col("n_dup_docs"),
        round(col("n_dup_docs").cast("double") / col("n_docs"), 6).as("dup_rate"),
        col("n_quality"),
        round(col("n_quality").cast("double") / col("n_docs"), 6).as("quality_rate"),
        round(col("sumdec").cast("double") / col("n_docs"), 6).as("mean_simpson"),
        col("n_ppl_head"), col("n_ppl_mid"), col("n_ppl_tail"),
        col("total_pii"), col("n_pii_docs"),
        round(col("n_pii_docs").cast("double") / col("n_docs"), 6).as("pii_doc_rate"),
        col("total_span_tokens"), col("n_span_docs"),
        round(col("total_span_tokens").cast("double") /
          col("total_tokens").cast("double"), 6).as("span_token_rate"))
      .orderBy("source", "lang")
  }

  /** Shared replay of the quality-filter signal chain (base/tc/ts/bg/bs
    * CTEs) and the composite keep predicate — consumed by the
    * c7_quality_filter oracle and recomposed by c7_dataset_card.
    */
  private val qualityCtes: String =
    "base AS (SELECT doc_id, " +
      "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, " +
      "CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS alpha_chars " +
      "FROM documents), " +
      "tc AS (SELECT doc_id, tok, count(*) AS c FROM " +
      "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) " +
      "GROUP BY doc_id, tok), " +
      "ts AS (SELECT doc_id, max(c) AS max_c, " +
      "count(CASE WHEN tok IN ('the','a','of','to','in','and','is') THEN 1 END) " +
      "AS n_stop_types FROM tc GROUP BY doc_id), " +
      "bg AS (SELECT doc_id, bg, count(*) AS cnt FROM " +
      "(SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))), " +
      "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS bg " +
      "FROM documents) GROUP BY doc_id, bg), " +
      "bs AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams, " +
      "CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS n_dup " +
      "FROM bg GROUP BY doc_id)"

  private val qualityKeepSql: String =
    "n_tokens BETWEEN 30 AND 10000 AND " +
      "alpha_chars >= n_tokens * 2 AND alpha_chars <= n_tokens * 12 AND " +
      "max_c * 5 <= n_tokens AND " +
      "COALESCE(n_dup, 0) * 10 <= COALESCE(n_bigrams, 0) * 3 AND " +
      "n_stop_types >= 2"

  /** Shared fuzzy-decontamination replay (IncBands MinHash chain over
    * the portable split buckets, exact-Jaccard confirm, best pick),
    * parameterized on the candidate CTE so the full-candidate and
    * bounded-top-C variants share every other stage verbatim — the
    * incrementalSqlWith pattern applied to the split-based form.
    */
  private def fuzzySqlWith(candCte: String): String = {
    val t8 = (0.8 * 4294967296L).toLong
    val t9 = (0.9 * 4294967296L).toLong
    s"WITH sb AS (SELECT doc_id, $bucketSqlDuck AS sb FROM documents), " +
      "base AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks " +
      s"FROM documents WHERE $bucketSqlDuck < $t8 OR $bucketSqlDuck >= $t9), " +
      DedupOps.mhChainSql(DedupOps.IncBands, DedupOps.IncRows) + ", " +
      "nw AS (SELECT mem.doc_id AS n_id, band, bucket FROM mem " +
      s"JOIN sb ON mem.doc_id = sb.doc_id WHERE sb.sb < $t8), " +
      "cp AS (SELECT mem.doc_id AS c_id, band, bucket FROM mem " +
      s"JOIN sb ON mem.doc_id = sb.doc_id WHERE sb.sb >= $t9), " +
      candCte + ", " +
      "sc AS (SELECT n_id, c_id, " +
      "len(list_filter(a.toks, t -> list_contains(b.toks, t))) AS common, " +
      "len(a.toks) AS na, len(b.toks) AS nb " +
      "FROM cand JOIN base a ON a.doc_id = cand.n_id " +
      "JOIN base b ON b.doc_id = cand.c_id), " +
      "cf AS (SELECT n_id, c_id, " +
      "round(CAST(common AS DOUBLE) / (na + nb - common), 6) AS jaccard " +
      "FROM sc WHERE round(CAST(common AS DOUBLE) / (na + nb - common), 6) >= 0.8), " +
      "best AS (SELECT n_id, c_id, jaccard, row_number() OVER " +
      "(PARTITION BY n_id ORDER BY jaccard DESC, c_id) AS rn FROM cf) " +
      "SELECT b.doc_id, m.c_id IS NOT NULL AS contaminated, " +
      "m.c_id AS test_match_id, m.jaccard AS match_jaccard " +
      s"FROM (SELECT doc_id FROM sb WHERE sb < $t8) b " +
      "LEFT JOIN (SELECT n_id, c_id, jaccard FROM best WHERE rn = 1) m " +
      "ON b.doc_id = m.n_id ORDER BY doc_id"
  }

  val oracle: Map[String, String] = Map(
    "c7_interleave" ->
      ("WITH s AS (SELECT doc_id, source, " +
        s"$bucketSqlDuck AS bucket FROM documents), " +
        "si AS (SELECT source, CAST(row_number() OVER (ORDER BY source) - 1 " +
        "AS BIGINT) AS src_idx FROM (SELECT DISTINCT source FROM documents)), " +
        "ns AS (SELECT count(*) AS n_sources FROM si), " +
        "r AS (SELECT doc_id, source, CAST(row_number() OVER " +
        "(PARTITION BY source ORDER BY bucket, doc_id) AS BIGINT) AS rank_s FROM s) " +
        "SELECT r.doc_id, r.source, r.rank_s, " +
        "(r.rank_s - 1) * n_sources + src_idx + 1 AS position " +
        "FROM r JOIN si USING (source) CROSS JOIN ns ORDER BY doc_id"),
    "c7_curriculum" ->
      ("WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) " +
        "AS n_tokens FROM documents), " +
        "n AS (SELECT count(*) AS nd FROM t), " +
        "r AS (SELECT doc_id, n_tokens, CAST(row_number() OVER " +
        "(ORDER BY n_tokens, doc_id) AS BIGINT) AS rank FROM t) " +
        "SELECT doc_id, n_tokens, rank, " +
        "CAST((rank - 1) * 4 // nd + 1 AS INT) AS phase " +
        "FROM r, n ORDER BY doc_id"),
    // The same exact global (n_tokens, doc_id) rank, striped mod 16.
    "c7_shard_balance" ->
      ("WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) " +
        "AS n_tokens FROM documents), " +
        "r AS (SELECT doc_id, n_tokens, row_number() OVER " +
        "(ORDER BY n_tokens, doc_id) AS rank FROM t) " +
        "SELECT CAST((rank - 1) % 16 AS INT) AS shard, count(*) AS n_docs, " +
        "CAST(sum(n_tokens) AS BIGINT) AS total_tokens, " +
        "CAST(sum(doc_id) AS BIGINT) AS idsum " +
        "FROM r GROUP BY 1 ORDER BY shard"),
    // Contamination report: string-exact shingle replay of the hashed
    // join (same collision caveat as c7_decontaminate), integer
    // cross-multiplied dirty flag.
    "c7_contamination" ->
      (s"WITH d AS (SELECT doc_id, $bucketSqlDuck AS bucket, string_split(text, ' ') AS toks " +
        "FROM documents), " +
        "sh AS (SELECT doc_id, bucket, unnest(list_transform(range(1, len(toks) - 2), " +
        "i -> array_to_string(list_slice(toks, i, i + 3), ' '))) AS sh FROM d), " +
        s"te AS (SELECT DISTINCT doc_id, sh FROM sh WHERE bucket >= ${(0.9 * 4294967296L).toLong}), " +
        s"leaked AS (SELECT DISTINCT sh FROM sh WHERE bucket < ${(0.8 * 4294967296L).toLong} " +
        "AND sh IN (SELECT sh FROM te)) " +
        "SELECT te.doc_id, count(*) AS n_shingles, count(leaked.sh) AS n_hit, " +
        "count(leaked.sh) * 10 >= count(*) AS dirty " +
        "FROM te LEFT JOIN leaked ON te.sh = leaked.sh " +
        "GROUP BY te.doc_id ORDER BY te.doc_id"),
    // Cross-source overlap replay: the c2_minhash_lsh cluster chain,
    // source attach, distinct (cluster, source), pair count.
    "c7_source_overlap" ->
      (s"WITH ${DedupOps.mhBase}, " +
        "mm AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY band, bucket) " +
        "AS bucket_min FROM mem), " +
        "asg AS (SELECT doc_id, min(bucket_min) AS rep FROM mm GROUP BY doc_id), " +
        "cs AS (SELECT DISTINCT rep, source FROM asg JOIN documents USING (doc_id)) " +
        "SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_clusters " +
        "FROM cs a JOIN cs b ON a.rep = b.rep AND a.source < b.source " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    // Fuzzy decontamination: the incremental-dedup replay (IncBands
    // MinHash chain, band-bucket candidates, exact-Jaccard confirm,
    // (jaccard desc, id asc) best pick) with the portable split buckets
    // as the batch/corpus partition.
    "c7_decontaminate_fuzzy" -> fuzzySqlWith(
      "cand AS (SELECT DISTINCT n_id, c_id FROM nw JOIN cp USING (band, bucket))"),
    // Top-C replay: the shared bounded-candidate chain (per-bucket caps
    // on BOTH sides — train occupancy would otherwise multiply the
    // test cap on a dense corpus, the r13 decade finding — then
    // band-agreement counts and the (agreement desc, c_id asc) rank,
    // the exact total orders the bounded heaps implement).
    "c7_decontaminate_fuzzy_topc" -> fuzzySqlWith(
      DedupOps.topCCandidateSql("cp", capNewSide = true)),
    // Fixed-round min-propagation closure over the replayed MinHash
    // memberships (the c2_minhash_cc oracle chain — linear per round,
    // so this replays above the sf0.01 gate too), then the
    // (n_tokens desc, doc_id asc) keep-best pick per cluster.
    "c7_dedup_keep_best" ->
      ("WITH " + DedupOps.mhBase + ", " +
        DedupOps.closureChainSql("band") + ", " +
        "st AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) " +
        "AS n_tokens FROM documents), " +
        "j AS (SELECT cl.doc_id, cluster_rep, n_tokens FROM cl JOIN st USING (doc_id)), " +
        "best AS (SELECT cluster_rep, doc_id AS keep_id, row_number() OVER " +
        "(PARTITION BY cluster_rep ORDER BY n_tokens DESC, doc_id) AS rn FROM j) " +
        "SELECT j.doc_id, j.cluster_rep, j.n_tokens, b.keep_id, " +
        "j.doc_id = b.keep_id AS is_kept " +
        "FROM j JOIN (SELECT cluster_rep, keep_id FROM best WHERE rn = 1) b " +
        "USING (cluster_rep) ORDER BY doc_id"),
    "c7_quality_filter" ->
      (s"WITH $qualityCtes " +
        "SELECT base.doc_id, " +
        "n_tokens BETWEEN 30 AND 10000 AS r_len, " +
        "(alpha_chars >= n_tokens * 2 AND alpha_chars <= n_tokens * 12) AS r_word_len, " +
        "max_c * 5 <= n_tokens AS r_top_tok, " +
        "COALESCE(n_dup, 0) * 10 <= COALESCE(n_bigrams, 0) * 3 AS r_dup_bigram, " +
        "n_stop_types >= 2 AS r_stopwords, " +
        s"($qualityKeepSql) AS keep " +
        "FROM base LEFT JOIN ts USING (doc_id) LEFT JOIN bs USING (doc_id) " +
        "ORDER BY doc_id"),
    // Dataset card: the per-(source, lang) profile composed from the
    // ALREADY-proven per-doc signals — exact-dup first-copy (the
    // c1_exact_dedup md5 grouping), the quality-filter keep (shared
    // qualityCtes), and the diversity index (the c4_diversity formula
    // over the shared tc CTE). Simpson means sum as DECIMAL(20,6) so
    // the cross-engine hash is independent of aggregation order.
    "c7_dataset_card" ->
      (s"WITH $qualityCtes, " +
        s"qf AS (SELECT base.doc_id, ($qualityKeepSql) AS keep " +
        "FROM base LEFT JOIN ts USING (doc_id) LEFT JOIN bs USING (doc_id)), " +
        "dv AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, " +
        "round(1.0 - CAST(sum(c*c) AS DOUBLE) / (sum(c) * sum(c)), 6) AS simpson " +
        "FROM tc GROUP BY doc_id), " +
        "d AS (SELECT doc_id, source, lang, md5(text) AS h FROM documents), " +
        "fst AS (SELECT h, min(doc_id) AS first_id FROM d GROUP BY h), " +
        "per AS (SELECT d.doc_id, d.source, d.lang, " +
        "d.doc_id <> f.first_id AS is_dup, qf.keep, dv.simpson, dv.n_tokens " +
        "FROM d JOIN fst f USING (h) " +
        "JOIN qf ON qf.doc_id = d.doc_id JOIN dv ON dv.doc_id = d.doc_id) " +
        "SELECT source, lang, count(*) AS n_docs, " +
        "CAST(sum(n_tokens) AS BIGINT) AS total_tokens, " +
        "CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs, " +
        "round(CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) " +
        "AS dup_rate, " +
        "CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality, " +
        "round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) " +
        "AS quality_rate, " +
        "round(CAST(sum(CAST(simpson AS DECIMAL(20,6))) AS DOUBLE) / count(*), 6) " +
        "AS mean_simpson " +
        "FROM per GROUP BY source, lang ORDER BY source, lang"),
    // V2 card replay: the v1 fragments verbatim, plus the lm-prefixed
    // reference-LM chain with the c7_ppl_filter tercile, the
    // c4_pii_scrub counts, and the z-prefixed span chain's per-doc
    // removed sums — all joined per doc, then the same (source, lang)
    // rollup with the new exposure columns.
    "c7_dataset_card_v2" ->
      (s"WITH $qualityCtes, " +
        s"qf AS (SELECT base.doc_id, ($qualityKeepSql) AS keep " +
        "FROM base LEFT JOIN ts USING (doc_id) LEFT JOIN bs USING (doc_id)), " +
        "dv AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, " +
        "round(1.0 - CAST(sum(c*c) AS DOUBLE) / (sum(c) * sum(c)), 6) AS simpson " +
        "FROM tc GROUP BY doc_id), " +
        TextOps.lmPplRefCtes + ", " +
        "pj AS (SELECT dd.lang, p.doc_id, p.nll " +
        "FROM lmres p JOIN documents dd USING (doc_id)), " +
        "pr AS (SELECT doc_id, CAST(row_number() OVER " +
        "(PARTITION BY lang ORDER BY nll, doc_id) AS BIGINT) AS rk, " +
        "count(*) OVER (PARTITION BY lang) AS n FROM pj), " +
        "pb AS (SELECT doc_id, (3 * (rk - 1)) // n AS bucket FROM pr), " +
        "pz AS (SELECT doc_id, " +
        TextOps.PiiPatterns.map { case (_, pat, _) =>
          s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT)"
        }.mkString(" + ") + " AS n_pii FROM documents), " +
        TextOps.ssdupChainOver("documents", "z") + ", " +
        "zsp AS (SELECT d1, d2, diag, min(o1) AS a0, max(o1) AS a1 " +
        "FROM zi GROUP BY d1, d2, diag, isl), " +
        "zrem AS (SELECT DISTINCT d2 AS doc_id, a0 + diag AS s, " +
        "a0 + diag + (a1 - a0 + 16) - 1 AS e FROM zsp), " +
        "zmx AS (SELECT *, max(e) OVER (PARTITION BY doc_id ORDER BY s, e " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe FROM zrem), " +
        "zg AS (SELECT *, sum(CASE WHEN maxe IS NULL OR s > maxe THEN 1 " +
        "ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY s, e) AS grp FROM zmx), " +
        "zmi AS (SELECT doc_id, grp, min(s) AS s, max(e) AS e FROM zg " +
        "GROUP BY doc_id, grp), " +
        "zrm AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS n_removed " +
        "FROM zmi GROUP BY doc_id), " +
        "d AS (SELECT doc_id, source, lang, md5(text) AS h FROM documents), " +
        "fst AS (SELECT h, min(doc_id) AS first_id FROM d GROUP BY h), " +
        "per AS (SELECT d.doc_id, d.source, d.lang, " +
        "d.doc_id <> f.first_id AS is_dup, qf.keep, dv.simpson, dv.n_tokens, " +
        "pb.bucket, pz.n_pii, COALESCE(zrm.n_removed, 0) AS n_removed " +
        "FROM d JOIN fst f USING (h) " +
        "JOIN qf ON qf.doc_id = d.doc_id JOIN dv ON dv.doc_id = d.doc_id " +
        "JOIN pb ON pb.doc_id = d.doc_id JOIN pz ON pz.doc_id = d.doc_id " +
        "LEFT JOIN zrm ON zrm.doc_id = d.doc_id) " +
        "SELECT source, lang, count(*) AS n_docs, " +
        "CAST(sum(n_tokens) AS BIGINT) AS total_tokens, " +
        "CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs, " +
        "round(CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) " +
        "AS dup_rate, " +
        "CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality, " +
        "round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) " +
        "AS quality_rate, " +
        "round(CAST(sum(CAST(simpson AS DECIMAL(20,6))) AS DOUBLE) / count(*), 6) " +
        "AS mean_simpson, " +
        "CAST(sum(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ppl_head, " +
        "CAST(sum(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ppl_mid, " +
        "CAST(sum(CASE WHEN bucket = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_ppl_tail, " +
        "CAST(sum(n_pii) AS BIGINT) AS total_pii, " +
        "CAST(sum(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs, " +
        "round(CAST(sum(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) " +
        "AS pii_doc_rate, " +
        "CAST(sum(n_removed) AS BIGINT) AS total_span_tokens, " +
        "CAST(sum(CASE WHEN n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_span_docs, " +
        "round(CAST(sum(n_removed) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE), 6) " +
        "AS span_token_rate " +
        "FROM per GROUP BY source, lang ORDER BY source, lang"),
    // Weighted priority replay: integer (bucket*2^20)//weight keys
    // (pre-scaled so bucket<weight can't collapse to 0), the k smallest
    // by (priority, doc_id).
    "c7_sample_weighted" ->
      ("SELECT doc_id, lang, n_chars, " +
        s"(($bucketSqlDuck) * 1048576) // greatest(n_chars, 1) " +
        "AS priority " +
        "FROM documents ORDER BY priority, doc_id LIMIT 100"),
    // Epoch-salted permutation replay: the per-epoch rank over the
    // (ekey, doc_id) total order. The epoch-dependent odd multiplier
    // mirrors c7EpochOrder exactly (additive salts only rotate), and
    // the 16/16 split mulmod mirrors the engine's overflow-safe form
    // (DuckDB would ERROR on the naive int64 overflow Spark wraps).
    "c7_epoch_order" ->
      ("WITH e AS (SELECT doc_id, unnest([0, 1, 2]) AS epoch FROM documents), " +
        "k AS (SELECT doc_id, epoch, " +
        "(2654435761 + 2 * epoch * 2246822519) % 4294967296 AS em, " +
        "((doc_id % 4294967296) + 4294967296) % 4294967296 AS d32 FROM e), " +
        "k2 AS (SELECT doc_id, epoch, " +
        "((((d32 // 65536) * em) % 65536) * 65536 " +
        "+ (d32 % 65536) * em) % 4294967296 AS ekey FROM k) " +
        "SELECT epoch, doc_id, CAST(row_number() OVER " +
        "(PARTITION BY epoch ORDER BY ekey, doc_id) AS BIGINT) AS position " +
        "FROM k2 ORDER BY epoch, doc_id"),
    "c7_sample_topk" ->
      (s"SELECT lang, doc_id, bucket, rn FROM (" +
        s"SELECT lang, doc_id, $bucketSqlDuck AS bucket, " +
        "CAST(row_number() OVER (PARTITION BY lang " +
        s"ORDER BY $bucketSqlDuck, doc_id) AS INT) AS rn " +
        "FROM documents) WHERE rn <= 50 ORDER BY lang, rn"),
    // The full composed pipeline: MinHash first-copy (the c2_minhash_lsh
    // replay), lang-id agreement (the c4_langid CTEs), length gate,
    // train bucket, then the pack window over the SURVIVING set — every
    // stage is the same SQL already proven bit-exact on its own query.
    "c7_pipeline" ->
      ("WITH base AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks " +
        "FROM documents), " +
        DedupOps.mhChainSql(bands = 4, rows = 16) + ", " +
        "mm AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY band, bucket) " +
        "AS bucket_min FROM mem), " +
        "asg AS (SELECT doc_id, doc_id = min(bucket_min) AS first_copy " +
        "FROM mm GROUP BY doc_id), " +
        TextOps.langIdCtes + ", " +
        "det AS (SELECT doc_id, struct_extract(best, 'code') AS detected_lang FROM b), " +
        "kept AS (SELECT d.lang, d.doc_id, " +
        "CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens " +
        "FROM documents d JOIN asg USING (doc_id) JOIN det USING (doc_id) " +
        "WHERE asg.first_copy AND det.detected_lang = d.lang " +
        "AND len(string_split(d.text, ' ')) >= 10 " +
        s"AND $bucketSqlDuck < ${(0.8 * 4294967296L).toLong}), " +
        "p AS (SELECT lang, doc_id, n_tokens, " +
        "CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) " +
        "AS cum FROM kept) " +
        "SELECT lang, doc_id, n_tokens, " +
        "(cum - n_tokens) // 2048 AS first_seq, " +
        "(cum - 1) // 2048 AS last_seq, " +
        "((cum - 1) // 2048) - ((cum - n_tokens) // 2048) + 1 AS n_seqs " +
        "FROM p ORDER BY lang, doc_id"),
    // CCNet tercile replay: the shared lm chain's per-doc nll, the
    // deterministic (nll, doc_id) per-lang rank, integer tercile split.
    "c7_ppl_filter" ->
      (s"WITH ${TextOps.lmPplRefCtes}, " +
        "j AS (SELECT d.lang, p.doc_id, p.nll " +
        "FROM lmres p JOIN documents d USING (doc_id)), " +
        "r AS (SELECT lang, doc_id, nll, " +
        "CAST(row_number() OVER (PARTITION BY lang ORDER BY nll, doc_id) " +
        "AS BIGINT) AS rk, " +
        "count(*) OVER (PARTITION BY lang) AS n FROM j) " +
        "SELECT lang, doc_id, nll, (3 * (rk - 1)) // n AS bucket, " +
        "((3 * (rk - 1)) // n) <= 1 AS keep " +
        "FROM r ORDER BY lang, doc_id"),
    // V2 replay: the v1 prologue (kept now carries text), the span
    // chain over kept (z-prefixed names — langIdCtes already owns
    // t/s/b), the interval union, Σ-length removed counts, the re-applied
    // effective-length floor, and packing over n_eff.
    "c7_pipeline_v2" ->
      ("WITH base AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks " +
        "FROM documents), " +
        DedupOps.mhChainSql(bands = 4, rows = 16) + ", " +
        "mm AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY band, bucket) " +
        "AS bucket_min FROM mem), " +
        "asg AS (SELECT doc_id, doc_id = min(bucket_min) AS first_copy " +
        "FROM mm GROUP BY doc_id), " +
        TextOps.langIdCtes + ", " +
        "det AS (SELECT doc_id, struct_extract(best, 'code') AS detected_lang FROM b), " +
        "kept AS (SELECT d.lang, d.doc_id, d.text, " +
        "CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens " +
        "FROM documents d JOIN asg USING (doc_id) JOIN det USING (doc_id) " +
        "WHERE asg.first_copy AND det.detected_lang = d.lang " +
        "AND len(string_split(d.text, ' ')) >= 10 " +
        s"AND $bucketSqlDuck < ${(0.8 * 4294967296L).toLong}), " +
        TextOps.ssdupChainOver("kept", "z") + ", " +
        "zsp AS (SELECT d1, d2, diag, min(o1) AS a0, max(o1) AS a1 " +
        "FROM zi GROUP BY d1, d2, diag, isl), " +
        "zrem AS (SELECT DISTINCT d2 AS doc_id, a0 + diag AS s, " +
        "a0 + diag + (a1 - a0 + 16) - 1 AS e FROM zsp), " +
        "zmx AS (SELECT *, max(e) OVER (PARTITION BY doc_id ORDER BY s, e " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe FROM zrem), " +
        "zg AS (SELECT *, sum(CASE WHEN maxe IS NULL OR s > maxe THEN 1 " +
        "ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY s, e) AS grp FROM zmx), " +
        "zmi AS (SELECT doc_id, grp, min(s) AS s, max(e) AS e FROM zg " +
        "GROUP BY doc_id, grp), " +
        "zrm AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS n_removed " +
        "FROM zmi GROUP BY doc_id), " +
        "k2 AS (SELECT kept.lang, kept.doc_id, kept.n_tokens, " +
        "CAST(COALESCE(zrm.n_removed, 0) AS BIGINT) AS n_removed, " +
        "kept.n_tokens - COALESCE(zrm.n_removed, 0) AS n_eff " +
        "FROM kept LEFT JOIN zrm USING (doc_id) " +
        "WHERE kept.n_tokens - COALESCE(zrm.n_removed, 0) >= 10), " +
        "p2 AS (SELECT lang, doc_id, n_tokens, n_removed, n_eff, " +
        "CAST(SUM(n_eff) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) " +
        "AS cum FROM k2) " +
        "SELECT lang, doc_id, n_tokens, n_removed, CAST(n_eff AS BIGINT) AS n_eff, " +
        "(cum - n_eff) // 2048 AS first_seq, " +
        "(cum - 1) // 2048 AS last_seq, " +
        "((cum - 1) // 2048) - ((cum - n_eff) // 2048) + 1 AS n_seqs " +
        "FROM p2 ORDER BY lang, doc_id"),
    // V3 replay: the v1 prologue, the lm-prefixed reference-LM chain
    // (names disjoint by prefix), the per-lang tercile over the kept
    // slice, then v2's z-chain/floor/packing over the ppl-kept
    // survivors.
    "c7_pipeline_v3" ->
      ("WITH base AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks " +
        "FROM documents), " +
        DedupOps.mhChainSql(bands = 4, rows = 16) + ", " +
        "mm AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY band, bucket) " +
        "AS bucket_min FROM mem), " +
        "asg AS (SELECT doc_id, doc_id = min(bucket_min) AS first_copy " +
        "FROM mm GROUP BY doc_id), " +
        TextOps.langIdCtes + ", " +
        "det AS (SELECT doc_id, struct_extract(best, 'code') AS detected_lang FROM b), " +
        "kept AS (SELECT d.lang, d.doc_id, d.text, " +
        "CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens " +
        "FROM documents d JOIN asg USING (doc_id) JOIN det USING (doc_id) " +
        "WHERE asg.first_copy AND det.detected_lang = d.lang " +
        "AND len(string_split(d.text, ' ')) >= 10 " +
        s"AND $bucketSqlDuck < ${(0.8 * 4294967296L).toLong}), " +
        TextOps.lmPplRefCtes + ", " +
        "pj AS (SELECT k.lang, k.doc_id, k.text, k.n_tokens, p.nll " +
        "FROM kept k JOIN lmres p USING (doc_id)), " +
        "pr AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang " +
        "ORDER BY nll, doc_id) AS BIGINT) AS rk, " +
        "count(*) OVER (PARTITION BY lang) AS n FROM pj), " +
        "pk AS (SELECT lang, doc_id, text, n_tokens, nll FROM pr " +
        "WHERE (3 * (rk - 1)) // n <= 1), " +
        TextOps.ssdupChainOver("pk", "z") + ", " +
        "zsp AS (SELECT d1, d2, diag, min(o1) AS a0, max(o1) AS a1 " +
        "FROM zi GROUP BY d1, d2, diag, isl), " +
        "zrem AS (SELECT DISTINCT d2 AS doc_id, a0 + diag AS s, " +
        "a0 + diag + (a1 - a0 + 16) - 1 AS e FROM zsp), " +
        "zmx AS (SELECT *, max(e) OVER (PARTITION BY doc_id ORDER BY s, e " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe FROM zrem), " +
        "zg AS (SELECT *, sum(CASE WHEN maxe IS NULL OR s > maxe THEN 1 " +
        "ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY s, e) AS grp FROM zmx), " +
        "zmi AS (SELECT doc_id, grp, min(s) AS s, max(e) AS e FROM zg " +
        "GROUP BY doc_id, grp), " +
        "zrm AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS n_removed " +
        "FROM zmi GROUP BY doc_id), " +
        "k2 AS (SELECT pk.lang, pk.doc_id, pk.n_tokens, pk.nll, " +
        "CAST(COALESCE(zrm.n_removed, 0) AS BIGINT) AS n_removed, " +
        "pk.n_tokens - COALESCE(zrm.n_removed, 0) AS n_eff " +
        "FROM pk LEFT JOIN zrm USING (doc_id) " +
        "WHERE pk.n_tokens - COALESCE(zrm.n_removed, 0) >= 10), " +
        "p2 AS (SELECT lang, doc_id, n_tokens, nll, n_removed, n_eff, " +
        "CAST(SUM(n_eff) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) " +
        "AS cum FROM k2) " +
        "SELECT lang, doc_id, n_tokens, nll, n_removed, " +
        "CAST(n_eff AS BIGINT) AS n_eff, " +
        "(cum - n_eff) // 2048 AS first_seq, " +
        "(cum - 1) // 2048 AS last_seq, " +
        "((cum - 1) // 2048) - ((cum - n_eff) // 2048) + 1 AS n_seqs " +
        "FROM p2 ORDER BY lang, doc_id"),
    "c7_pack_sequences" ->
      ("SELECT lang, doc_id, n_tokens, " +
        "(cum - n_tokens) // 2048 AS first_seq, " +
        "(cum - 1) // 2048 AS last_seq, " +
        "((cum - 1) // 2048) - ((cum - n_tokens) // 2048) + 1 AS n_seqs " +
        "FROM (SELECT lang, doc_id, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, " +
        "CAST(SUM(len(string_split(text, ' '))) OVER " +
        "(PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS cum " +
        "FROM documents) ORDER BY lang, doc_id"),
    "c7_curate" ->
      (s"WITH ${TextOps.langIdCtes}, " +
        "det AS (SELECT doc_id, struct_extract(best, 'code') AS detected_lang FROM b), " +
        "d2 AS (SELECT d.doc_id, d.lang, det.detected_lang, " +
        "(d.text IS NULL OR d.doc_id = min(d.doc_id) " +
        "OVER (PARTITION BY d.text)) AS first_copy, " +
        "len(string_split(d.text, ' ')) AS n_tokens " +
        "FROM documents d JOIN det ON det.doc_id = d.doc_id) " +
        "SELECT doc_id, lang, detected_lang, first_copy, " +
        "(first_copy AND detected_lang = lang AND n_tokens >= 40) AS keep " +
        "FROM d2 ORDER BY doc_id"),
    "c7_decontaminate" ->
      (s"WITH d AS (SELECT doc_id, $bucketSqlDuck AS bucket, string_split(text, ' ') AS toks " +
        "FROM documents), " +
        "sh AS (SELECT doc_id, bucket, unnest(list_transform(range(1, len(toks) - 2), " +
        "i -> array_to_string(list_slice(toks, i, i + 3), ' '))) AS sh FROM d), " +
        s"te AS (SELECT DISTINCT sh FROM sh WHERE bucket >= ${(0.9 * 4294967296L).toLong}), " +
        s"tr AS (SELECT doc_id, sh FROM sh WHERE bucket < ${(0.8 * 4294967296L).toLong}) " +
        "SELECT doc_id, count(*) AS n_hits, " +
        "CAST(count(DISTINCT sh) AS BIGINT) AS n_shingles_hit " +
        "FROM tr JOIN te USING (sh) GROUP BY doc_id ORDER BY doc_id"),
    "c7_token_budget" ->
      ("SELECT lang, doc_id, n_tokens, cum_tokens FROM (" +
        "SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, " +
        "CAST(SUM(len(string_split(text, ' '))) OVER " +
        "(PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS cum_tokens " +
        "FROM documents) WHERE cum_tokens <= 5000 ORDER BY lang, doc_id"),
    // BPE-priced budget: the c4_bpe_encode chain (word-type pricing)
    // then the same per-lang prefix-sum selection.
    "c7_token_budget_bpe" ->
      (s"WITH RECURSIVE ${TextOps.bpeChainCtes()}, " +
        "enc AS (SELECT word, len(string_split(seq, ' ')) AS n_bpe " +
        s"FROM w${TextOps.BpeRounds}), " +
        "wd AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word " +
        "FROM documents), " +
        "pd AS (SELECT doc_id, CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens " +
        "FROM wd JOIN enc USING (word) WHERE length(word) > 0 GROUP BY doc_id), " +
        "b AS (SELECT d.lang, d.doc_id, " +
        "CAST(COALESCE(pd.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens " +
        "FROM documents d LEFT JOIN pd USING (doc_id)), " +
        "r AS (SELECT lang, doc_id, n_bpe_tokens, " +
        "CAST(SUM(n_bpe_tokens) OVER (PARTITION BY lang ORDER BY doc_id) " +
        "AS BIGINT) AS cum_bpe FROM b) " +
        "SELECT lang, doc_id, n_bpe_tokens, cum_bpe FROM r " +
        "WHERE cum_bpe <= 20000 ORDER BY lang, doc_id"),
    // Substring-decontamination replay: the shared span chain filtered
    // to cross-split pairs, same argmax tie-break via struct max.
    "c7_decontaminate_span" -> {
      // The shared overflow-safe split mulmod ([[knuthBucketSql]]),
      // applied to each side of the span pair.
      val b = (c: String) => s"(${knuthBucketSql(c, "//")})"
      val (lo, hi) = ((0.8 * 4294967296L).toLong, (0.9 * 4294967296L).toLong)
      s"WITH ${TextOps.ssdupChain}, " +
        "sp AS (SELECT d1, d2, min(o1) AS a0, " +
        "CAST(max(o1) - min(o1) + 16 AS INT) AS span_len " +
        "FROM i GROUP BY d1, d2, diag, isl), " +
        s"cx AS (SELECT CASE WHEN ${b("d1")} < $lo THEN d1 ELSE d2 END AS doc_id, " +
        s"CASE WHEN ${b("d1")} < $lo THEN d2 ELSE d1 END AS test_doc, span_len " +
        s"FROM sp WHERE (${b("d1")} < $lo AND ${b("d2")} >= $hi) " +
        s"OR (${b("d1")} >= $hi AND ${b("d2")} < $lo)) " +
        "SELECT doc_id, count(*) AS n_spans, max(span_len) AS max_span_len, " +
        "CAST(sum(span_len) AS BIGINT) AS sum_span_len, " +
        "-struct_extract(max({'s': span_len, 'n': -test_doc}), 'n') " +
        "AS worst_test_doc " +
        "FROM cx GROUP BY doc_id ORDER BY doc_id"
    },
    // Identical SQL to c7_decontaminate by design: the bloom prefilter
    // must not change the result (no false negatives; the exact join
    // removes false positives).
    "c7_decontaminate_bloom" ->
      (s"WITH d AS (SELECT doc_id, $bucketSqlDuck AS bucket, string_split(text, ' ') AS toks " +
        "FROM documents), " +
        "sh AS (SELECT doc_id, bucket, unnest(list_transform(range(1, len(toks) - 2), " +
        "i -> array_to_string(list_slice(toks, i, i + 3), ' '))) AS sh FROM d), " +
        s"te AS (SELECT DISTINCT sh FROM sh WHERE bucket >= ${(0.9 * 4294967296L).toLong}), " +
        s"tr AS (SELECT doc_id, sh FROM sh WHERE bucket < ${(0.8 * 4294967296L).toLong}) " +
        "SELECT doc_id, count(*) AS n_hits, " +
        "CAST(count(DISTINCT sh) AS BIGINT) AS n_shingles_hit " +
        "FROM tr JOIN te USING (sh) GROUP BY doc_id ORDER BY doc_id"),
    // Mixture math replayed verbatim: the only float steps are the
    // 6dp-rounded sqrt (IEEE-identical in both engines), an EXACT
    // decimal normalizing sum, and a fixed left-to-right double
    // expression — so the floor() quotas and the Knuth-bucket selection
    // agree bit-for-bit. kept_idsum pins the selected doc set itself.
    "c7_mix_sources" ->
      ("WITH c AS (SELECT source, count(*) AS n_avail FROM documents GROUP BY source), " +
        "s AS (SELECT source, n_avail, CAST(round(sqrt(n_avail), 6) AS DECIMAL(18,6)) AS sq " +
        "FROM c), " +
        "t AS (SELECT source, n_avail, sq, SUM(sq) OVER () AS tot FROM s), " +
        "q AS (SELECT source, n_avail, " +
        "CAST(floor(300 * CAST(sq AS DOUBLE) / CAST(tot AS DOUBLE)) AS BIGINT) AS quota " +
        "FROM t), " +
        "q2 AS (SELECT *, CAST(floor(4294967296 * least(1.0, " +
        "CAST(quota AS DOUBLE) / n_avail)) AS BIGINT) AS keep_below FROM q), " +
        "k AS (SELECT d.source, count(*) AS n_kept, " +
        "CAST(sum(d.doc_id) AS BIGINT) AS kept_idsum " +
        "FROM documents d JOIN q2 USING (source) " +
        s"WHERE ${knuthBucketSql("d.doc_id", "//")} < keep_below " +
        "GROUP BY d.source) " +
        "SELECT q2.source, q2.n_avail, q2.quota, " +
        "COALESCE(k.n_kept, 0) AS n_kept, COALESCE(k.kept_idsum, 0) AS kept_idsum " +
        "FROM q2 LEFT JOIN k ON q2.source = k.source ORDER BY q2.source"),
    "c7_sample_strat" ->
      (s"SELECT doc_id, lang, source FROM documents " +
        s"WHERE $bucketSqlDuck < CASE WHEN lang = 'en' " +
        s"THEN ${(0.10 * 4294967296L).toLong} ELSE ${(0.40 * 4294967296L).toLong} END " +
        "ORDER BY doc_id"),
    "c7_split_assign" ->
      (s"SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars, " +
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs FROM (" +
        s"SELECT *, CASE WHEN $bucketSqlDuck < ${(0.8 * 4294967296L).toLong} THEN 'train' " +
        s"WHEN $bucketSqlDuck < ${(0.9 * 4294967296L).toLong} THEN 'val' ELSE 'test' END AS split " +
        "FROM documents) GROUP BY split ORDER BY split"),
    // Cluster-safe split: the c2_minhash_cc closure labels (fixed-round
    // min-propagation replay), then the Knuth bucket on cluster_rep —
    // replayed in the engine's overflow-safe 16/16 split-mulmod form
    // (DuckDB would ERROR on the naive int64 overflow Spark wraps).
    "c7_split_cluster_safe" ->
      (s"WITH ${DedupOps.mhBase}, " + DedupOps.closureChainSql("band") + ", " +
        "b AS (SELECT doc_id, cluster_rep, " +
        s"${knuthBucketSql("cluster_rep", "//")} AS bucket FROM cl) " +
        "SELECT doc_id, cluster_rep, " +
        s"CASE WHEN bucket < ${(0.8 * 4294967296L).toLong} THEN 'train' " +
        s"WHEN bucket < ${(0.9 * 4294967296L).toLong} THEN 'val' ELSE 'test' END " +
        "AS split FROM b ORDER BY doc_id")
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c7_sample_strat" -> (c7SampleStrat _),
    "c7_split_assign" -> (c7SplitAssign _),
    "c7_split_cluster_safe" -> (c7SplitClusterSafe _),
    "c7_token_budget" -> ((s: SparkSession, d: String) => c7TokenBudget(s, d)),
    "c7_token_budget_bpe" -> ((s: SparkSession, d: String) => c7TokenBudgetBpe(s, d)),
    "c7_decontaminate" -> ((s: SparkSession, d: String) => c7Decontaminate(s, d)),
    "c7_decontaminate_span" ->
      ((s: SparkSession, d: String) => c7DecontaminateSpan(s, d)),
    "c7_decontaminate_bloom" -> ((s: SparkSession, d: String) => c7DecontaminateBloom(s, d)),
    "c7_curate" -> ((s: SparkSession, d: String) => c7Curate(s, d)),
    "c7_pack_sequences" -> ((s: SparkSession, d: String) => c7PackSequences(s, d)),
    "c7_pipeline" -> ((s: SparkSession, d: String) => c7Pipeline(s, d)),
    "c7_pipeline_v2" -> ((s: SparkSession, d: String) => c7PipelineV2(s, d)),
    "c7_pipeline_v3" -> ((s: SparkSession, d: String) => c7PipelineV3(s, d)),
    "c7_ppl_filter" -> (c7PplFilter _),
    "c7_sample_topk" -> ((s: SparkSession, d: String) => c7SampleTopk(s, d)),
    "c7_mix_sources" -> ((s: SparkSession, d: String) => c7MixSources(s, d)),
    "c7_quality_filter" -> (c7QualityFilter _),
    "c7_dedup_keep_best" -> (c7DedupKeepBest _),
    "c7_curriculum" -> ((s: SparkSession, d: String) => c7Curriculum(s, d)),
    "c7_interleave" -> (c7Interleave _),
    "c7_dataset_card" -> (c7DatasetCard _),
    "c7_dataset_card_v2" -> (c7DatasetCardV2 _),
    "c7_shard_balance" -> ((s: SparkSession, d: String) => c7ShardBalance(s, d)),
    "c7_contamination" -> ((s: SparkSession, d: String) => c7Contamination(s, d)),
    "c7_decontaminate_fuzzy" -> ((s: SparkSession, d: String) => c7DecontaminateFuzzy(s, d)),
    "c7_decontaminate_fuzzy_topc" -> ((s: SparkSession, d: String) => c7DecontaminateFuzzyTopC(s, d)),
    "c7_sample_weighted" -> ((s: SparkSession, d: String) => c7SampleWeighted(s, d)),
    "c7_source_overlap" -> ((s: SparkSession, d: String) => c7SourceOverlap(s, d)),
    "c7_epoch_order" -> ((s: SparkSession, d: String) => c7EpochOrder(s, d))
  )
}
