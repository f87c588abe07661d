package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join (Jaccard >= t), adaptive:
  *
  *  0. **Distinct-set compression** (always): group rows by identical
  *     token set — corpora with duplication collapse before any pairwise
  *     work; results re-expand to row pairs at the end. (Compression also
  *     makes the output stage the only place the full pair multiplicity
  *     exists.)
  *  1. **Dictionary encoding** (always): tokens -> dense ints by ascending
  *     global frequency (one vocab-sized aggregate, shuffle-joined back —
  *     a web corpus's vocabulary is itself billions of tokens, so the
  *     dictionary is never broadcast). All pairwise work is over
  *     ints/longs, never strings.
  *  2. **Strategy pick** (plan-build-time adaptivity, same class as AQE):
  *     - vocab <= 64 and few distinct sets: sets are 64-bit bitmasks;
  *       candidate generation is a broadcast nested-loop over distinct
  *       masks with `bit_count(a & b)` verification — pure whole-stage
  *       codegen, zero shuffle in the pairwise stage.
  *     - otherwise: **prefix-filtered** inverted-index join (Vernica et
  *       al. / PPJoin family, cf. PAPERS.md): index only each set's
  *       ⌊(1−t)·|s|⌋+1 rarest tokens — two sets with J ≥ t must share a
  *       prefix token (if all of a∩b sat outside a's prefix, the suffix's
  *       ⌈t·|a|⌉−1 slots could not hold |a∩b| ≥ t·|a| tokens), so the
  *       join loses no pairs while buckets shrink to "sets whose PREFIX
  *       holds the token".
  *
  * The reference engine cannot express any of this (string-KV MapReduce
  * only); a tMapReduce user would ship it as a `.so`
  * (`/root/reference/src/tmapreduce/mrf.h:9-11`).
  *
  * Scale: the expensive stages shuffle int/long rows keyed by token id or
  * set id; the only O(output) stage is the final expansion. At 100 TB with
  * a realistic vocabulary the prefix path engages automatically, and its
  * buckets are bounded by prefix (not full-set) membership.
  */
object SetSimJoin {

  /** The shared set-level core: the persisted distinct-set table and the
    * qualified (Jaccard >= threshold) DISTINCT-SET pairs, pre-expansion.
    * `sets` stays persisted — the caller must route it through
    * CacheScope.releaseAfterMaterialize on whatever frame it returns.
    */
  private final case class SetStage(sets: DataFrame, qualified: DataFrame)

  /** All pairs `(a_id, b_id, common, jaccard)` with token-set Jaccard >=
    * `threshold`. `tokens` must be duplicate-free per row (e.g.
    * `array_distinct(split(...))`).
    */
  def jaccardSelfJoin(
      df: DataFrame,
      id: Column,
      tokens: Column,
      threshold: Double,
      maxBroadcastSets: Long = 20000L): DataFrame = {
    val stage = buildSetStage(df, id, tokens, threshold, maxBroadcastSets)
    val sets = stage.sets
    val qualified = stage.qualified

    // 3. Expansion. Inter-set: x_docs × y_docs (sets distinct => each doc
    // pair appears exactly once; normalize order). Intra-set: ordered
    // member pairs of each duplicated set at jaccard 1.0.
    val inter = qualified
      .select(explode(col("x_docs")).as("da"), col("y_docs"), col("common"), col("jaccard"))
      .select(col("da"), explode(col("y_docs")).as("db"), col("common"), col("jaccard"))
      .select(least(col("da"), col("db")).as("a_id"),
        greatest(col("da"), col("db")).as("b_id"), col("common"), col("jaccard"))

    val intraPairs = sets.filter(size(col("docs")) >= 2)
      .select(col("n"), col("docs"), posexplode(col("docs")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "a_id")
      .select(col("n"), col("a_id"), explode(slice(col("docs"), col("i") + 2, size(col("docs")))).as("b_id"))
      .select(col("a_id"), col("b_id"), col("n").cast("long").as("common"), lit(1.0).as("jaccard"))

    // `sets` is read by both the pair stage and the intra-set expansion at
    // materialization time; CacheScope releases it after that action.
    graft.util.CacheScope.releaseAfterMaterialize(
      inter.unionByName(intraPairs), Seq(sets))
  }

  /** ASYMMETRIC near-containment pairs: ordered `(a_id, b_id, common,
    * containment)` where containment(A→B) = |A∩B| / |A| ≥ tNum/tDen and
    * |A| ≥ `minTokens` — the quote-/subset-inclusion detector Jaccard
    * cannot see (a doc pasted inside a much larger one has high
    * containment but low Jaccard, since the union is dominated by B).
    * The threshold is an exact rational (`common·tDen ≥ tNum·|A|` in
    * int64), so the cut is bit-portable to the oracle.
    *
    * Candidate generation is the containment-specific prefix filter: if
    * B misses ALL of A's `|A| − ⌈t·|A|⌉ + 1` rarest tokens, then
    * |A∩B| ≤ ⌈t·|A|⌉ − 1 < t·|A| — so A explodes only that prefix
    * (rarest-first ids make it selective) against B's FULL posting
    * list (B cannot be prefix-filtered: it may be arbitrarily larger
    * than A). The inverted index is O(Σ|set|) rows — linear — and
    * candidates are bounded by the document frequency of A's rare
    * prefix tokens; the degenerate case (a doc of only corpus-hot
    * tokens) is the standard prefix-filter caveat, shared with the
    * Jaccard form.
    */
  def containmentSelfJoin(
      df: DataFrame,
      id: Column,
      tokens: Column,
      tNum: Int = 9,
      tDen: Int = 10,
      minTokens: Int = 10,
      maxMaskSets: Long = 100000L): DataFrame = {
    val st = buildSetTable(df, id, tokens)
    val sets = st.sets
    val interSet = containmentSetPairs(st, tNum, tDen, minTokens, maxMaskSets)
    val inter = interSet
      .join(sets.select(col("set_id").as("x_set"), col("docs").as("x_docs")),
        "x_set")
      .join(sets.select(col("set_id").as("y_set"), col("docs").as("y_docs")),
        "y_set")
      .select(explode(col("x_docs")).as("a_id"), col("y_docs"),
        col("common"), col("x_n"))
      .select(col("a_id"), explode(col("y_docs")).as("b_id"),
        col("common"), col("x_n"))
    // identical token sets: containment 1 in BOTH directions for every
    // ordered member pair (the asymmetric twin of the intra-set
    // expansion)
    val intra = sets.filter(size(col("docs")) >= 2 && col("n") >= minTokens)
      .select(col("n"), explode(col("docs")).as("a_id"), col("docs"))
      .select(col("a_id"), explode(col("docs")).as("b_id"),
        col("n").cast("long").as("common"), col("n").as("x_n"))
      .filter(col("a_id") =!= col("b_id"))
    graft.util.CacheScope.releaseAfterMaterialize(
      inter.unionByName(intra)
        .withColumn("containment",
          round(col("common").cast("double") / col("x_n").cast("double"), 6))
        .drop("x_n"),
      Seq(sets))
  }

  /** Per-doc BEST-CONTAINER assignment — the O(n)-output companion of
    * [[containmentSelfJoin]]: for every doc, whether some other doc
    * ≥t-contains it, and the best container (highest containment,
    * smallest doc id on ties). Computed at the SET level before any doc
    * expansion: containment is a property of the two token SETS, and
    * every member of a container set is a container, so the doc-level
    * tie-break `min b_id` inside a set is the set's minimum member =
    * its set_id — the best pick reduces to ONE partial aggregate
    * `min(struct(-containment, y_set))` over the O(qualified set pairs)
    * stream. The pair-expanded form (explode x_docs × y_docs, then
    * re-aggregate per doc) shuffles the full doc-pair multiplicity
    * through the agg only to collapse it again — Ω(doc pairs) where
    * this is Ω(set pairs); on a duplicate-saturated corpus that gap is
    * the difference between linear and quadratic shuffle volume.
    */
  def containmentBestAssign(
      df: DataFrame,
      id: Column,
      tokens: Column,
      tNum: Int = 9,
      tDen: Int = 10,
      minTokens: Int = 10,
      maxMaskSets: Long = 100000L): DataFrame = {
    val st = buildSetTable(df, id, tokens)
    val sets = st.sets
    val setBest = containmentSetPairs(st, tNum, tDen, minTokens, maxMaskSets)
      .withColumn("containment",
        round(col("common").cast("double") / col("x_n").cast("double"), 6))
      .groupBy(col("x_set").as("set_id"))
      .agg(min(struct((-col("containment")).as("nc"),
        col("y_set").as("bid"))).as("ib"))
    // Per-doc intra candidate: members of a duplicated set (n ≥
    // minTokens) contain each other at containment exactly 1.0; the
    // best (smallest-id) other member is docs[0] — or docs[1] for the
    // set's own minimum. Every doc appears in exactly one set, so this
    // explode IS the full output frame (no corpus re-join needed).
    val mem = sets
      .select(col("set_id"), col("n"), col("docs"),
        explode(col("docs")).as("doc_id"))
      .withColumn("intra_b",
        when(size(col("docs")) >= 2 && col("n") >= minTokens,
          when(col("doc_id") === element_at(col("docs"), 1),
            element_at(col("docs"), 2))
            .otherwise(element_at(col("docs"), 1))))
    val out = mem.join(setBest, Seq("set_id"), "left")
      .withColumn("intra_s",
        when(col("intra_b").isNotNull,
          struct(lit(-1.0).as("nc"), col("intra_b").as("bid"))))
      // least() skips nulls: inter-only, intra-only, and both-present
      // docs all resolve without branching; both-null stays null
      // (= not contained).
      .withColumn("b", least(col("intra_s"), col("ib")))
      .select(col("doc_id"), col("b.bid").isNotNull.as("is_contained"),
        col("b.bid").as("container_id"), (-col("b.nc")).as("containment"))
    graft.util.CacheScope.releaseAfterMaterialize(out, Seq(sets))
  }

  /** SET-level qualified near-containment pairs `(x_set, y_set, common,
    * x_n)` with |x∩y|·tDen ≥ x_n·tNum, x ≠ y, x_n ≥ minTokens — the
    * shared core of [[containmentSelfJoin]] (which expands to doc
    * pairs) and [[containmentBestAssign]] (which aggregates before
    * expanding). Strategy pick mirrors the Jaccard stage's plan-build-
    * time adaptivity:
    *
    *  - vocab ≤ 64 and ≤ `maxMaskSets` distinct sets: 64-bit bitmask
    *    broadcast nested-loop with `bit_count(x & y)` — pure
    *    whole-stage codegen, zero shuffle in the pairwise stage, and —
    *    decisive here — IMMUNE to duplicate saturation: the
    *    degenerate corpora where every posting list is corpus-sized
    *    (so the prefix filter prunes nothing and the candidate set
    *    goes quadratic; measured: OOM at the 8 g bench heap on the
    *    dense sf1 clique corpus) are exactly the small-vocabulary
    *    ones, and the mask loop's cost is distinct-set pairs with NO
    *    per-candidate shuffle or array re-attach.
    *  - otherwise: the containment-specific prefix filter (contained
    *    side explodes its |A|−⌈t·|A|⌉+1 rarest tokens against the
    *    linear inverted index). The candidate re-attach joins carry
    *    the token-id arrays and are HINTED sort-merge: on an
    *    adversarial (big-vocab AND saturated) corpus the candidate
    *    stream must degrade to disk-backed sort spill, never to a
    *    shuffle-hash build that dies on heap (measured cost of the
    *    hint on realistic-density sparse sf1: within run-to-run
    *    noise, ~1 s on a ~14 s query).
    */
  private def containmentSetPairs(
      st: SetTable,
      tNum: Int,
      tDen: Int,
      minTokens: Int,
      maxMaskSets: Long): DataFrame = {
    val SetTable(sets, vocabSize, nSets) = st
    if (vocabSize <= 64 && nSets <= maxMaskSets) {
      val masked = sets.withColumn("mask",
        aggregate(col("ids"), lit(0L),
          (acc, i) => acc.bitwiseOR(call_function("shiftleft", lit(1L), i))))
      val x = masked.filter(col("n") >= minTokens)
        .select(col("set_id").as("x_set"), col("n").as("x_n"),
          col("mask").as("x_mask"))
      val y = masked
        .select(col("set_id").as("y_set"), col("n").as("y_n"),
          col("mask").as("y_mask"))
      // qualification entirely inside the join condition: only
      // qualified pairs ever materialize as rows
      x.join(broadcast(y),
          col("x_set") =!= col("y_set") &&
            col("y_n") * tDen >= col("x_n") * tNum &&
            bit_count(col("x_mask").bitwiseAND(col("y_mask"))) * tDen >=
              col("x_n") * tNum)
        .withColumn("common",
          bit_count(col("x_mask").bitwiseAND(col("y_mask"))).cast("long"))
        .select("x_set", "y_set", "common", "x_n")
    } else {
      // contained-side prefix: n − ceil(t·n) + 1 rarest token ids
      val xpref = sets.filter(col("n") >= minTokens)
        .select(col("set_id").as("x_set"), col("n").as("x_n"),
          explode(expr(
            s"slice(ids, 1, n - ((n * $tNum + ${tDen - 1}) div $tDen) + 1)"))
            .as("tok_id"))
      val yall = sets
        .select(col("set_id").as("y_set"), col("n").as("y_n"),
          explode(col("ids")).as("tok_id"))
      // all sides corpus-sized — no explicit broadcast (PlanAuditSpec
      // pins the static plan; runtime AQE may still broadcast on
      // measured-size evidence, the correct call at every scale)
      val cand = xpref.join(yall, Seq("tok_id"))
        .filter(col("x_set") =!= col("y_set"))
        // length filter: |A∩B| ≥ t·|A| needs |B| ≥ t·|A|
        .filter(col("y_n") * tDen >= col("x_n") * tNum)
        .select("x_set", "y_set").distinct()
      val full = sets.select(col("set_id"), col("ids"), col("n"))
      cand
        .join(full.toDF("x_set", "x_ids", "x_n").hint("merge"), "x_set")
        .join(full.toDF("y_set", "y_ids", "y_n").hint("merge"), "y_set")
        .withColumn("common",
          size(array_intersect(col("x_ids"), col("y_ids"))).cast("long"))
        .filter(col("common") * tDen >= col("x_n") * tNum)
        .select("x_set", "y_set", "common", "x_n")
    }
  }

  /** The threshold-independent prefix of the machinery: the persisted
    * distinct-set table (rarity-ordered dense token ids, member doc
    * lists) plus vocabulary/set counts. Shared by the Jaccard stage and
    * [[containmentSelfJoin]], whose prefix filters differ.
    */
  private final case class SetTable(sets: DataFrame, vocabSize: Long, nSets: Long)

  private def buildSetStage(
      df: DataFrame,
      id: Column,
      tokens: Column,
      threshold: Double,
      maxBroadcastSets: Long): SetStage = {
    val st = buildSetTable(df, id, tokens)
    buildPairsStage(st, threshold, maxBroadcastSets)
  }

  private def buildSetTable(
      df: DataFrame,
      id: Column,
      tokens: Column): SetTable = {
    val base = df.select(id.as("doc_id"), tokens.as("toks"))

    // 1. Dictionary: token -> dense int id, rarest first. Global dense
    // rank WITHOUT a single-partition window (which would serialize a
    // 100 TB corpus's vocabulary through one task): range-partition by
    // (freq, tok), number within each (already range-ordered) partition,
    // and add the per-partition row-count prefix offsets — the standard
    // scalable zip-with-index construction. Order, and therefore every
    // tok_id, is identical to a global row_number over (freq, tok).
    // Persisted for the duration of the dictionary phase: the small-vocab
    // probe below and (on the big-vocab path) the zip-index construction
    // both read it — one full-corpus token scan, not two.
    val freq = base
      .select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Small-vocab probe: TakeOrdered(65) over the frequency table — a
    // linear per-partition top-k + driver merge, no extra shuffle, cheap
    // at any scale. A ≤64-token vocabulary (the same regime where the
    // bitmask pair strategies engage) gets a DRIVER-LITERAL dictionary:
    // ids are positions in the (freq, tok)-ordered 64-row list —
    // bit-identical to the zip-with-index construction's global
    // row_number (same ordering, computed by the same engine) — and the
    // encode becomes a pure array_position expression, dropping the
    // range-partition, per-partition window, offset join and
    // vocab-sized encode join the scalable path needs. On a real
    // (big-vocab) corpus the probe's 65 rows come back instantly and
    // the scalable machinery below runs unchanged.
    val head65 = freq.orderBy(col("freq"), col("tok")).limit(65)
      .collect().map(_.getString(0))
    val session = df.sparkSession
    import session.implicits._

    // nonEmpty guard: a zero-arg array() literal is ARRAY<NULL> and
    // array_position over it fails analysis — the (already
    // empty-tolerant) scalable branch handles the empty corpus.
    val (encodedRows, vocabSize, dictPersists) =
      if (head65.nonEmpty && head65.length <= 64) {
        freq.unpersist(blocking = false)
        val vlit = array(head65.map(lit).toIndexedSeq: _*)
        val enc = base
          .select(col("doc_id"), explode(col("toks")).as("tok"))
          .withColumn("tok_id",
            (array_position(vlit, col("tok")) - 1).cast("int"))
          .groupBy("doc_id")
          .agg(sort_array(collect_list(col("tok_id"))).as("ids"))
        (enc, head65.length.toLong, Seq.empty[DataFrame])
      } else {
        val ranged = freq
          .repartitionByRange(col("freq"), col("tok"))
          .sortWithinPartitions("freq", "tok")
          .withColumn("pid", spark_partition_id())
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // Tiny driver-side action: one (pid, count) row per partition.
        val partCounts = ranged.groupBy("pid").count()
          .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
        val offsets = partCounts.map(_._2).scanLeft(0L)(_ + _)
        val offsetDf = partCounts.map(_._1).zip(offsets).toSeq.toDF("pid", "offset")
        val wPart = Window.partitionBy(col("pid")).orderBy(col("freq"), col("tok"))
        // Persisted: consumed by the encode join (vocab-sized; persisting
        // avoids a second full-corpus frequency scan when the join reads
        // it). broadcast(offsetDf) is one tiny driver-built row per
        // partition — NOT the dictionary.
        val dict = ranged
          .withColumn("idx", row_number().over(wPart) - 1)
          .join(broadcast(offsetDf), "pid")
          .withColumn("tok_id", (col("offset") + col("idx")).cast("int"))
          .select("tok", "tok_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // The encode step shuffle-joins (doc, token) rows against the
        // dictionary on the token: the dictionary scales with the
        // vocabulary (10^9+ distinct tokens on a web corpus), so
        // broadcasting it would OOM every executor long before the
        // corpus itself is a problem.
        val enc = base
          .select(col("doc_id"), explode(col("toks")).as("tok"))
          .join(dict.hint("shuffle_hash"), "tok")
          .groupBy("doc_id")
          .agg(sort_array(collect_list(col("tok_id"))).as("ids"))
        (enc, offsets.last, Seq(freq, ranged, dict))
      }

    // 0.+1. Distinct sets with member lists, ids ascending (= rarity order).
    // Persisted: this subtree (tokenize → encode → two aggregations) is
    // consumed by the strategy-pick count, both join sides, and the
    // intra-set expansion — without a persist it re-executes ~4×. The
    // distinct-set table is corpus-compressed (tiny relative to input), so
    // caching it is safe at any scale; MEMORY_AND_DISK spills if not.
    val sets = encodedRows
      .groupBy("ids")
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .withColumn("set_id", element_at(col("docs"), 1)) // min doc = stable set id
      .withColumn("n", size(col("ids")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSets = sets.count() // distinct-set-count action (also fills the cache)
    // The count above materialized `sets`, so the dictionary stages feeding
    // it are spent — release them now instead of leaking them past return.
    dictPersists.foreach(_.unpersist(blocking = false))
    SetTable(sets, vocabSize, nSets)
  }

  private def buildPairsStage(
      st: SetTable,
      threshold: Double,
      maxBroadcastSets: Long): SetStage = {
    val SetTable(sets, vocabSize, nSets) = st

    // 2. Exact distinct-set pairs (x_set < y_set) with common/jaccard.
    val setPairs: DataFrame =
      if (vocabSize <= 64 && nSets <= maxBroadcastSets) {
        val masked = sets.withColumn("mask",
          aggregate(col("ids"), lit(0L),
            (acc, i) => acc.bitwiseOR(call_function("shiftleft", lit(1L), i))))
          .select(col("set_id"), col("n"), col("mask"), col("docs"))
        val x = masked.toDF("x_set", "x_n", "x_mask", "x_docs")
        val y = masked.toDF("y_set", "y_n", "y_mask", "y_docs")
        x.join(broadcast(y), col("x_set") < col("y_set"))
          .withColumn("common",
            bit_count(col("x_mask").bitwiseAND(col("y_mask"))).cast("long"))
      } else {
        val withPrefix = sets.withColumn("prefix",
          slice(col("ids"), lit(1),
            (floor(lit(1.0 - threshold) * col("n")) + 1).cast("int")))
        val x = withPrefix.select(col("set_id").as("x_set"), col("n").as("x_n"),
          explode(col("prefix")).as("tok_id"))
        val y = withPrefix.select(col("set_id").as("y_set"), col("n").as("y_n"),
          explode(col("prefix")).as("tok_id"))
        val candidates = x.join(y, Seq("tok_id"))
          .filter(col("x_set") < col("y_set"))
          // Length filter: J >= t requires t·|x| <= |y| and t·|y| <= |x|.
          .filter(col("y_n") >= ceil(lit(threshold) * col("x_n")) &&
            col("x_n") >= ceil(lit(threshold) * col("y_n")))
          .select("x_set", "y_set").distinct()
        val full = sets.select(col("set_id"), col("ids"), col("n"), col("docs"))
        candidates
          .join(full.toDF("x_set", "x_ids", "x_n", "x_docs"), "x_set")
          .join(full.toDF("y_set", "y_ids", "y_n", "y_docs"), "y_set")
          .withColumn("common",
            size(array_intersect(col("x_ids"), col("y_ids"))).cast("long"))
      }

    val qualified = setPairs
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("x_n") + col("y_n") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("x_set"), col("y_set"), col("x_docs"), col("y_docs"),
        col("common"), round(col("jaccard"), 6).as("jaccard"))

    SetStage(sets, qualified)
  }

  /** Per-doc top-`m` nearest neighbors `(doc_id, nbr_id, common, jaccard,
    * rk)` among pairs with Jaccard >= `threshold` — the bounded-output
    * companion to [[jaccardSelfJoin]]: the full pair list is Ω(output)
    * and on a self-similar corpus output is quadratic in the duplication
    * density (197 M pairs at sf1), while a curation caller almost always
    * wants "each doc's closest m neighbors". Output here is <= m rows per
    * doc at ANY duplication density. Ordering is total and deterministic:
    * jaccard descending, then neighbor id ascending.
    *
    * Scale shape — nothing materializes a per-doc (or per-set) full
    * neighbor list:
    *  - set-level candidates go through [[graft.functions.TopKAggregator]]
    *    (bounded heap, map-side combine): the shuffle after partial
    *    aggregation is O(sets · m), not O(set pairs);
    *  - keeping the top-m neighbor SETS per set (jaccard desc, then
    *    min-member asc) is lossless for doc-level top-m: at any tie the
    *    m kept sets' minimum members each precede every member of any
    *    dropped set in the (jaccard desc, id asc) order, so >= m
    *    candidates dominate everything dropped. Within a kept set only
    *    its m smallest members can ever rank, so neighbor docs are
    *    sliced to m;
    *  - every doc then ranks <= m + m² local candidates (its own set's
    *    first m duplicates at jaccard 1.0 plus m sets × m docs), so the
    *    final window sorts a BOUNDED per-doc list — never the corpus.
    */
  def jaccardTopM(
      df: DataFrame,
      id: Column,
      tokens: Column,
      threshold: Double,
      m: Int,
      maxBroadcastSets: Long = 20000L): DataFrame = {
    val stage = buildSetStage(df, id, tokens, threshold, maxBroadcastSets)
    val sets = stage.sets
    val session = df.sparkSession
    import session.implicits._

    // Symmetric set-level candidate stream (ids + jaccard only — an
    // 8-byte-keyed row, never the member lists), folded to top-m neighbor
    // sets per set by the bounded-heap Aggregator. Ties at equal jaccard
    // break on the neighbor's set id = its minimum member id. Both
    // directions come out of ONE Generate over the pair stream — a union
    // of two selects would re-execute the whole candidate join per branch.
    val sym = stage.qualified
      .select(explode(array(
        struct(col("x_set").as("set_id"), col("jaccard"), col("y_set").as("nbr_set")),
        struct(col("y_set").as("set_id"), col("jaccard"), col("x_set").as("nbr_set"))))
        .as("e"))
      .select(col("e.set_id"), col("e.jaccard"), col("e.nbr_set"))
    val topAgg = new graft.functions.TopKAggregator[(Long, Double, Long)](
      m, _._2, _._3)
    val topSets = sym.as[(Long, Double, Long)]
      .groupByKey(_._1)
      .agg(topAgg.toColumn.name("top"))
      .toDF("set_id", "top")
      .select(col("set_id"), explode(col("top")).as("e"))
      .select(col("set_id"), col("e._1").as("jaccard"), col("e._2").as("nbr_set"))

    // Re-attach member lists for the selected O(sets·m) pairs and expand:
    // every member of the set sees the neighbor set's first m members.
    // Shuffle-hash joins on set id — `sets` is corpus-sized, never
    // broadcast; `common` is recomputed from the two int arrays (cheap on
    // the bounded selection; avoids shuffling it through the heap).
    val nbrSide = sets.select(col("set_id").as("nbr_set"),
      col("ids").as("nbr_ids"), slice(col("docs"), 1, m).as("nbr_docs"))
    val ownSide = sets.select(col("set_id"), col("ids"), col("docs"))
    val interDocs = topSets
      .join(nbrSide.hint("shuffle_hash"), "nbr_set")
      .join(ownSide.hint("shuffle_hash"), "set_id")
      .withColumn("common", size(array_intersect(col("ids"), col("nbr_ids"))).cast("long"))
      .select(explode(col("docs")).as("doc_id"), col("nbr_docs"),
        col("common"), col("jaccard"))
      .select(col("doc_id"), explode(col("nbr_docs")).as("nbr_id"),
        col("common"), col("jaccard"))

    // Intra-set duplicates: each member's jaccard-1.0 neighbors are its
    // set's OTHER members, id ascending — only the first m+1 members can
    // ever rank, so a mega-duplicate set contributes m+1 candidate rows
    // per member, not |set|.
    val intraDocs = sets.filter(size(col("docs")) >= 2)
      .select(col("n"), slice(col("docs"), 1, m + 1).as("cand"),
        explode(col("docs")).as("doc_id"))
      .select(col("doc_id"), explode(col("cand")).as("nbr_id"),
        col("n").cast("long").as("common"), lit(1.0).as("jaccard"))
      .filter(col("nbr_id") =!= col("doc_id"))

    // Final per-doc rank over the BOUNDED (<= m + m²) local candidates.
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("jaccard").desc, col("nbr_id").asc)
    val ranked = intraDocs.unionByName(interDocs)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= m)
      .select("doc_id", "nbr_id", "common", "jaccard", "rk")
    graft.util.CacheScope.releaseAfterMaterialize(ranked, Seq(sets))
  }
}
