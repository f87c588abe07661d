package graft.dedup

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** MinHash-LSH and SimHash vs brute-force ground truth on a small corpus
  * with known near-duplicate structure.
  */
class DedupSpec extends SparkSuite {

  private def corpus = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    Seq(
      (1L, base),
      (2L, base), // exact dup of 1
      (3L, base.replace("today", "tomorrow")), // near dup of 1 (1 token of 13)
      (4L, "completely different words about spark catalyst optimizer and shuffles"),
      (5L, "another unrelated document mentioning parquet columnar storage formats"),
      (6L, base.replace("quick", "slow").replace("lazy", "busy")) // moderate overlap
    ).toDF("doc_id", "text")
  }

  private def exactJaccard(threshold: Double): Set[(Long, Long)] = {
    val toks = corpus.select(col("doc_id"), MinHash.tokenSet(col("text")).as("t"))
    val a = toks.select(col("doc_id").as("a_id"), col("t").as("a_t"))
    val b = toks.select(col("doc_id").as("b_id"), col("t").as("b_t"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("common", size(array_intersect(col("a_t"), col("b_t"))))
      .withColumn("j", col("common").cast("double") /
        (size(col("a_t")) + size(col("b_t")) - col("common")).cast("double"))
      .filter(col("j") >= threshold)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("MinHash LSH finds all high-Jaccard pairs, no false positives above threshold") {
    val got = MinHash.nearDuplicates(
      corpus, col("doc_id"), col("text"), numHashes = 64, bands = 32, threshold = 0.5)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = exactJaccard(0.5)
    // Exact-Jaccard confirmation runs on candidates, so got ⊆ want always;
    // with 32 bands of 2 rows, P(miss at j>=0.5) < (1-0.25)^32 ≈ 1e-4.
    assert(got == want)
    assert(want.contains((1L, 2L)) && want.contains((1L, 3L)) && want.contains((2L, 3L)))
  }

  test("MinHash signature estimates Jaccard") {
    import spark.implicits._
    val sigs = corpus
      .select(col("doc_id"), MinHash.signature(MinHash.tokenSet(col("text")), 256).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    def est(a: Long, b: Long) =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / 256
    assert(est(1L, 2L) == 1.0) // identical docs, identical signatures
    assert(est(1L, 3L) > 0.7) // 12/14 token Jaccard ≈ 0.857
    assert(est(1L, 4L) < 0.3) // disjoint-ish
  }

  test("SimHash: identical docs at Hamming 0; unrelated docs far apart") {
    import spark.implicits._
    val fps = corpus
      .select(col("doc_id"), SimHash.fingerprint(MinHash.tokenSet(col("text"))).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fps(a) ^ fps(b))
    assert(ham(1L, 3L) < ham(1L, 4L))
    assert(ham(1L, 4L) > 8)
  }

  test("SetSimJoin prefix filtering loses no pairs vs brute force") {
    for (t <- Seq(0.5, 0.8)) {
      val got = SetSimJoin.jaccardSelfJoin(
        corpus, col("doc_id"), MinHash.tokenSet(col("text")), t)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == exactJaccard(t), s"threshold $t")
    }
  }

  test("SetSimJoin matches brute force on real testdata (sf0.001 documents)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val toks = docs.select(col("doc_id"), MinHash.tokenSet(col("text")).as("t"))
    val a = toks.select(col("doc_id").as("a_id"), col("t").as("a_t"))
    val b = toks.select(col("doc_id").as("b_id"), col("t").as("b_t"))
    val want = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("common", size(array_intersect(col("a_t"), col("b_t"))))
      .withColumn("j", col("common").cast("double") /
        (size(col("a_t")) + size(col("b_t")) - col("common")).cast("double"))
      .filter(col("j") >= 0.8)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SetSimJoin.jaccardSelfJoin(
      docs, col("doc_id"), MinHash.tokenSet(col("text")), 0.8)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("SetSimJoin prefix-filter path == bitmask path on the real corpus") {
    // The corpus vocab (31 words) always selects the bitmask strategy;
    // forcing maxBroadcastSets = 0 drives the same input down the
    // prefix-filtered inverted-index path — the 100 TB strategy — which
    // must produce the identical pair set WITH identical common/jaccard.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    def run(maxSets: Long) = SetSimJoin.jaccardSelfJoin(
      docs, col("doc_id"), MinHash.tokenSet(col("text")), 0.8, maxBroadcastSets = maxSets)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val bitmask = run(20000L)
    val prefix = run(0L)
    assert(prefix === bitmask)
    assert(bitmask.nonEmpty)
  }

  test("containment: prefix-filter path == bitmask path (pairs AND best assignment)") {
    // Same strategy-equivalence pin for the asymmetric containment
    // family: the ≤64-token corpus selects the bitmask path; forcing
    // maxMaskSets = 0 drives the identical input down the
    // prefix-filtered inverted-index path (the big-vocabulary 100 TB
    // strategy), which must yield the identical pair set and the
    // identical per-doc best-container assignment.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val toks = array_distinct(split(col("text"), " "))
    def pairs(maxSets: Long) = SetSimJoin.containmentSelfJoin(
      docs, col("doc_id"), toks, maxMaskSets = maxSets)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    def best(maxSets: Long) = SetSimJoin.containmentBestAssign(
      docs, col("doc_id"), toks, maxMaskSets = maxSets)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) None else Some((r.getLong(2), r.getDouble(3))))).toSet
    val maskPairs = pairs(100000L)
    assert(pairs(0L) === maskPairs)
    assert(maskPairs.nonEmpty)
    val maskBest = best(100000L)
    assert(best(0L) === maskBest)
    assert(maskBest.exists(_._2), "no contained doc on the real corpus?")
  }

  /** Per-doc top-m ground truth derived from the (already verified) full
    * pair list: symmetrize, sort by (jaccard desc, nbr asc), take m.
    */
  private def bruteTopM(pairs: Array[(Long, Long, Long, Double)], m: Int)
      : Set[(Long, Long, Long, Double, Long)] =
    pairs.flatMap { case (a, b, c, j) => Seq((a, b, c, j), (b, a, c, j)) }
      .groupBy(_._1).iterator.flatMap { case (doc, ns) =>
        ns.sortBy(n => (-n._4, n._2)).take(m).zipWithIndex
          .map { case ((_, nbr, c, j), i) => (doc, nbr, c, j, i + 1L) }
      }.toSet

  test("jaccardTopM == per-doc truncation of the full pair list (real corpus)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val full = SetSimJoin.jaccardSelfJoin(
      docs, col("doc_id"), MinHash.tokenSet(col("text")), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    for (m <- Seq(1, 3)) {
      val got = SetSimJoin.jaccardTopM(
        docs, col("doc_id"), MinHash.tokenSet(col("text")), 0.8, m)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
        .toSet
      assert(got == bruteTopM(full, m), s"m=$m")
      assert(got.nonEmpty)
    }
  }

  test("jaccardTopM output is bounded at any duplication density") {
    import spark.implicits._
    // One mega-duplicate set (12 identical docs — far more than m), one
    // near-dup pair attached to it, one isolated doc: per-doc output must
    // cap at m with intra neighbors = the m smallest OTHER member ids.
    val base = (0 until 20).map(i => s"t$i").mkString(" ")
    val near = (0 until 19).map(i => s"t$i").mkString(" ") // J = 19/20 = 0.95
    val docs = ((1L to 12L).map(i => (i, base)) ++
      Seq((50L, near), (99L, "isolated vocabulary island document")))
      .toDF("doc_id", "text")
    val m = 3
    val got = SetSimJoin.jaccardTopM(
      docs, col("doc_id"), MinHash.tokenSet(col("text")), 0.8, m)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val perDoc = got.groupBy(_._1)
    assert(perDoc.values.forall(_.length <= m), "a doc exceeded m neighbors")
    assert(!perDoc.contains(99L), "isolated doc must have no neighbors")
    // doc 5's top-3: duplicates 1,2,3 at jaccard 1.0 (ids ascending)
    assert(perDoc(5L).sortBy(_._5).map(x => (x._2, x._4)).toSeq ==
      Seq((1L, 1.0), (2L, 1.0), (3L, 1.0)))
    // doc 50's top-3: jaccard-0.95 links into the mega set, smallest ids
    assert(perDoc(50L).sortBy(_._5).map(_._2).toSeq == Seq(1L, 2L, 3L))
    assert(perDoc(50L).forall(_._4 == 0.95))
    // the engine agrees with the brute-force truncation here too
    val full = SetSimJoin.jaccardSelfJoin(
      docs, col("doc_id"), MinHash.tokenSet(col("text")), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSet == bruteTopM(full, m))
  }

  test("MinHash dedupAssignments: exact duplicates collapse to one kept doc") {
    val asg = MinHash.dedupAssignments(corpus, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = asg.map(a => a._1 -> a).toMap
    // docs 1 and 2 are identical → same cluster rep, only doc 1 kept.
    assert(byId(1L)._2 == byId(2L)._2)
    assert(byId(1L)._3 && !byId(2L)._3)
    // reps are self-kept or point to a smaller id.
    asg.foreach { case (id, rep, kept) =>
      assert(rep <= id)
      assert(kept == (rep == id))
    }
  }

  /** Union-find ground truth over an edge set. */
  private def bruteCC(nodes: Seq[Long], edges: Iterable[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map { n =>
      // component rep = min member; path-compress via repeated find
      var r = find(n)
      while (parent(r) != r) r = parent(r)
      n -> r
    }.toMap
  }

  test("CC closure == brute-force transitive closure of the LSH bucket graph (real corpus)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    // Ground truth: union-find over the SAME bucket graph the operator sees.
    val mem = MinHash.memberships(docs, col("doc_id"), col("text"), 64, 16)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
    val nodes = mem.map(_._1).distinct.toSeq
    val edges = mem.groupBy(_._2).values.flatMap { ms =>
      val ids = ms.map(_._1).distinct.sorted
      ids.tail.map(x => (ids.head, x)) // star within each bucket
    }
    val want = bruteCC(nodes, edges)
    val got = MinHash.dedupAssignmentsCC(docs, col("doc_id"), col("text"), 64, 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // sanity: real duplicate structure exists and reps are component minima
    assert(got.exists { case (id, rep) => rep != id })
  }

  test("CC closure collapses duplicate CHAINS that one-round propagation over-keeps") {
    import spark.implicits._
    // A chain: d1 ~ d2 (share most tokens), d2 ~ d3, d3 ~ d4 — but d1 and
    // d4 share almost nothing. Transitive closure must put all four in one
    // cluster; the one-round form provably cannot when no single bucket
    // holds them all.
    val words = (0 until 40).map(i => s"w$i")
    def doc(lo: Int) = words.slice(lo, lo + 16).mkString(" ")
    val chain = Seq(
      (1L, doc(0)), (2L, doc(4)), (3L, doc(8)), (4L, doc(12)),
      (9L, "zz yy xx totally separate vocabulary island")
    ).toDF("doc_id", "text")
    val cc = MinHash.dedupAssignmentsCC(chain, col("doc_id"), col("text"), 64, 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // neighbors overlap 12/20 tokens (J = 0.6); 32 bands of 2 rows catch
    // them w.p. 1 - (1 - 0.36)^32 ≈ 1 - 6e-7 per link
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L && cc(4L) == 1L)
    assert(cc(9L) == 9L)
    // and the SimHash CC variant agrees on exact-dup structure
    val sh = SimHash.dedupAssignmentsCC(
      Seq((1L, doc(0)), (2L, doc(0)), (3L, "unrelated island text")).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == 1L && sh(2L) == 1L && sh(3L) == 3L)
  }

  test("SimHash nearDuplicates returns pairs within maxHamming only") {
    val got = SimHash.nearDuplicates(corpus, col("doc_id"), col("text"), maxHamming = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 0)
    got.values.foreach(h => assert(h <= 10))
  }

  test("CC edge generation: bucket-min is a partial aggregate, never a window") {
    // The CC rounds materialize eagerly during query construction, so the
    // edge subtree never shows up in the final query's physical plan —
    // pin it directly: groupBy(band, bucket) partial agg + join back, no
    // Window node (a window over raw memberships would funnel a
    // mega-bucket into one task; see ConnectedComponents.edgesFromMemberships).
    val mem = MinHash.memberships(
      corpus, col("doc_id"), col("text"), numHashes = 64, bands = 16)
    // String checks, not TreeNode.collect: AdaptiveSparkPlanExec hides
    // its input from collect until execution, but prints the full tree.
    val plan = ConnectedComponents.edgesFromMemberships(mem)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"edge generation uses a window:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"expected a hash aggregate for the bucket min:\n$plan")
  }

  test("starRoots short-circuits on an edge-free corpus (all docs kept)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(ConnectedComponents.starRoots(empty).count() == 0)
    // End-to-end through the CC path: all-singleton buckets -> zero edges
    // -> every doc is its own cluster rep.
    val uniq = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon zeta"))
      .toDF("doc_id", "text")
    val got = MinHash.dedupAssignmentsCC(uniq, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == 3 && got.forall { case (id, rep, kept) => id == rep && kept })
  }

  test("fixed-round hop+jump min-propagation converges within the oracle's 64-round budget") {
    // The CC oracles replay the closure as 64 chained rounds of
    //   lab'(v) = min( lab(lab(v)),  min over neighbors u of lab(u) )
    // (DedupOps.minPropRoundsSql). The verify-time hash would catch a
    // label still moving at round 64, but only on the corpus at hand —
    // this pins the ROUND BOUND itself on adversarial topologies, in a
    // pure-Scala simulation of exactly that recurrence: convergence to
    // the component min must take ≤ ceil(log2(diameter)) + 2 rounds,
    // far under 64 even for a 100k-node path (diameter ≈ n, where
    // hop-only propagation would need ~n rounds — the pointer jump is
    // what buys the log).
    def simulate(n: Int, edges: Seq[(Int, Int)]): Int = {
      val nbrs = Array.fill(n)(List.empty[Int])
      edges.foreach { case (a, b) =>
        nbrs(a) = b :: nbrs(a); nbrs(b) = a :: nbrs(b)
      }
      var lab = Array.tabulate(n)(identity)
      var rounds = 0
      var changed = true
      while (changed && rounds <= 64) {
        val next = Array.tabulate(n) { v =>
          val jump = lab(lab(v))
          val hop = if (nbrs(v).isEmpty) lab(v) else nbrs(v).map(lab).min
          math.min(jump, math.min(lab(v), hop))
        }
        changed = !java.util.Arrays.equals(next, lab)
        lab = next
        if (changed) rounds += 1
      }
      // converged to the true component min (union-find ground truth)
      val root = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (root(x) != x) root(x) = find(root(x)); root(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) root(math.max(ra, rb)) = math.min(ra, rb)
      }
      (0 until n).foreach { v =>
        assert(lab(v) == find(v), s"node $v: label ${lab(v)} != component min ${find(v)}")
      }
      rounds
    }
    val n = 100000
    val path = simulate(n, (0 until n - 1).map(i => (i, i + 1)))
    assert(path <= 19, s"path-graph convergence took $path rounds")       // log2(1e5)≈17
    val rev = simulate(n, (0 until n - 1).map(i => (n - 1 - i, n - 2 - i)))
    assert(rev <= 19, s"reversed path took $rev rounds")
    val star = simulate(n, (1 until n).map(i => (0, i)))
    assert(star <= 3, s"star took $star rounds")
    val rnd = new scala.util.Random(12)
    val random = simulate(n, Seq.fill(n)((rnd.nextInt(n), rnd.nextInt(n))).filter(e => e._1 != e._2))
    assert(random <= 19, s"random graph took $random rounds")
    info(s"rounds: path=$path revpath=$rev star=$star random=$random (budget 64)")
  }

  test("CC invariants hold at sf0.1 — fixed point + min labels beyond the oracle's reach") {
    // The recursive-CTE closure oracle is O(Σ component²) and intractable
    // at sf0.1 (BASELINE.md), so the transitive-closure path gets an
    // ENGINE-side structural check at 10× the driver gate: the labelling
    // must be a star-contraction fixed point (no cross-cluster edge) with
    // min labels, in bijection with the member docs.
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val mem = MinHash.memberships(docs, col("doc_id"), col("text"), 64, 16)
    val asg = ConnectedComponents.assignmentsFromMemberships(mem)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      assert(ConnectedComponents.invariantViolations(mem, asg) == 0L)
      // the check bites: sf0.1 is the SF with real duplicate structure
      val merged = asg.filter(col("doc_id") =!= col("cluster_rep"))
        .orderBy("doc_id").limit(1).collect()
      assert(merged.nonEmpty, "sf0.1 fixture must contain collapsed duplicates")
      // negative control: splitting one doc out of its cluster must be
      // rejected (its derived edges now cross two clusters)
      val victim = merged.head.getLong(0)
      val corrupted = asg.withColumn("cluster_rep",
        when(col("doc_id") === victim, col("doc_id")).otherwise(col("cluster_rep")))
      assert(ConnectedComponents.invariantViolations(mem, corrupted) > 0L)
      // same verification for the OTHER closure path (SimHash blocks
      // relabelled to the band/bucket shape its CC call uses)
      val memSh = SimHash.memberships(docs, col("doc_id"), col("text"), 3)
        .select(col("doc_id"), col("block").as("band"), col("bucket"))
      val asgSh = ConnectedComponents.assignmentsFromMemberships(memSh)
      assert(ConnectedComponents.invariantViolations(memSh, asgSh) == 0L)
    } finally {
      asg.unpersist(blocking = false)
      spark.catalog.clearCache()
    }
  }

  test("dedupAssignmentsFromSets: empty sets cluster together, no doc is dropped") {
    // Degenerate-input pin for the set-agnostic entry point: an empty
    // set's signature is all-NULL, but the band bucket hashes the band
    // prefix alone (concat_ws skips nulls) — so empty sets are mutual
    // duplicates (empty == empty) and every input id keeps an
    // assignment row; nothing silently vanishes from the keep/drop
    // decision.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, Seq("a", "b")), (2L, Seq.empty[String]),
      (3L, Seq("a", "b")), (4L, Seq.empty[String])).toDF("id", "s")
    val got = MinHash.dedupAssignmentsFromSets(df, col("id"), col("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), "every input id must be assigned")
    assert(got(1L) == (1L, true) && got(3L) == (1L, false),
      "identical sets must collapse")
    assert(got(2L) == (2L, true) && got(4L) == (2L, false),
      "empty sets are duplicates of each other, not of anything else")
  }

  test("starRoots driver-local finish matches the distributed fixpoint (incl. mid-loop entry)") {
    import spark.implicits._
    // Random multigraph with chains, cliques and isolated pairs, plus a
    // union-find ground truth computed independently.
    val rnd = new scala.util.Random(7)
    val n = 4000
    val raw = Seq.fill(3000)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
    val edges = raw.toDF("u", "v")
    val root = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (root(x) != x) root(x) = find(root(x)); root(x) }
    raw.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) root(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = raw.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v.toInt).toLong).toMap
    val key = "spark.graft.cc.localEdgeThreshold"
    def run(threshold: String): Map[Long, Long] = {
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, threshold)
      try ConnectedComponents.starRoots(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally prev match {
        case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key)
      }
    }
    val distributed = run("0")          // local finish disabled: pure fixpoint
    val immediateLocal = run("10000000") // engages before any round
    // engages MID-LOOP: first round(s) run distributed, the contracted
    // tail finishes locally (the round-boundary node/component-
    // preservation claim the scaladoc makes)
    val midLoop = run(raw.size./(2).toString)
    assert(distributed === truth, "distributed fixpoint diverged from union-find truth")
    assert(immediateLocal === truth, "immediate local finish diverged")
    assert(midLoop === truth, "mid-loop local finish diverged")
  }

  test("starRoots with a durable checkpoint dir matches the localCheckpoint path") {
    import spark.implicits._
    // a chain (1-2-3-4), a triangle (10-11-12), an isolated edge (20-21)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("u", "v")
    val local = ConnectedComponents.starRoots(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    try {
      val durable = ConnectedComponents.starRoots(edges, checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(durable === local)
      assert(durable(4L) == 1L && durable(12L) == 10L && durable(21L) == 20L)
      // checkpoint() actually wrote durable state
      assert(new java.io.File(dir).listFiles().nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("c2_cc_stats is the exact size histogram of the CC assignments") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val asg = graft.queries.DedupOps.c2MinHashCc(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val total = asg.length.toLong
    val hist = asg.groupBy(_._2).values.map(_.size.toLong)
      .groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val want = hist.toSeq.sortBy(_._1).map { case (s, n) =>
      (s, n, s * n, round6((s * n).toDouble / total))
    }
    val got = graft.queries.DedupOps.c2CcStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want)
    // the histogram accounts for every document exactly once
    assert(got.map(_._3).sum == total)
  }
}
