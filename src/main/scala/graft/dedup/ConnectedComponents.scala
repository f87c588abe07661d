package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star /
  * small-star contraction (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC 2014 — public literature, see PAPERS.md).
  *
  * Why this and not one more min-propagation round: plain label
  * propagation needs O(component diameter) rounds — a chain of near-dup
  * clusters (doc A ~ B, B ~ C, ...) converges linearly. Star contraction
  * converges in O(log n) rounds regardless of topology, which is the
  * bound a 100 TB dedup job needs.
  *
  * Scale posture: every round is two self-joins + two aggregations over
  * the edge list — no `collect_list` of neighborhoods (a star center's
  * neighbor list is component-sized; building it as an array row would
  * reintroduce the skew this algorithm exists to avoid). Rounds are
  * `localCheckpoint`ed to truncate lineage (on a cluster with an HDFS
  * checkpoint dir, `checkpoint()` is the durable equivalent).
  *
  * The reference engine has no graph/dedup operator at all — a tMapReduce
  * user would chain hand-written Map/Reduce rounds from
  * `/root/reference/src/tmapreduce/mrf.h:9-11` and drive the iteration
  * from a client; here the fixpoint loop is part of the operator.
  */
object ConnectedComponents {

  /** Cluster assignment for a bipartite membership table
    * `(doc_id, band, bucket)` (docs sharing any (band, bucket) are
    * connected): returns `(doc_id, cluster_rep, is_kept)` with
    * `cluster_rep` = the smallest doc_id in the doc's connected
    * component — the full transitive closure, unlike the single
    * min-propagation round in `MinHash.dedupAssignments`.
    *
    * Durability: rounds truncate lineage with `localCheckpoint` by
    * default (fast, executor-local). On a real cluster set
    * `spark.graft.cc.checkpointDir` (or call [[starRoots]] with
    * `checkpointDir`) to use durable `checkpoint()` instead — with
    * localCheckpoint an executor loss mid-iteration cannot recompute the
    * truncated lineage; with an HDFS/object-store dir the job survives it.
    */
  def assignmentsFromMemberships(memberships: DataFrame): DataFrame = {
    // Persisted: the membership table (signature = one MD5 per token)
    // feeds three consumers — the doc universe, the bucket-min aggregate,
    // and the join probe of the edge generation — compute it once. The
    // star-contraction rounds hit the cache during construction (their
    // actions run inside starRoots, whose first round checkpoints the
    // edge set off the memberships); the doc universe reads it at
    // materialization, after which CacheScope releases it.
    // Persist BEFORE starRoots: its first-round checkpoint action reads
    // the membership table twice (probe + bucket-min), and the cache must
    // already be registered for that single action to compute it once.
    // (Re-persisting in releaseAfterMaterialize is a same-level no-op.)
    val mem = memberships
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docs = mem.select(col("doc_id")).distinct()
    val result = {
      val roots = starRoots(edgesFromMemberships(mem))
      docs
        .join(roots, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("rep"), col("doc_id")).as("cluster_rep"))
        .withColumn("is_kept", col("doc_id") === col("cluster_rep"))
    }
    graft.util.CacheScope.releaseAfterMaterialize(result, Seq(mem))
  }

  /** Star edges for a bipartite membership table: doc -> min doc of each
    * of its buckets. Connectivity is preserved (every bucket member links
    * to the bucket min) while edge count stays O(n · bands) — never the
    * O(Σ|bucket|²) pair list. The per-bucket min is a partial (map-side
    * combining) aggregate shuffle-joined back on (band, bucket) — a
    * window over the raw memberships would funnel a mega-bucket into one
    * task with no partial aggregation and no AQE skew split (the dedup
    * workload's own skew would become its straggler).
    */
  private[dedup] def edgesFromMemberships(memberships: DataFrame): DataFrame =
    memberships
      .join(MinHash.bucketMins(memberships, "band", "bucket"), Seq("band", "bucket"))
      .filter(col("doc_id") =!= col("bucket_min"))
      .select(col("doc_id").as("u"), col("bucket_min").as("v"))
      .distinct()

  /** Contract an undirected edge list `(u, v)` to stars and return
    * `(doc_id, rep)` for every non-isolated node (rep = component min).
    *
    * `checkpointDir`: when set (explicitly or via the session conf
    * `spark.graft.cc.checkpointDir`), rounds use durable `checkpoint()`
    * there instead of `localCheckpoint()` — the failure-tolerant mode for
    * long cluster runs. NOTE this calls `setCheckpointDir` on the shared
    * SparkContext (a global side effect visible to other jobs in the
    * session), and each round's durable checkpoint files stay on disk
    * until the RDDs are GC'd — enable
    * `spark.cleaner.referenceTracking.cleanCheckpoints` (or clean the dir
    * after the job) on long-lived clusters to reclaim superseded rounds.
    */
  def starRoots(edges: DataFrame, maxRounds: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    val dir = checkpointDir.orElse(
      Option(spark.conf.get("spark.graft.cc.checkpointDir", null)))
    dir.foreach(spark.sparkContext.setCheckpointDir)
    def truncate(df: DataFrame): DataFrame =
      if (dir.isDefined) df.checkpoint() else df.localCheckpoint()
    // Driver-local finish threshold (edges). Star contraction shrinks the
    // edge set geometrically; once it fits a bounded driver collect, the
    // remaining O(log n) distributed rounds (each: two self-joins, two
    // aggregations, a distinct, a checkpoint and 1-2 convergence actions)
    // are pure scheduling overhead — finish with a local union-find
    // instead. 0 disables (always run the distributed fixpoint); the
    // default bounds the collect at ~16 MB of longs regardless of corpus
    // size, so the driver posture is unchanged at 100 TB: the big graph
    // still contracts distributedly, only the tail rounds collapse.
    val localEdgeThreshold =
      spark.conf.get("spark.graft.cc.localEdgeThreshold", "1000000").toLong

    // Oriented canonical form: (u, v) with u > v.
    var e = truncate(edges
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    var eCount = e.count()

    // Dedup-free corpus: nothing to contract — skip the loop (and its
    // per-round driver actions) and return the empty star mapping.
    var converged = eCount == 0
    var round = 0
    while (!converged && round < maxRounds) {
      // Local finish is valid at ANY round boundary: contraction rounds
      // preserve the node set (every non-root node keeps an edge to a
      // smaller component member until fixpoint; roots stay reachable as
      // edge targets) and never merge or split components, so the
      // union-find over the current edge set yields exactly the fixpoint
      // star mapping (doc -> component min). Pinned against the
      // distributed fixpoint in DedupSpec.
      if (eCount <= localEdgeThreshold) return localStarFinish(e)
      // large-star: symmetrize; for each node u, attach every LARGER
      // neighbor to m(u) = min(N(u) ∪ {u}). sym feeds two consumers
      // (lMins + the join probe); persist it for the round so the union
      // isn't recomputed.
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
        .persist()
      val lMins = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      val large = sym.join(lMins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")) // u > v by construction
        .filter(col("u") =!= col("v"))
        .distinct()

      // small-star: edges already oriented (u > v); for each node u,
      // attach every smaller neighbor (and u itself) to m(u) = min(N<(u)).
      val sMins = large.groupBy("u").agg(min(col("v")).as("m"))
      val next = truncate(large.join(sMins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(sMins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct())
      sym.unpersist(blocking = false) // truncate() is eager; sym is spent

      // Fixpoint: the edge set stopped changing. Both sides are distinct
      // sets, so equal counts + no novel rows = equal. The count rides on
      // the checkpoint materialization (1 action); the previous round's
      // count is reused, and the anti-join probe (2nd action) only runs
      // when the counts agree — 1-2 driver actions per round, not 3.
      val nextCount = next.count()
      val changed =
        nextCount != eCount ||
          next.join(e, Seq("u", "v"), "left_anti").limit(1).count() > 0
      e = next
      eCount = nextCount
      converged = !changed
      round += 1
    }
    // Star graph: every non-root points straight at its component root.
    starReadOff(e)
  }

  /** Read the (doc_id, rep) relation off a CONVERGED star edge set. */
  private def starReadOff(e: DataFrame): DataFrame =
    e.groupBy("u").agg(min(col("v")).as("rep"))
      .select(col("u").as("doc_id"), col("rep"))
      .unionByName( // roots themselves
        e.select(col("v").as("doc_id")).distinct()
          .join(e.select(col("u").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
          .withColumn("rep", col("doc_id")))

  /** Driver-local union-find finish over a bounded edge collect — the
    * same (doc_id, rep = component min, roots included) relation the
    * distributed fixpoint produces, computed in one pass instead of
    * O(log n) additional rounds. Deterministic regardless of collect
    * order: union always keeps the smaller root, so every node resolves
    * to its component's minimum id; output rows are emitted in ascending
    * doc_id. Path compression keeps the pass near-linear.
    */
  private def localStarFinish(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val pairs = e.select(col("u"), col("v")).as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) { x = p; p = parent.getOrDefault(x, x) }
      var y = x0 // path compression
      while (y != x) { val n = parent.get(y); parent.put(y, x); y = n }
      x
    }
    val nodes = new java.util.TreeSet[java.lang.Long]()
    pairs.foreach { case (u, v) =>
      nodes.add(u); nodes.add(v)
      val ru = find(u); val rv = find(v)
      if (ru != rv) {
        if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
      }
    }
    import scala.jdk.CollectionConverters._
    val out = nodes.iterator().asScala
      .map(n => (n.longValue(), find(n.longValue()))).toSeq
    spark.createDataset(out).toDF("doc_id", "rep")
  }

  /** Engine-side structural verification of a CC labelling against the
    * membership table it was derived from — the check for scales where a
    * SQL transitive-closure oracle is intractable (the recursive-CTE
    * reach set is O(Σ component²); see BASELINE.md). Each invariant is a
    * groupBy or join over the assignments/edges — the same bounded
    * shapes as the algorithm itself, so the verification runs wherever
    * the algorithm runs. Returns the total violation count (0 = the
    * labelling is a star-contraction fixed point with min labels):
    *
    *  (a) completeness — member docs and assignment rows are in
    *      bijection (no doc unlabelled, none labelled twice or invented);
    *  (b) min-label — every cluster's rep equals the minimum doc_id in
    *      the cluster (which also proves the rep is a member, assigned
    *      to itself);
    *  (c) fixed point — relabelling the endpoints of every derived edge
    *      (doc → bucket-min) by its cluster rep contracts each edge to a
    *      self-loop: no edge crosses two clusters, so one more
    *      large-star/small-star round over the contracted graph changes
    *      nothing. With (b), labels can only drop; with no cross-cluster
    *      edge, there is nothing left to drop.
    */
  def invariantViolations(memberships: DataFrame, assignments: DataFrame): Long = {
    // Fully eager (five counts), so the caches are scoped to this call:
    // released in the finally, nothing outlives the return.
    val mem = memberships
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val asg = assignments.select(col("doc_id"), col("cluster_rep"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val docs = mem.select(col("doc_id")).distinct()
      val unlabelled = docs.join(asg, Seq("doc_id"), "left_anti").count()
      val invented = asg.join(docs, Seq("doc_id"), "left_anti").count()
      val relabelled = asg.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).count()
      val badMin = asg.groupBy(col("cluster_rep")).agg(min(col("doc_id")).as("mn"))
        .filter(col("mn") =!= col("cluster_rep")).count()
      val crossEdges = edgesFromMemberships(mem)
        .join(asg.select(col("doc_id").as("u"), col("cluster_rep").as("rep_u")), "u")
        .join(asg.select(col("doc_id").as("v"), col("cluster_rep").as("rep_v")), "v")
        .filter(col("rep_u") =!= col("rep_v")).count()
      unlabelled + invented + relabelled + badMin + crossEdges
    } finally {
      mem.unpersist(blocking = false)
      asg.unpersist(blocking = false)
    }
  }
}
