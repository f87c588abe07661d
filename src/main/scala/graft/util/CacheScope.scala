package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Release-after-use discipline for operator-internal caches.
  *
  * Dedup/ANN operators persist an expensive intermediate (a MinHash
  * membership table, an LSH sketch column) that is consumed BOTH by
  * driver-side actions during query construction and by the returned lazy
  * frame — so the operator cannot unpersist it before returning, and a
  * long-lived session running many operators would accumulate
  * MEMORY_AND_DISK blocks until someone called `clearCache()` (which also
  * nukes caches the USER created — a library has no business doing that).
  *
  * [[releaseAfterMaterialize]] closes the gap: it persists the
  * intermediates and registers them against the operator's RESULT plan; a
  * session-level QueryExecutionListener unpersists them right after the
  * first action whose plan contains that result (matched by
  * `sameResult` subtree search, so downstream wrapping — an extra
  * aggregate, a `noop` write, an ORDER BY — still matches). Plans stay
  * fully lazy (no eager checkpoint), so `.explain`/plan audits see the
  * real operator tree, and construction-time actions (centroid training,
  * set counting) hit the cache without triggering the release.
  *
  * A result that is never materialized USUALLY leaves only bookkeeping
  * behind: its caches were never computed, so no storage is held. The
  * exception is operators with construction-time actions (ConnectedComponents
  * materializes its persisted membership table while BUILDING the plan):
  * their caches are populated at registration, so an explain-only loop can
  * hold up to [[MaxPending]] live caches until eviction — which is why the
  * cap is small. A result materialized twice recomputes the intermediates
  * on the second action — the price of bounded storage, and the same
  * contract `clearCache()` between operators imposed before.
  */
object CacheScope {

  private final case class Entry(resultPlan: LogicalPlan, caches: Seq[DataFrame])

  private val pending = new java.util.concurrent.CopyOnWriteArrayList[Entry]()
  // One listener per session; WeakHashMap so a stopped session's entry
  // does not pin it.
  private val installed = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Persist `caches` (MEMORY_AND_DISK) for exactly as long as `result`
    * needs them: they are unpersisted automatically after the first
    * action that computes `result` (or any plan containing it).
    * Returns `result` for chaining.
    */
  /** Registration cap: entries for results that are never materialized
    * (a plan audit builds a query just to explain it) would otherwise
    * accumulate forever in a long session. Evicting the OLDEST entry and
    * unpersisting its caches is always safe — an unmaterialized cache
    * holds no blocks, and a still-wanted cache merely recomputes. Kept
    * small because construction-time-populated caches (see class doc) DO
    * hold computed blocks while pending — the cap bounds that storage.
    */
  private val MaxPending = 32

  def releaseAfterMaterialize(result: DataFrame, caches: Seq[DataFrame]): DataFrame = {
    install(result.sparkSession)
    caches.foreach(_.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    pending.add(Entry(result.queryExecution.analyzed, caches))
    while (pending.size() > MaxPending) {
      val oldest = try pending.remove(0)
        catch { case _: IndexOutOfBoundsException => null } // raced empty
      if (oldest != null) oldest.caches.foreach(_.unpersist(blocking = false))
    }
    result
  }

  /** Caches currently awaiting release (visible for tests). */
  def pendingCount: Int = pending.size()

  private def install(spark: SparkSession): Unit =
    if (installed.putIfAbsent(spark, java.lang.Boolean.TRUE) == null)
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = sweep(qe)
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = sweep(qe)
      })

  private def sweep(qe: QueryExecution): Unit = if (!pending.isEmpty) {
    // The analyzed plan is pre-cache-substitution, so it still contains
    // the registered result subtree structurally; sameResult canonicalizes
    // expression ids, so a re-built identical operator also matches (both
    // registrations are then released — each holds its own cache frames).
    val analyzed =
      try qe.analyzed
      catch { case _: Exception => return } // analysis already failed
    import scala.jdk.CollectionConverters._
    pending.asScala.toList.foreach { e =>
      val matches =
        try analyzed.exists(_.sameResult(e.resultPlan))
        catch { case _: Exception => false }
      if (matches && pending.remove(e))
        e.caches.foreach(_.unpersist(blocking = false))
    }
  }
}
