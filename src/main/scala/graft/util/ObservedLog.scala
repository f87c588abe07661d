package graft.util

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Stderr reporter for `Dataset.observe` metrics named `graft_*` — the
  * "loud drops" channel for operators that deliberately bound their
  * output or candidate sets (bucket caps, top-C confirms). `observe`
  * rides the existing plan (CollectMetricsExec — no second scan, no
  * driver-side count job), and this listener prints whatever the run
  * actually dropped, so a silent-truncation regression is visible in
  * every bench/verify log rather than only in a dedicated audit.
  */
object ObservedLog {
  // Weak keys: a stopped session must not be pinned by its registration
  // mark (the CacheScope.installed pattern).
  private val registered =
    Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    if (registered.put(spark, java.lang.Boolean.TRUE) == null) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_"))
              System.err.println(s"[graft] observed $name: " +
                row.schema.fieldNames.zip(row.toSeq)
                  .map { case (f, v) => s"$f=$v" }.mkString(", "))
          }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }
}
