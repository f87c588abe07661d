package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Listener-bus drain bridge. The bench's per-query shuffle-bytes
  * telemetry reads counters that a `SparkListener` accumulates on the
  * (asynchronous) listener bus; reading them right after an action
  * returns would race the last task-end events. `LiveListenerBus
  * .waitUntilEmpty` is exactly the synchronization point (Spark's own
  * test harnesses use it) but is `private[spark]`, so this one-call shim
  * lives in the `org.apache.spark` namespace — same pattern as
  * [[org.apache.spark.sql.graft.ColumnBridge]].
  */
object ListenerBridge {
  /** Block until all queued listener events are dispatched (bounded by
    * the bus's own timeout); swallow a timeout — slightly-stale counters
    * beat a crashed bench.
    */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: Exception => () }
}
