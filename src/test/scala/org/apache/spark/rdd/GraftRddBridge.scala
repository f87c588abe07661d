package org.apache.spark.rdd

/** Test-only bridge: `RDD.isLocallyCheckpointed` is package-private, and
  * CacheScopeSpec needs it to separate operator caches (must be released)
  * from localCheckpoint lineage-truncation blocks (ContextCleaner-owned).
  */
object GraftRddBridge {
  def isLocallyCheckpointed(r: RDD[_]): Boolean = r.isLocallyCheckpointed
}
