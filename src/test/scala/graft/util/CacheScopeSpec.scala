package graft.util

import graft.{SparkEntry, SparkSuite}

/** Release-after-use discipline: operators that persist intermediates must
  * not accumulate storage across a long-lived session. Five cache-using
  * operators are materialized back-to-back; after each action the session
  * must return to its baseline cached-RDD count (CC's localCheckpoint
  * blocks are excluded — they are lineage-truncation state, bounded by the
  * final edge set and reclaimed by the ContextCleaner on GC).
  */
class CacheScopeSpec extends SparkSuite {

  private def cachedCount: Int =
    spark.sparkContext.getPersistentRDDs.values
      .count(r => !org.apache.spark.rdd.GraftRddBridge.isLocallyCheckpointed(r))

  /** The release listener runs on the async listener bus — poll briefly. */
  private def awaitBaseline(baseline: Int, tag: String): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (cachedCount > baseline && System.nanoTime() < deadline)
      Thread.sleep(100)
    val now = cachedCount
    assert(now <= baseline,
      s"$tag left ${now - baseline} cached RDD(s) behind: " +
        spark.sparkContext.getPersistentRDDs.values
          .filterNot(org.apache.spark.rdd.GraftRddBridge.isLocallyCheckpointed(_))
          .map(_.name).mkString("; "))
  }

  test("five cache-using operators back-to-back leave no net new cached blocks") {
    // One from each caching family: MinHash banding, SimHash banding,
    // CC closure (+ construction-time actions), LSH ANN sketch
    // (+ score re-attach), prefix-filtered set-sim join (3 staged caches).
    val names = Seq("c2_minhash_lsh", "c2_simhash", "c2_minhash_cc",
      "c3_ann_lsh", "c2_ngram_jaccard")
    val baseline = cachedCount
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      awaitBaseline(baseline, n)
    }
  }

  /** Spin until the cached-RDD count is stable for a few consecutive
    * polls — drains a PREVIOUS test's async listener releases so the
    * baseline below is quiescent and the assertion can stay strict.
    */
  private def stableCachedCount(): Int = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var last = cachedCount
    var stable = 0
    while (stable < 3 && System.nanoTime() < deadline) {
      Thread.sleep(100)
      val now = cachedCount
      if (now == last) stable += 1 else { stable = 0; last = now }
    }
    last
  }

  test("an unmaterialized operator holds no storage, only bookkeeping") {
    // Drain pending async releases from earlier tests first, then pin
    // STRICT equality: building a plan must neither add storage nor
    // release existing cached blocks (a registration that wrongly
    // dropped other caches would slip through a `<=` check).
    val baseline = stableCachedCount()
    // Build but never materialize: persist() alone computes nothing, so
    // no blocks are stored and the pending entry is inert.
    SparkEntry.queries("c2_simhash")(spark, sf)
    assert(cachedCount == baseline)
  }

  test("never-materialized registrations are bounded (oldest evicted)") {
    // A session that only ever builds plans (a plan-audit loop) must not
    // grow CacheScope bookkeeping without bound.
    val before = CacheScope.pendingCount
    (1 to 200).foreach(_ => SparkEntry.queries("c2_simhash")(spark, sf))
    assert(CacheScope.pendingCount <= 32,
      s"pending grew to ${CacheScope.pendingCount} (was $before)")
  }
}
