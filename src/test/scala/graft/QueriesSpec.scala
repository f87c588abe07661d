package graft

/** Contract checks over the whole declared inventory. */
class QueriesSpec extends SparkSuite {

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Queries whose EMPTY result is the correct answer on the sparse
  // sf0.001 slice: an anomaly report with no anomalies is not a broken
  // query (the sf0.001 event stream has ~1 event per user-hour, so no
  // hour can exceed 2x a user's mean). Non-emptiness for these is
  // asserted at sf0.01 instead (CurationOpsSpec).
  private val mayBeEmptyAtSf0001 = Set("c5_anomaly")

  test("every declared query runs and returns rows at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val n = fn(spark, sf).count()
          if (n > 0 || mayBeEmptyAtSf0001(name)) None else Some(s"$name: 0 rows")
        } catch {
          case e: Exception => Some(s"$name: ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
