package graft

/** Whole-inventory plan audit: structural red flags that would sink a
  * 100 TB run must never appear in any declared query's plan.
  *
  *  - `CartesianProduct` (an unconditioned all-pairs shuffle join) is
  *    banned outright — every pairwise operator here generates candidates
  *    via buckets/prefixes/bands instead.
  *  - `BroadcastNestedLoopJoin` is allowed only where a small side is
  *    deliberately broadcast against a non-equi condition (interval join,
  *    bitmask set-join, query-set theta joins) — an allowlist, so a new
  *    query that accidentally plans a BNLJ over two fact tables fails CI.
  */
class PlanAuditSpec extends SparkSuite {

  // Queries whose PHYSICAL design is a broadcast nested-loop join on
  // purpose (small broadcast side, non-equi predicate).
  private val bnljAllowed = Set(
    "b3_join_range",    // broadcast interval table
    "c2_ngram_jaccard", // distinct-set bitmask path: broadcast distinct sets
    "c3_cosine_topk"    // broadcast query subset, q_id <> b_id theta join
  )

  test("no CartesianProduct anywhere; BNLJ only on the allowlist") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name)
        if (cartesian) Some(s"$name: CartesianProduct")
        else if (bnlj) Some(s"$name: unexpected BroadcastNestedLoopJoin")
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
