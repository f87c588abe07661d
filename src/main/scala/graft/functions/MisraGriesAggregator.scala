package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * bounded-memory, MERGEABLE frequent-items summary (Misra & Gries 1982;
  * merge rule and error analysis per Agarwal et al., "Mergeable
  * Summaries", PODS 2012 — see PAPERS.md).
  *
  * Scale rationale: exact frequent-items (`groupBy(token).count`)
  * shuffles the whole vocabulary — billions of keys on a web corpus.
  * This sketch keeps ≤ `cap` counters per partial buffer, so map-side
  * combine shrinks the shuffle to O(partitions · cap), and the merge is
  * associative/commutative (Spark's partial-aggregation contract).
  *
  * Guarantees (for total stream length n, any merge tree):
  *  - no overcount: est(x) ≤ freq(x);
  *  - bounded undercount: freq(x) − est(x) ≤ n/(cap+1);
  *  - hence every x with freq(x) > n/(cap+1) is IN the sketch.
  * The sketch CONTENTS depend on merge order (not deterministic), but
  * the guarantees hold for every order — queries that hash-check must
  * emit guarantee-derived booleans + exact counts, never raw estimates
  * (see TextOps.c4HeavyHitters).
  *
  * Reduce: increment a tracked counter, else occupy a free slot, else
  * decrement all counters by 1 (dropping zeros) — one decrement event
  * absorbs cap+1 occurrences, bounding events by n/(cap+1). Merge: sum
  * counters, then subtract the (cap+1)-th largest value and drop
  * non-positives (at most `cap` survive).
  */
final class MisraGriesAggregator(cap: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(cap >= 1, "cap must be >= 1")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    buf.get(tok) match {
      case Some(c)                  => buf.updated(tok, c + 1L)
      case None if buf.size < cap   => buf.updated(tok, 1L)
      case None =>
        buf.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
    if (sum.size <= cap) sum
    else {
      // subtract the (cap+1)-th largest counter value; only counters
      // strictly above it survive, so at most `cap` remain
      val kth = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(cap)
      sum.flatMap { case (t, c) => if (c > kth) Some(t -> (c - kth)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] = MisraGriesAggregator.mapEncoder
  override def outputEncoder: Encoder[Map[String, Long]] = MisraGriesAggregator.mapEncoder
}

object MisraGriesAggregator {
  private[graft] val mapEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  /** The sketch as a `TypedColumn` for `Dataset[String].select`. */
  def sketch(cap: Int): TypedColumn[String, Map[String, Long]] =
    new MisraGriesAggregator(cap).toColumn
}
