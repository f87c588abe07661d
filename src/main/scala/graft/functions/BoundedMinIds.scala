package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group bounded id cap: keeps the `cap` SMALLEST ids seen plus the
  * group's TOTAL input count — the map-side-combining form of
  * `row_number() OVER (PARTITION BY g ORDER BY id) <= cap` plus
  * `count(*)`, for groups that must never be materialized whole. The
  * motivating group is a duplicate-saturated LSH band bucket: on a
  * corpus where most docs are mutual near-dups a single bucket can hold
  * a large fraction of the corpus, so a window (one task buffers the
  * bucket) or `collect_list` (unbounded buffer) is exactly the shape
  * that breaks at 100 TB; this buffer is `cap` longs regardless of
  * bucket size, and the merge is associative + commutative so Spark's
  * partial aggregation shrinks the shuffle to O(buckets · cap).
  *
  * The total count rides along so callers can report how much the cap
  * actually dropped (the "loud drops" contract): output is
  * `(kept ids ascending, n_total)`.
  */
final class BoundedMinIds(cap: Int)
    extends Aggregator[Long, (Vector[Long], Long), (Vector[Long], Long)] {
  require(cap > 0, "cap must be positive")

  private def insert(v: Vector[Long], id: Long): Vector[Long] = {
    val idx = v.indexWhere(_ > id)
    val at = if (idx < 0) v.length else idx
    val ins = (v.take(at) :+ id) ++ v.drop(at)
    if (ins.length > cap) ins.take(cap) else ins
  }

  override def zero: (Vector[Long], Long) = (Vector.empty, 0L)

  override def reduce(b: (Vector[Long], Long), id: Long): (Vector[Long], Long) = {
    val (v, n) = b
    val nv = if (v.length == cap && id >= v.last) v else insert(v, id)
    (nv, n + 1L)
  }

  override def merge(a: (Vector[Long], Long), b: (Vector[Long], Long)): (Vector[Long], Long) = {
    val v = b._1.foldLeft(a._1) { (acc, id) =>
      if (acc.length == cap && id >= acc.last) acc else insert(acc, id)
    }
    (v, a._2 + b._2)
  }

  override def finish(r: (Vector[Long], Long)): (Vector[Long], Long) = r

  // TypeTag-derived encoders — no SparkSession dependency (the
  // TopKAggregator pattern).
  override def bufferEncoder: Encoder[(Vector[Long], Long)] = BoundedMinIds.enc
  override def outputEncoder: Encoder[(Vector[Long], Long)] = BoundedMinIds.enc
}

object BoundedMinIds {
  private[graft] val enc: Encoder[(Vector[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Vector[Long], Long)]()
}
