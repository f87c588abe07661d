package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.2: `Aggregator[IN,BUF,OUT]` for
  * custom monoids): per-group top-k as a bounded sorted buffer.
  *
  * Scale rationale: `row_number().over(partitionBy(...))` materializes and
  * sorts EVERY row of every group at the window operator; this Aggregator
  * keeps only k elements per group in the partial buffers, so map-side
  * combine shrinks the shuffle to O(groups · k) — the right shape when
  * groups are huge (hot customers at 100 TB) and k is small. The merge is
  * associative/commutative, satisfying Spark's partial-aggregation
  * contract (same implicit contract as the reference's re-executed
  * reduces, SURVEY.md §2.1 note 8).
  *
  * IN = (sortKey, payload), BUF = sorted Vector of the k largest pairs
  * (descending key, ascending payload for deterministic ties), OUT = that
  * Vector.
  */
final class TopKAggregator[IN](k: Int, sortKey: IN => Double, payload: IN => Long)
    extends Aggregator[IN, Vector[(Double, Long)], Vector[(Double, Long)]] {

  private def insert(buf: Vector[(Double, Long)], x: (Double, Long)): Vector[(Double, Long)] = {
    // descending by key, then ascending by payload (stable ties)
    val idx = buf.indexWhere(e => e._1 < x._1 || (e._1 == x._1 && e._2 > x._2))
    val at = if (idx < 0) buf.length else idx
    val inserted = (buf.take(at) :+ x) ++ buf.drop(at)
    if (inserted.length > k) inserted.take(k) else inserted
  }

  override def zero: Vector[(Double, Long)] = Vector.empty

  override def reduce(buf: Vector[(Double, Long)], in: IN): Vector[(Double, Long)] = {
    val x = (sortKey(in), payload(in))
    if (buf.length == k && x._1 < buf.last._1) buf else insert(buf, x)
  }

  /** Merge two sorted bounded buffers (associative + commutative). */
  def mergeBufs(a: Vector[(Double, Long)], b: Vector[(Double, Long)]): Vector[(Double, Long)] =
    b.foldLeft(a) { (acc, x) =>
      if (acc.length == k && x._1 < acc.last._1) acc else insert(acc, x)
    }

  override def merge(a: Vector[(Double, Long)], b: Vector[(Double, Long)]): Vector[(Double, Long)] =
    mergeBufs(a, b)

  override def finish(buf: Vector[(Double, Long)]): Vector[(Double, Long)] = buf

  // TypeTag-derived encoders — no SparkSession dependency, safe to resolve
  // on any thread (driver planning or executor deserialization).
  override def bufferEncoder: Encoder[Vector[(Double, Long)]] = TopKAggregator.vecEncoder
  override def outputEncoder: Encoder[Vector[(Double, Long)]] = TopKAggregator.vecEncoder
}

object TopKAggregator {
  /** array<struct<_1:double,_2:bigint>> encoder, TypeTag-derived. */
  private[graft] val vecEncoder: Encoder[Vector[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[(Double, Long)]]()
}
