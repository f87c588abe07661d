package graft.functions

import graft.SparkSuite
import graft.queries.Relational
import org.apache.spark.sql.functions._

/** The bounded-heap typed Aggregator must agree with the window-function
  * top-k on real data, and its merge must be order-insensitive (the
  * partial-aggregation contract).
  */
class TopKAggregatorSpec extends SparkSuite {

  test("aggregator top-3 per customer == window row_number top-3") {
    import spark.implicits._
    val agg = new TopKAggregator[(Long, Double, Long)](3, _._2, _._3).toColumn
    val got = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .agg(agg.name("topk").as[Vector[(Double, Long)]](TopKAggregator.vecEncoder))
      .flatMap { case (cust, tops) =>
        tops.zipWithIndex.map { case ((price, okey), i) => (cust, okey, price, i + 1) }
      }
      .collect().toSet

    val want = Relational.b4WindowTopN(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got == want)
  }

  private def mk(k: Int) =
    new TopKAggregator[(Double, Long)](k, _._1, _._2)

  test("merge is commutative and bounded") {
    val a = mk(2)
    val b1 = Vector((5.0, 1L), (3.0, 2L))
    val b2 = Vector((4.0, 3L), (2.0, 4L))
    assert(a.merge(b1, b2) == a.merge(b2, b1))
    assert(a.merge(b1, b2) == Vector((5.0, 1L), (4.0, 3L)))
    assert(a.merge(b1, b2).length == 2)
  }

  test("deterministic tie-break on equal keys (smaller payload wins order)") {
    val a = mk(3)
    // buffers maintain the sorted invariant; build them through reduce
    val b1 = Seq((1.0, 9L), (1.0, 2L)).foldLeft(a.zero)(a.reduce)
    val r = a.merge(b1, Seq((1.0, 5L)).foldLeft(a.zero)(a.reduce))
    assert(r == Vector((1.0, 2L), (1.0, 5L), (1.0, 9L)))
  }
}
