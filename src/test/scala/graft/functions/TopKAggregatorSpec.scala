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

  test("ScalaCheck: any partition split + merge order == global sort-take (partial-agg license)") {
    // The property Spark's partial aggregation actually relies on: for
    // ANY input multiset, ANY split into partitions, and ANY merge
    // order, the result equals take-k of the globally sorted input
    // under (key desc, payload asc). This is what licenses routing the
    // c7 quota samples and the c2 top-m neighbor selection through the
    // heap instead of a window.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      k <- Gen.choose(1, 6)
      n <- Gen.choose(0, 60)
      // small key/payload domains force boundary ties, the hard case
      items <- Gen.listOfN(n, Gen.zip(
        Gen.choose(0, 5).map(_.toDouble), Gen.choose(0L, 9L)))
      cuts <- Gen.listOfN(4, Gen.choose(0, math.max(n, 1)))
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (k, items, cuts, seed)
    val prop = Prop.forAll(gen) { case (k, items, cuts, seed) =>
      val a = mk(k)
      // duplicate (key,payload) pairs are allowed: ties collapse
      // deterministically under the same order on both sides
      val want = items.sortBy { case (key, p) => (-key, p) }.take(k).toVector
      val bounds = (0 +: cuts.map(_ min items.length) :+ items.length).sorted
      val parts = bounds.zip(bounds.tail).map { case (lo, hi) => items.slice(lo, hi) }
      val bufs = parts.map(_.foldLeft(a.zero)(a.reduce))
      // merge in a seed-shuffled order to exercise commutativity too
      val shuffled = new scala.util.Random(seed).shuffle(bufs)
      val got = shuffled.foldLeft(a.zero)(a.merge)
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
