package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The bounded smallest-ids cap must equal global sort-take for any
  * input, any partition split, and any merge order (the partial-agg
  * license), and its ride-along count must be exact — the two facts
  * the per-band-bucket candidate cap (DedupOps.capBuckets) and its
  * loud-drop reporting rest on.
  */
class BoundedMinIdsSpec extends AnyFunSuite {

  private def mk(cap: Int) = new BoundedMinIds(cap)

  test("reduce keeps the cap smallest in ascending order; count is total") {
    val a = mk(3)
    val r = Seq(9L, 1L, 7L, 3L, 5L).foldLeft(a.zero)(a.reduce)
    assert(r == (Vector(1L, 3L, 5L), 5L))
  }

  test("merge is commutative, bounded, and count-additive") {
    val a = mk(2)
    val b1 = Seq(5L, 3L).foldLeft(a.zero)(a.reduce)
    val b2 = Seq(4L, 2L, 8L).foldLeft(a.zero)(a.reduce)
    assert(a.merge(b1, b2) == a.merge(b2, b1))
    assert(a.merge(b1, b2) == (Vector(2L, 3L), 5L))
  }

  test("ScalaCheck: any split + merge order == sorted take-cap, exact count") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      cap <- Gen.choose(1, 8)
      xs <- Gen.listOf(Gen.choose(0L, 50L))
      cuts <- Gen.listOf(Gen.choose(0, math.max(xs.length, 1)))
    } yield (cap, xs, cuts)
    val prop = Prop.forAll(gen) { case (cap, xs, cuts) =>
      val a = mk(cap)
      // split into partitions at the (sorted, deduped) cut points
      val bounds = (cuts.filter(_ <= xs.length) :+ 0 :+ xs.length).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (s, e) => xs.slice(s, e) }
      val merged = parts
        .map(p => p.foldLeft(a.zero)(a.reduce))
        .foldLeft(a.zero)(a.merge)
      merged == ((xs.sorted.take(cap).toVector, xs.length.toLong))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
