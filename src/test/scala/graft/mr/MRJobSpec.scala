package graft.mr

import graft.SparkSuite

/** MRJob kernel correctness vs a 15-line in-memory reimplementation of the
  * reference semantics (`/root/reference/src/tmapreduce/job.cc:10-77`):
  * sort by key → map → group exactly → sort keys → reduce (sorted values,
  * the documented deviation) → concat in key order.
  */
class MRJobSpec extends SparkSuite {

  /** The reference pipeline, naively (job.cc:10-77 + master.cc:736-738). */
  def naiveLocalMR(
      input: Seq[(String, String)],
      mapFn: MRJob.MapFn,
      reduceFn: MRJob.ReduceFn): Seq[String] = {
    val mapped = input.sortBy(_._1).flatMap { case (k, v) => mapFn(k, v) }
    val grouped = mapped.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toSeq.sortBy(_._1)
    grouped.flatMap { case (k, vs) => reduceFn(k, vs) }
  }

  /** Seeded random KV lists — keys/values include empties, spaces, and
    * shared prefixes to exercise sorting and grouping edges.
    */
  def randomKvs(rng: scala.util.Random): List[(String, String)] = {
    val keys = Array("a", "b", "cc", "d e", "", "z9", "Z", "0")
    val vals = Array("1", "2", "10", "x y", "", "7", "q")
    List.fill(1 + rng.nextInt(30))(
      (keys(rng.nextInt(keys.length)), vals(rng.nextInt(vals.length))))
  }

  test("wordcount matches naive reference semantics (20 seeded samples)") {
    val mapFn = JobTypeRegistry.wordCountMap
    val reduceFn: MRJob.ReduceFn =
      (k, vs) => Iterator.single(s"$k=${vs.size}")
    val rng = new scala.util.Random(42)
    for (i <- 1 to 20) {
      val kvs = randomKvs(rng)
      val got = MRJob.runLocal(spark, kvs, mapFn, reduceFn,
        mappers = 1 + rng.nextInt(4), reducers = 1 + rng.nextInt(4))
      val want = naiveLocalMR(kvs, mapFn, reduceFn)
      assert(got == want, s"sample $i: $kvs")
    }
  }

  test("multi-emission reduce preserves per-group emission order") {
    val mapFn: MRJob.MapFn = (k, v) => Iterator.single((k, v))
    val reduceFn: MRJob.ReduceFn = (k, vs) => vs.iterator.map(v => s"$k:$v")
    val input = Seq(("b", "2"), ("a", "1"), ("b", "1"), ("a", "3"))
    val got = MRJob.runLocal(spark, input, mapFn, reduceFn)
    assert(got == Seq("a:1", "a:3", "b:1", "b:2"))
  }

  test("result is invariant under mapper/reducer counts (SURVEY §7.7-4)") {
    val input = Seq(("k1", "a b a"), ("k2", "b c"), ("k3", "a"))
    val reduceFn: MRJob.ReduceFn = (k, vs) => Iterator.single(s"$k=${vs.size}")
    val expected =
      MRJob.runLocal(spark, input, JobTypeRegistry.wordCountMap, reduceFn, 1, 1)
    for (m <- Seq(2, 5); r <- Seq(2, 7)) {
      val got = MRJob.runLocal(
        spark, input, JobTypeRegistry.wordCountMap, reduceFn, m, r)
      assert(got == expected, s"mappers=$m reducers=$r")
    }
  }

  test("empty map output short-circuits to empty result (O9, master.cc:624-627)") {
    val mapFn: MRJob.MapFn = (_, _) => Iterator.empty
    val got = MRJob.runLocal(spark, Seq(("a", "b")), mapFn,
      JobTypeRegistry.sumReduce)
    assert(got.isEmpty)
  }

  test("golden char count matches word_count.cc filter semantics") {
    // Inline fixture mirroring scripts/single_node.sh's 3-row curl smoke.
    val input = Seq(
      ("f1", "Ab1 cd!"), ("f2", "b-b 2"), ("f3", ""))
    val got = MRJob.runLocal(
      spark, input, JobTypeRegistry.charCountMap, JobTypeRegistry.sumReduce)
    // chars retained (lowercased, [a-z0-9] only):
    // f1: a b 1 c d ; f2: b b 2 ; f3: none
    // key order: 1 2 a b c d -> counts 1 1 1 3 1 1
    assert(got == Seq("1", "1", "1", "3", "1", "1"))
  }

  test("declared-combiner path equals the uncombined path (ScalaCheck)") {
    // The combiner contract (MRJob.CombineFn): for a reduce that only
    // depends on the commutative-monoid fold of its values,
    //   run(..., combineFn = Some(c)) == run(..., combineFn = None)
    // for EVERY value multiset and every mapper/reducer split. Pin it for
    // the three monoid families the registry ships (sum, max, value-ignore)
    // over random inputs — this is what licenses MRJob's map-side partial
    // aggregation replacing the reference's ship-every-pair shuffle.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sum: MRJob.ReduceFn =
      (k, vs) => Iterator.single(s"$k=${vs.iterator.map(_.toLong).sum}")
    val max: MRJob.ReduceFn =
      (k, vs) => Iterator.single(s"$k=${vs.iterator.map(_.toLong).max}")
    val monoids: Seq[(MRJob.CombineFn, MRJob.ReduceFn)] = Seq(
      (JobTypeRegistry.sumCombine, sum),
      ((a, b) => if (a.toLong >= b.toLong) a else b, max),
      (JobTypeRegistry.anyCombine, JobTypeRegistry.distinctReduce))
    val kvGen = for {
      k <- Gen.oneOf("a", "b", "cc", "d e", "", "z9")
      v <- Gen.chooseNum(-50L, 50L)
    } yield (k, v.toString)
    val dataGen = for {
      kvs <- Gen.nonEmptyListOf(kvGen)
      m <- Gen.chooseNum(1, 5)
      r <- Gen.chooseNum(1, 5)
    } yield (kvs, m, r)
    val prop = Prop.forAll(dataGen) { case (kvs, m, r) =>
      monoids.forall { case (c, reduceFn) =>
        val plain = MRJob.runLocal(spark, kvs, JobTypeRegistry.identityMap,
          reduceFn, m, r)
        val combined = MRJob.runLocal(spark, kvs, JobTypeRegistry.identityMap,
          reduceFn, m, r, combineFn = Some(c))
        combined == plain
      }
    }
    val res =
      SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("invalid parallelism is rejected (master.cc:530-532)") {
    intercept[IllegalArgumentException] {
      MRJob.runLocal(spark, Seq(("a", "b")), JobTypeRegistry.identityMap,
        JobTypeRegistry.sumReduce, mappers = 0)
    }
  }
}
