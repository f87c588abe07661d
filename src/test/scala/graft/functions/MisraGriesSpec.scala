package graft.functions

import graft.SparkSuite
import graft.queries.TextOps

class MisraGriesSpec extends SparkSuite {

  private def runStream(agg: MisraGriesAggregator, toks: Seq[String]): Map[String, Long] =
    toks.foldLeft(agg.zero)(agg.reduce)

  test("guarantees hold on a known stream: membership, no overcount, bounded undercount") {
    val agg = new MisraGriesAggregator(3)
    // 100 a, 50 b, 10 distinct fillers ×4 → n = 190, bound n/(cap+1) = 47
    val toks = Seq.fill(100)("a") ++ Seq.fill(50)("b") ++
      (1 to 10).flatMap(i => Seq.fill(4)(s"f$i"))
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = toks.length
    // guarantees must hold for ANY arrival order — exercise a few
    for (seed <- Seq(1, 7, 42)) {
      val sketch = runStream(agg, new scala.util.Random(seed).shuffle(toks))
      assert(sketch.size <= 3)
      exact.foreach { case (t, f) =>
        val est = sketch.getOrElse(t, 0L)
        assert(est <= f, s"overcount of $t (seed $seed)")
        assert((f - est) * 4 <= n, s"undercount bound broken for $t (seed $seed)")
        if (f * 4L > n) assert(sketch.contains(t), s"heavy $t missing (seed $seed)")
      }
    }
  }

  test("merge keeps the guarantees across arbitrary splits") {
    val agg = new MisraGriesAggregator(4)
    val toks = Seq.fill(60)("x") ++ Seq.fill(25)("y") ++
      (1 to 15).flatMap(i => Seq.fill(3)(s"f$i"))
    val n = toks.length // 130, bound n/5 = 26
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (cut <- Seq(1, 40, 65, 129)) {
      val (l, r) = toks.splitAt(cut)
      val merged = agg.merge(runStream(agg, l), runStream(agg, r))
      assert(merged.size <= 4)
      exact.foreach { case (t, f) =>
        val est = merged.getOrElse(t, 0L)
        assert(est <= f, s"overcount of $t (cut $cut)")
        assert((f - est) * 5 <= n, s"undercount bound broken for $t (cut $cut)")
        if (f * 5L > n) assert(merged.contains(t), s"heavy $t missing (cut $cut)")
      }
    }
  }

  test("c4_heavy_hitters emits the exact guaranteed-heavy set with true claims") {
    import org.apache.spark.sql.functions._
    val got = TextOps.c4HeavyHitters(spark, sf).collect()
    assert(got.nonEmpty)
    // all three in-plan guarantee claims must evaluate true (the oracle
    // hashes them as literal TRUE)
    got.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
        s"claim failed for ${r.getString(0)}")
    }
    // the emitted set == exact tokens with freq·(cap+1) > n
    val toks = graft.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok")).collect().map(_.getString(0))
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = exact.filter { case (_, f) => f * 200 > toks.length }.keySet
    assert(got.map(_.getString(0)).toSet == want)
    got.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
  }

  test("heavyHitterCandidates: sketch-only path brackets exact counts, no heavy token missed") {
    import org.apache.spark.sql.functions._
    val cap = 199
    val cands = TextOps.heavyHitterCandidates(spark, sf, cap).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(cands.nonEmpty && cands.size <= cap,
      "candidate set must be bounded by the sketch cap")
    val toks = graft.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok")).collect().map(_.getString(0))
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = toks.length.toLong
    // completeness: every truly-heavy token is a candidate
    exact.filter { case (_, f) => f * (cap + 1) > n }.keys.foreach { t =>
      assert(cands.contains(t), s"heavy token $t missing from candidates")
    }
    // bounds: est ≤ freq ≤ freq_upper; guaranteed_heavy implies heavy
    cands.foreach { case (t, (est, ub, guaranteed)) =>
      val f = exact(t)
      assert(est <= f && f <= ub, s"$t: exact $f outside [$est, $ub]")
      if (guaranteed) assert(f * (cap + 1) > n, s"$t: false heavy guarantee")
    }
  }
}
