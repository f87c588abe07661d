package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSuite {

  test("approx_count_distinct is within 10% of exact") {
    val approx = Relational.b2AggApprox(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Relational.b2AggDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (flag, n) =>
      val a = approx(flag)
      assert(math.abs(a - n).toDouble / n < 0.10, s"$flag: approx=$a exact=$n")
    }
  }

  test("cube contains rollup of both dimensions plus grand total") {
    val rows = Relational.b6Cube(spark, sf).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(grand.head.getLong(2) == total)
    // status-level margins sum to the grand total
    val statusMargins = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
    assert(statusMargins.map(_.getLong(2)).sum == total)
  }

  test("top-k plan avoids a global sort (TakeOrderedAndProject)") {
    val plan = Relational.b5TopK(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("broadcast joins are planned for dimension tables in b3_join_agg") {
    val plan = Relational.b3JoinAgg(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("filter and projection push into the parquet scan in b1") {
    val plan = Relational.b1FilterProject(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan.take(1200))
  }

  test("approx percentiles land within the GK sketch rank-error bound of exact") {
    val approx = Relational.b2PercentilesApprox(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Relational.b2Percentiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    // accuracy 10000 → rank error ≤ 1/10000; on these group sizes the
    // sketch is effectively exact-rank, so allow a loose 5% value slack
    // (quantile_cont interpolates between ranks, percentile_approx picks
    // an observed value).
    approx.foreach { case (k, (p50a, p90a)) =>
      val (p50e, p90e) = exact(k)
      assert(math.abs(p50a - p50e) / p50e < 0.05, s"$k p50 $p50a vs $p50e")
      assert(math.abs(p90a - p90e) / p90e < 0.05, s"$k p90 $p90a vs $p90e")
    }
  }

  test("range join broadcasts the interval side (fact side never shuffles for it)") {
    val plan = Relational.b3JoinRange(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("salted join spreads one key over `salts` composite keys") {
    import org.apache.spark.sql.functions._
    // The salted plan must produce exactly the unsalted aggregate (the
    // oracle asserts this too) and its join key must include the salt.
    val plan = Relational.b3JoinSalted(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("salt"), plan.take(800))
    val salted = Relational.b3JoinSalted(spark, sf).collect().map(_.toSeq).toSeq
    val plain = graft.Tables.load(spark, sf, "lineitem")
      .join(graft.Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(Exact.col(Exact.revenueSql).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
    assert(salted === plain)
  }
}
