package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group B — the relational capability surface (SURVEY.md §2.2/§2.3 B1-B7).
  *
  * The reference can only express these as hand-written Map/Reduce `.so`s
  * over string pairs (`/root/reference/src/tmapreduce/mrf.h:9-11`); here
  * they are first-class declarative plans so Catalyst gets pushdown,
  * pruning, partial aggregation, and join-strategy selection.
  *
  * Scale posture (100 TB): dimension tables (region/nation/customer/
  * supplier/part) are explicitly `broadcast()` so fact-side scans never
  * shuffle for them; the only shuffles left are fact-fact joins and final
  * aggregations, which partition on their own keys. Every query ends in a
  * deterministic ORDER BY for the oracle hash compare (cheap: runs on
  * already-aggregated, small results).
  */
object Relational {
  import Exact._

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** B1: filter + projection + scalar arithmetic; predicate and the
    * 4-column projection both push into the parquet scan.
    */
  def b1FilterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"),
        Exact.col(s"CAST($discPriceSql AS DOUBLE)").as("revenue"))
      .orderBy("l_orderkey", "l_linenumber")

  /** B2: TPC-H Q1-shaped hash aggregate (partial + final via Catalyst). */
  def b2AggQ1(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-06-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"), // integral doubles: exact in any order
        Exact.col(sumMoney("l_extendedprice")).as("sum_base_price"),
        Exact.col(sumDouble(discPriceSql)).as("sum_disc_price"),
        Exact.col(sumDouble(chargeSql)).as("sum_charge"),
        avg(col("l_quantity")).as("avg_qty"),
        Exact.col(avgMoney("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** B2g: variance / standard deviation with EXACT-sum discipline — the
    * dispersion statistics `stddev()`/`var_pop()` built-ins cannot
    * oracle-check (their internal double fold is partial-aggregation-
    * order dependent): accumulate n, Σx, Σx² as exact decimals (order-
    * independent), then derive mean / population variance / stddev with
    * ONE fixed IEEE expression per row rounded to 6dp — both engines
    * evaluate the identical tree, so the hash matches bitwise (the
    * c5_anomaly float discipline applied to the B2 surface).
    */
  def b2AggVar(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(18,6)")
    val agg = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"),
        sum((x * x).cast("decimal(28,6)")).as("sx2"))
    val mean = col("sx").cast("double") / col("n")
    // clamp at 0: E[x²]−mean² goes epsilon-NEGATIVE for a constant-valued
    // group (catastrophic cancellation), where Spark's sqrt would yield
    // NaN while DuckDB's ERRORS — greatest() in both trees keeps the
    // degenerate-but-valid input oracle-checkable
    val variance = greatest(
      col("sx2").cast("double") / col("n") - mean * mean, lit(0.0))
    agg.select(col("l_returnflag"), col("n"),
      round(mean, 6).as("mean_qty"),
      round(variance, 6).as("var_qty"),
      round(sqrt(variance), 6).as("stddev_qty"))
      .orderBy("l_returnflag")
  }

  /** B2i: covariance + Pearson correlation under the same exact-sum
    * discipline as [[b2AggVar]]: the five sufficient statistics
    * (n, Σx, Σy, Σxy, Σx², Σy²) are order-independent DECIMAL sums, so
    * partial-aggregation order can never drift the hash, and the final
    * cov/corr are one fixed IEEE expression per row (6dp-rounded) that
    * both engines evaluate identically — the dispersion surface the
    * `corr()`/`covar_pop()` built-ins cannot oracle-check (their
    * internal folds are engine-specific). Variances are clamped at 0
    * against catastrophic cancellation exactly as b2_agg_var.
    */
  def b2AggCorr(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(18,6)")
    val y = col("l_extendedprice").cast("decimal(18,6)")
    val agg = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum((x * y).cast("decimal(28,6)")).as("sxy"),
        sum((x * x).cast("decimal(28,6)")).as("sx2"),
        sum((y * y).cast("decimal(28,6)")).as("sy2"))
    def d(c: String) = col(c).cast("double")
    val cov = d("sxy") / col("n") - (d("sx") / col("n")) * (d("sy") / col("n"))
    val vx = greatest(
      d("sx2") / col("n") - (d("sx") / col("n")) * (d("sx") / col("n")), lit(0.0))
    val vy = greatest(
      d("sy2") / col("n") - (d("sy") / col("n")) * (d("sy") / col("n")), lit(0.0))
    agg.select(col("l_returnflag"), col("n"),
      round(cov, 6).as("cov_qty_price"),
      round(cov / sqrt(vx * vy), 6).as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** B2b: exact + distinct aggregation. */
  def b2AggDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd_parts"),
        countDistinct(col("l_suppkey")).as("nd_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** B3: the big fact-fact shuffle join (lineitem ⋈ orders) feeding an
    * aggregate, with customer/nation/region broadcast — revenue by nation
    * within one region (TPC-H Q5 shape).
    */
  def b3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region").filter(col("r_name") === "ASIA")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(Exact.col(revenueSql).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** B3b: broadcast-only dimension join (no fact-fact shuffle): order count
    * and total price by (region, mktsegment).
    */
  def b3JoinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        Exact.col(sumMoney("o_totalprice")).as("total_price"))
      .orderBy("r_name", "c_mktsegment")
  }

  /** B3c: LEFT SEMI — customers with at least one high-value order. */
  def b3JoinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_totalprice") > 400000.0)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** B3d: LEFT ANTI — customers with no high-value order. */
  def b3JoinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_totalprice") > 400000.0)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** B3i: NOT IN — the NULL-AWARE anti join, a genuinely different
    * execution path from [[b3JoinAnti]]'s left_anti: SQL's NOT IN is
    * three-valued (one NULL in the subquery makes every membership test
    * UNKNOWN and empties the result), so Catalyst must plan a
    * null-aware join whenever it cannot prove the build side non-null.
    * The `nullif(o_custkey, -1)` wrapper forces exactly that: the
    * column is typed nullable (the NAAJ plan is exercised — pinned in
    * RelationalSpec) while no null actually occurs (custkeys are
    * positive), so the result stays the non-degenerate anti-join rows
    * rather than the empty set the trap produces.
    */
  def b3JoinNotIn(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("graft_b3_customer")
    t(spark, dir, "orders").createOrReplaceTempView("graft_b3_orders")
    spark.sql(
      """SELECT c_custkey, c_name
        |FROM graft_b3_customer
        |WHERE c_custkey NOT IN
        |  (SELECT nullif(o_custkey, -1) FROM graft_b3_orders
        |   WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** B4: ranking window — top-3 orders per customer by price. */
  def b4WindowTopN(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** B4b: analytic window — running revenue per customer over time
    * (exact decimal running sum; both engines add in frame order).
    */
  def b4WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "orders")
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "running_spend")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** B4f: time-RANGE window frame — per event, how many events the same
    * user produced in the PRECEDING HOUR (RANGE BETWEEN, the value-based
    * frame `rowsBetween` cannot express: the frame is bounded by the
    * ORDER-BY VALUE, not a row count — the rate-limiting / rolling-rate
    * shape). Ordered by exact integer microseconds so the frame bounds
    * are integer comparisons in both engines; `count` keeps the
    * aggregate integer-exact. One shuffle on user_id.
    */
  def b4WindowRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("n_last_hour", count(lit(1)).over(w))
      .select("event_id", "user_id", "n_last_hour")
      .orderBy("event_id")
  }

  /** B4c: lag/lead — days since each customer's previous order. */
  def b4WindowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("days_since_prev",
        datediff(col("o_orderdate"), col("prev_date")))
      .select("o_custkey", "o_orderkey", "days_since_prev")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** B4d: per-group top-k via the typed bounded-heap UDAF
    * (graft.functions.TopKAggregator) — same result as b4_window_topn
    * (same oracle SQL) but the aggregation state is k rows per group, so
    * map-side combine shrinks the shuffle to O(groups·k). At 100 TB with
    * hot groups this is the right physical shape; the window form
    * materializes and sorts every row of every group at the window
    * operator. The oracle equality *is* the semantics check.
    */
  def b4WindowTopNAgg(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    val topk = new graft.functions.TopKAggregator[(Double, Long)](k, _._1, _._2)
      .toColumn.name("topk")
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(topk)
      .toDF("o_custkey", "topk")
      .select(col("o_custkey"), posexplode(col("topk")))
      .select(col("o_custkey"),
        col("col._2").as("o_orderkey"),
        col("col._1").as("o_totalprice"),
        (col("pos") + 1).cast("int").as("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** B4e: the full ranking-function family over one window —
    * rank/dense_rank (gap vs no-gap on price ties), ntile quartiles,
    * percent_rank and cume_dist (rational of two counts — both engines
    * perform the identical single double division, so the comparison is
    * bitwise-stable). Completes the §2.2 window-function row beyond
    * row_number/lag/running-sum.
    */
  def b4WindowRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** B5: global sort + limit (top-k): Spark plans this as TakeOrderedAndProject
    * — a per-partition top-k then a k-row merge, no full global sort.
    */
  def b5TopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")

  /** B5b: set operations — ((building ∩ positive-balance) ∪ big-spenders)
    * \ deep-debt, all on customer keys.
    */
  def b5SetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val positive = c.filter(col("c_acctbal") > 0.0).select(col("c_custkey"))
    val bigSpend = o.filter(col("o_totalprice") > 450000.0)
      .select(col("o_custkey").as("c_custkey"))
    val deepDebt = c.filter(col("c_acctbal") < -500.0).select(col("c_custkey"))
    building.intersect(positive)
      .union(bigSpend).distinct()
      .except(deepDebt)
      .orderBy("c_custkey")
  }

  /** B5c: DISTINCT / dropDuplicates. */
  def b5Distinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select("o_orderstatus", "o_orderpriority")
      .dropDuplicates()
      .orderBy("o_orderstatus", "o_orderpriority")

  /** B5d: correlated subqueries — customers above their nation's average
    * balance (a correlated SCALAR subquery) in nations that have at
    * least one negative balance (a correlated EXISTS). Expressed in SQL
    * because the surface under test is Catalyst's DECORRELATION: the
    * optimizer must rewrite both subqueries into aggregate + join plans
    * (no per-row subquery execution exists in Spark's engine at all —
    * a plan that fails to decorrelate fails to compile). The average is
    * compared as `balance · count > sum` in exact decimals, so no float
    * fold order enters the predicate and the oracle matches bitwise.
    */
  def b5SubqueryCorr(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("graft_b5_customer")
    spark.sql(
      """SELECT c_custkey, c_nationkey, c_acctbal
        |FROM graft_b5_customer o
        |WHERE CAST(c_acctbal AS DECIMAL(18,6)) *
        |        (SELECT COUNT(*) FROM graft_b5_customer i
        |         WHERE i.c_nationkey = o.c_nationkey)
        |      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6)))
        |         FROM graft_b5_customer i2
        |         WHERE i2.c_nationkey = o.c_nationkey)
        |  AND EXISTS (SELECT 1 FROM graft_b5_customer e
        |              WHERE e.c_nationkey = o.c_nationkey
        |                AND e.c_acctbal < 0)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** B6: ROLLUP — revenue by (nation, order-year) with subtotals and a
    * grand total; NULL grouping slots made explicit for the oracle.
    */
  def b6Rollup(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .withColumn("yr", year(col("o_orderdate")))
      .rollup(col("n_name"), col("yr"))
      .agg(Exact.col(sumMoney("o_totalprice")).as("total_price"),
        count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("yr"), lit(-1)).as("yr"),
        col("total_price"), col("n_orders"))
      .orderBy("nation", "yr")
  }

  /** B6b: CUBE — all grouping-set combinations of (orderstatus, priority). */
  def b6Cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Exact.col(sumMoney("o_totalprice")).as("total_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_price"))
      .orderBy("status", "priority")

  /** B2e: PIVOT — order totals restated wide (status columns per
    * priority row). Pivot values are EXPLICIT, which is the 100 TB form:
    * `pivot(col)` without values runs a driver-side distinct scan of the
    * pivot column before planning; the explicit list keeps the plan a
    * single pass. Oracle = the equivalent CASE-per-value aggregation.
    */
  def b2Pivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(Exact.col(sumMoney("o_totalprice")))
      .select(col("o_orderpriority").as("priority"),
        col("F").as("f_total"), col("O").as("o_total"), col("P").as("p_total"))
      .orderBy("priority")

  /** B6c: GROUPING SETS — the general form rollup/cube specialize; the
    * set list here ((status, priority), (status), ()) is rollup-shaped
    * but written explicitly through the groupingSets API, completing the
    * §2.2 grouping-analytics row alongside b6_rollup/b6_cube.
    */
  def b6GroupingSets(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Exact.col(sumMoney("o_totalprice")).as("total_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_price"))
      .orderBy("status", "priority")

  /** B3e: RANGE (non-equi) join — orders banded into price tiers via a
    * broadcast interval table and `lo <= v < hi`. Catalyst plans the
    * non-equi condition as a broadcast nested-loop join; with the band
    * side broadcast, the fact side never shuffles — the right shape for
    * interval lookup at 100 TB (a shuffle range join would need an
    * interval-partitioner). Bands are generated in-plan from `range()`
    * in both engines, so the two sides are structurally identical.
    */
  def b3JoinRange(spark: SparkSession, dir: String): DataFrame = {
    val bands = spark.range(0, 5)
      .select(col("id").as("band"),
        (col("id") * 100000L).cast("double").as("lo"),
        ((col("id") + 1L) * 100000L).cast("double").as("hi"))
    t(spark, dir, "orders")
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"),
        Exact.col(sumMoney("o_totalprice")).as("total_price"))
      .orderBy("band")
  }

  /** B3f: SALTED shuffle join — the manual skew-mitigation pattern: the
    * probe side gets a deterministic salt, the build side is replicated
    * once per salt value, and the join key becomes (key, salt) so one hot
    * key spreads over `salts` reducers. AQE's skew-join split is the
    * automatic version; this is the explicit form for engines/pipelines
    * that pin AQE off. Oracle = the UNSALTED equi-join (salting must not
    * change semantics — that is the point of the check).
    */
  def b3JoinSalted(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .withColumn("salt", pmod(col("l_linenumber"), lit(salts)))
    val o = t(spark, dir, "orders")
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    li.join(o, col("l_orderkey") === col("o_orderkey") && li("salt") === o("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(Exact.col(revenueSql).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  /** B3g: LEFT OUTER join — customers against their high-value orders,
    * keeping customers with none (the null-extended side), aggregated per
    * market segment with explicit null-side accounting. The most common
    * join kind after inner; the filter on the order side lives in the
    * join (pre-filtered build side), so null-extension semantics — not a
    * WHERE that would silently turn the join back into an inner — are
    * what the oracle checks.
    */
  def b3JoinOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_totalprice") > 400000.0)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_custkey")).as("n_customers"),
        count(col("o_orderkey")).as("n_big_orders"), // count(col) skips nulls
        countDistinct(when(col("o_orderkey").isNull, col("c_custkey")))
          .as("n_without"),
        Exact.col(sumMoney("o_totalprice")).as("big_total"))
      .orderBy("c_mktsegment")
  }

  /** B3h: FULL OUTER join — one segment's customers against the distinct
    * buyers of high-value orders; rows classify as customer-only /
    * order-only / both, which exercises null extension on BOTH sides.
    */
  def b3JoinOuterFull(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey")).distinct()
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        when(col("c_custkey").isNull, "order_only")
          .when(col("o_custkey").isNull, "customer_only")
          .otherwise("both").as("side"))
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n"))
      .orderBy("side")
  }

  /** B8: bucketed-storage join — both fact tables persisted bucketed (and
    * sorted) on the join key via sources/Storage, so the join plans with
    * NO exchange on either side: SortMergeJoin reads co-located buckets
    * straight off disk. At 100 TB this converts the lineitem⋈orders
    * shuffle — the single largest network cost in the corpus — into a
    * one-time layout decision; every subsequent join on the key is
    * shuffle-free. Shuffle-freedom is pinned in PlanAuditSpec; the oracle
    * is the plain join (layout must not change semantics).
    */
  import graft.sources.Storage.{dropStaleLayouts, sourceFingerprint}

  /** Ensure the bucketed lineitem/orders layout exists for `dir`; returns
    * the (lineitem, orders) catalog table names. The layout write is a
    * ONE-TIME decision (that is the operator's whole point), so it is
    * idempotent per session: reruns in the same session (bench reruns,
    * repeated timings) measure the join, not the write. Table names are
    * keyed by a source fingerprint so two corpora in one session — or a
    * REGENERATED corpus at the same path — never alias a stale layout.
    * Exposed (via [[warmLayouts]]) so Bench can pay the write BEFORE
    * timing: the timed query then measures steady-state join cost, which
    * is the number a 2x perf gate should see.
    */
  private[graft] def ensureB8BucketedLayout(
      spark: SparkSession, dir: String, buckets: Int = 8): (String, String) = {
    val suffix = sourceFingerprint(s"$dir/lineitem.parquet", s"$dir/orders.parquet")
    val (ltab, otab) = (s"graft_b8_lineitem_$suffix", s"graft_b8_orders_$suffix")
    if (!spark.catalog.tableExists(ltab) || !spark.catalog.tableExists(otab)) {
      dropStaleLayouts(spark, "graft_b8_lineitem_", suffix)
      dropStaleLayouts(spark, "graft_b8_orders_", suffix)
    }
    if (!spark.catalog.tableExists(ltab))
      graft.sources.Storage.writeBucketed(
        t(spark, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount"),
        ltab, "l_orderkey", buckets)
    if (!spark.catalog.tableExists(otab))
      graft.sources.Storage.writeBucketed(
        t(spark, dir, "orders").select("o_orderkey", "o_orderpriority"),
        otab, "o_orderkey", buckets)
    (ltab, otab)
  }

  /** Build every one-time layout the relational surface depends on (the
    * b8 bucketed join tables and the partitioned events copy) without
    * running the queries — Bench's warmup hook.
    */
  private[graft] def warmLayouts(spark: SparkSession, dir: String): Unit = {
    ensureB8BucketedLayout(spark, dir)
    ensureB8PartitionedLayout(spark, dir)
  }

  def b8BucketedJoin(spark: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    val (ltab, otab) = ensureB8BucketedLayout(spark, dir, buckets)
    spark.table(ltab)
      .join(spark.table(otab),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(Exact.col(revenueSql).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  /** B8b: partition-pruned scan — the events table persisted
    * directory-per-day (`sources/Storage.writePartitioned`, the standard
    * time-series layout), then queried with a date predicate: the scan
    * reads ONLY the matching directories (`PartitionFilters` in the scan
    * node, pinned in PlanAuditSpec). At 100 TB this is the difference
    * between reading 5 days and reading 30 — pruning happens at file
    * listing, before any I/O. Oracle = the same filter over the unlaid
    * table (layout must not change semantics).
    */
  /** Ensure the date-partitioned events layout exists for `dir`; returns
    * its path. One-time and idempotent per session (see
    * [[ensureB8BucketedLayout]]); completion is detected via the writer's
    * _SUCCESS marker so a half-written layout is re-written, never
    * trusted, and the name is fingerprint-keyed so a regenerated events
    * table at the same path gets a fresh layout instead of the stale one.
    */
  private[graft] def ensureB8PartitionedLayout(
      spark: SparkSession, dir: String): String = {
    val out = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:") +
      s"/graft_b8_events_bydate_${sourceFingerprint(s"$dir/events.parquet")}"
    if (!new java.io.File(out, "_SUCCESS").exists()) {
      dropStaleLayouts(spark, "graft_b8_events_bydate_",
        out.substring(out.lastIndexOf('_') + 1))
      graft.sources.Storage.writePartitioned(
        t(spark, dir, "events")
          .select(col("ts"), col("event_type"), col("value"),
            to_date(col("ts")).as("event_date")),
        out, Seq("event_date"))
    }
    out
  }

  def b8PartitionedScan(spark: SparkSession, dir: String): DataFrame = {
    val out = ensureB8PartitionedLayout(spark, dir)
    spark.read.parquet(out)
      .filter(col("event_date").between("2024-01-05", "2024-01-09"))
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Exact.col("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").as("sum_value"))
      .orderBy("event_date", "event_type")
  }

  /** B2c: approximate distinct (HLL++) — the sketch path for COUNT
    * DISTINCT at scale. The raw estimate is engine-specific, so it is not
    * an output column; instead the row carries the exact twin AND
    * `within_bound` = |estimate − exact| ≤ 3·rsd·exact, evaluated inside
    * the Spark plan (rsd = 0.02, so a 6% tolerance — HLL++ at that rsd is
    * virtually always inside 3 standard deviations). This makes the query
    * fully oracle-checkable: DuckDB supplies the exact columns and
    * literal TRUE for the bound claim — if the sketch ever drifts out of
    * bound, the hash mismatches and the driver flags it.
    */
  def b2AggApprox(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("est"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("exact_parts"), col("n_rows"),
        (abs(col("est") - col("exact_parts")).cast("double") <=
          lit(3 * 0.02) * col("exact_parts").cast("double")).as("within_bound"))
      .orderBy("l_returnflag")

  /** B2d: exact percentiles (median/p90) of order value per status —
    * `percentile` is Spark's exact interpolated quantile, matching
    * DuckDB's `quantile_cont` definition.
    */
  def b2Percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        Exact.col("round(percentile(o_totalprice, 0.5), 4)").as("p50"),
        Exact.col("round(percentile(o_totalprice, 0.9), 4)").as("p90"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** B2e: approximate percentiles via the GK quantile sketch
    * (`percentile_approx`) — the 100 TB path: exact `percentile` buffers
    * every group value in the aggregation state, while the sketch is
    * bounded-size and mergeable (map-side partial aggregation works).
    * The sketch value itself is engine-specific, so (as in b2_agg_approx)
    * the output carries the exact quantiles plus in-plan bound checks:
    * the GK estimate at accuracy 10000 has rank error 1e-4; we assert the
    * 100×-headroom claim that it lies between the exact quantiles at
    * q ± 0.01 — DuckDB supplies TRUE, a drifting sketch breaks the hash.
    */
  def b2PercentilesApprox(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile_approx(o_totalprice, array(0.5D, 0.9D), 10000)").as("pcts"),
        Exact.col("round(percentile(o_totalprice, 0.5), 4)").as("p50"),
        Exact.col("round(percentile(o_totalprice, 0.9), 4)").as("p90"),
        expr("percentile(o_totalprice, array(0.49D, 0.51D, 0.89D, 0.91D))").as("brackets"),
        count(lit(1)).as("n"))
      .select(col("o_orderstatus"), col("p50"), col("p90"), col("n"),
        element_at(col("pcts"), 1).between(
          element_at(col("brackets"), 1), element_at(col("brackets"), 2))
          .as("p50_in_bound"),
        element_at(col("pcts"), 2).between(
          element_at(col("brackets"), 3), element_at(col("brackets"), 4))
          .as("p90_in_bound"))
      .orderBy("o_orderstatus")

  /** B7: scalar function surface — string, date, JSON, math — over events. */
  def b7ScalarFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        col("event_id"),
        upper(col("event_type")).as("etype_upper"),
        length(col("event_type")).as("etype_len"),
        substring(col("event_type"), 1, 3).as("etype_pre"),
        year(col("ts")).as("yr"),
        month(col("ts")).as("mon"),
        dayofmonth(col("ts")).as("dom"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        // Exact-decimal arithmetic: double round() differs between engines
        // (Spark rounds the exact binary value, DuckDB the shortest decimal
        // repr); both convert double→decimal via the shortest repr, so this
        // is bitwise-reproducible (see Exact).
        Exact.col("CAST(round(CAST(value AS DECIMAL(18,6)) * CAST(2.5 AS DECIMAL(3,1)), 2) AS DOUBLE)")
          .as("scaled"))
      .orderBy("event_id")

  // ---- oracle SQL (DuckDB). Shared decimal expressions come from Exact so
  // both engines evaluate structurally identical arithmetic. ----
  val oracle: Map[String, String] = Map(
    "b1_filter_project" ->
      (s"SELECT l_orderkey, l_linenumber, CAST($discPriceSql AS DOUBLE) AS revenue " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05 " +
        "ORDER BY l_orderkey, l_linenumber"),
    "b2_agg_q1" ->
      (s"SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, " +
        s"${sumMoney("l_extendedprice")} AS sum_base_price, " +
        s"${sumDouble(discPriceSql)} AS sum_disc_price, " +
        s"${sumDouble(chargeSql)} AS sum_charge, " +
        "AVG(l_quantity) AS avg_qty, " +
        s"${avgMoney("l_discount")} AS avg_disc, " +
        "COUNT(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-06-01' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    // n/Σx/Σx² as exact decimals, then ONE fixed double expression per
    // row (cast, divide, multiply, subtract, sqrt — identical IEEE tree
    // in both engines) rounded to 6dp.
    "b2_agg_var" ->
      ("WITH a AS (SELECT l_returnflag, count(*) AS n, " +
        "SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sx, " +
        "SUM(CAST(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6)) " +
        "AS DECIMAL(28,6))) AS sx2 " +
        "FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, n, " +
        "round(CAST(sx AS DOUBLE)/n, 6) AS mean_qty, " +
        "round(greatest(CAST(sx2 AS DOUBLE)/n - (CAST(sx AS DOUBLE)/n)*(CAST(sx AS DOUBLE)/n), 0), 6) AS var_qty, " +
        "round(sqrt(greatest(CAST(sx2 AS DOUBLE)/n - (CAST(sx AS DOUBLE)/n)*(CAST(sx AS DOUBLE)/n), 0)), 6) AS stddev_qty " +
        "FROM a ORDER BY l_returnflag"),
    "b2_agg_corr" ->
      ("WITH a AS (SELECT l_returnflag, count(*) AS n, " +
        "SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sx, " +
        "SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy, " +
        // first operand widened to DECIMAL(28,6): DuckDB multiplies
        // width-18 decimals in int64, which overflows on extendedprice
        // products — the wider cast forces its INT128 path. The product
        // value and the 6dp-rounded cast are identical either way.
        "SUM(CAST(CAST(l_quantity AS DECIMAL(28,6)) * CAST(l_extendedprice AS DECIMAL(18,6)) " +
        "AS DECIMAL(28,6))) AS sxy, " +
        "SUM(CAST(CAST(l_quantity AS DECIMAL(28,6)) * CAST(l_quantity AS DECIMAL(18,6)) " +
        "AS DECIMAL(28,6))) AS sx2, " +
        "SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,6)) * CAST(l_extendedprice AS DECIMAL(18,6)) " +
        "AS DECIMAL(28,6))) AS sy2 " +
        "FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, n, " +
        "round(CAST(sxy AS DOUBLE)/n - (CAST(sx AS DOUBLE)/n)*(CAST(sy AS DOUBLE)/n), 6) AS cov_qty_price, " +
        "round((CAST(sxy AS DOUBLE)/n - (CAST(sx AS DOUBLE)/n)*(CAST(sy AS DOUBLE)/n)) / " +
        "sqrt(greatest(CAST(sx2 AS DOUBLE)/n - (CAST(sx AS DOUBLE)/n)*(CAST(sx AS DOUBLE)/n), 0) * " +
        "greatest(CAST(sy2 AS DOUBLE)/n - (CAST(sy AS DOUBLE)/n)*(CAST(sy AS DOUBLE)/n), 0)), 6) AS corr_qty_price " +
        "FROM a ORDER BY l_returnflag"),
    "b3_join_notin" ->
      ("SELECT c_custkey, c_name FROM customer " +
        "WHERE c_custkey NOT IN " +
        "(SELECT nullif(o_custkey, -1) FROM orders WHERE o_totalprice > 400000.0) " +
        "ORDER BY c_custkey"),
    "b2_agg_distinct" ->
      ("SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS nd_parts, " +
        "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS nd_supps, COUNT(*) AS n_rows " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "b3_join_agg" ->
      (s"SELECT n_name, $revenueSql AS revenue, COUNT(*) AS n_items " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name"),
    "b3_join_broadcast" ->
      (s"SELECT r_name, c_mktsegment, COUNT(*) AS n_orders, " +
        s"${sumMoney("o_totalprice")} AS total_price " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name, c_mktsegment ORDER BY r_name, c_mktsegment"),
    "b3_join_semi" ->
      ("SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0) " +
        "ORDER BY c_custkey"),
    "b3_join_anti" ->
      ("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0) " +
        "ORDER BY c_custkey"),
    "b4_window_topn" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, rn FROM " +
        "(SELECT o_custkey, o_orderkey, o_totalprice, CAST(row_number() OVER " +
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn " +
        "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"),
    // Same semantics through the bounded-heap typed UDAF — identical SQL.
    "b4_window_topn_agg" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, rn FROM " +
        "(SELECT o_custkey, o_orderkey, o_totalprice, CAST(row_number() OVER " +
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn " +
        "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "b4_window_running" ->
      ("SELECT o_custkey, o_orderkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend " +
        "FROM orders ORDER BY o_custkey, o_orderkey"),
    "b4_window_lag" ->
      ("SELECT o_custkey, o_orderkey, CAST(date_diff('day', " +
        "lag(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), " +
        "o_orderdate) AS INT) AS days_since_prev " +
        "FROM orders ORDER BY o_custkey, o_orderkey"),
    // RANGE frame over exact integer microseconds; ties (equal us) are
    // frame PEERS in both engines, so no tie-break is needed.
    "b4_window_range" ->
      ("SELECT event_id, user_id, count(*) OVER " +
        "(PARTITION BY user_id ORDER BY epoch_us(ts) " +
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour " +
        "FROM events ORDER BY event_id"),
    "b4_window_ranks" ->
      ("SELECT o_orderpriority, o_orderkey, " +
        "CAST(rank() OVER w AS INT) AS rnk, " +
        "CAST(dense_rank() OVER w AS INT) AS drnk, " +
        "CAST(ntile(4) OVER w AS INT) AS quartile, " +
        "percent_rank() OVER w AS pct_rank, " +
        "cume_dist() OVER w AS cdist " +
        "FROM orders WINDOW w AS " +
        "(PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) " +
        "ORDER BY o_orderpriority, o_orderkey"),
    "b5_topk" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100"),
    "b5_setops" ->
      ("SELECT c_custkey FROM (" +
        "SELECT c_custkey FROM (" +
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' " +
        "INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 0.0) " +
        "UNION SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000.0) " +
        "EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal < -500.0) " +
        "ORDER BY c_custkey"),
    "b5_distinct" ->
      ("SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders " +
        "ORDER BY o_orderstatus, o_orderpriority"),
    "b5_subquery_corr" ->
      ("SELECT c_custkey, c_nationkey, c_acctbal FROM customer o " +
        "WHERE CAST(c_acctbal AS DECIMAL(18,6)) * " +
        "(SELECT COUNT(*) FROM customer i " +
        "WHERE i.c_nationkey = o.c_nationkey) " +
        "> (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) FROM customer i2 " +
        "WHERE i2.c_nationkey = o.c_nationkey) " +
        "AND EXISTS (SELECT 1 FROM customer e " +
        "WHERE e.c_nationkey = o.c_nationkey AND e.c_acctbal < 0) " +
        "ORDER BY c_custkey"),
    "b6_rollup" ->
      (s"SELECT COALESCE(n_name, 'ALL') AS nation, COALESCE(yr, -1) AS yr, " +
        "total_price, n_orders FROM (" +
        s"SELECT n_name, yr, ${sumMoney("o_totalprice")} AS total_price, COUNT(*) AS n_orders " +
        "FROM (SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr, o_totalprice " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey) " +
        "GROUP BY ROLLUP(n_name, yr)) ORDER BY nation, yr"),
    "b2_percentiles" ->
      ("SELECT o_orderstatus, round(quantile_cont(o_totalprice, 0.5), 4) AS p50, " +
        "round(quantile_cont(o_totalprice, 0.9), 4) AS p90, COUNT(*) AS n " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    // Approx twins: DuckDB supplies the exact columns and TRUE for the
    // in-plan sketch-bound claims (the sketch estimate itself is engine-
    // specific and deliberately not an output column).
    "b2_agg_approx" ->
      ("SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts, " +
        "COUNT(*) AS n_rows, TRUE AS within_bound " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "b2_percentiles_approx" ->
      ("SELECT o_orderstatus, round(quantile_cont(o_totalprice, 0.5), 4) AS p50, " +
        "round(quantile_cont(o_totalprice, 0.9), 4) AS p90, COUNT(*) AS n, " +
        "TRUE AS p50_in_bound, TRUE AS p90_in_bound " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "b6_cube" ->
      (s"SELECT COALESCE(o_orderstatus, 'ALL') AS status, " +
        "COALESCE(o_orderpriority, 'ALL') AS priority, " +
        s"COUNT(*) AS n_orders, ${sumMoney("o_totalprice")} AS total_price " +
        "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) " +
        "ORDER BY status, priority"),
    "b2_pivot" ->
      ("SELECT o_orderpriority AS priority, " +
        "CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS DECIMAL(12,2))) AS DOUBLE) AS f_total, " +
        "CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END AS DECIMAL(12,2))) AS DOUBLE) AS o_total, " +
        "CAST(SUM(CAST(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END AS DECIMAL(12,2))) AS DOUBLE) AS p_total " +
        "FROM orders GROUP BY 1 ORDER BY 1"),
    "b6_grouping_sets" ->
      (s"SELECT COALESCE(o_orderstatus, 'ALL') AS status, " +
        "COALESCE(o_orderpriority, 'ALL') AS priority, " +
        s"COUNT(*) AS n_orders, ${sumMoney("o_totalprice")} AS total_price " +
        "FROM orders GROUP BY GROUPING SETS " +
        "((o_orderstatus, o_orderpriority), (o_orderstatus), ()) " +
        "ORDER BY status, priority"),
    "b3_join_range" ->
      (s"SELECT band, COUNT(*) AS n_orders, ${sumMoney("o_totalprice")} AS total_price " +
        "FROM orders JOIN (SELECT range AS band, " +
        "CAST(range * 100000 AS DOUBLE) AS lo, CAST((range + 1) * 100000 AS DOUBLE) AS hi " +
        "FROM range(0, 5)) ON o_totalprice >= lo AND o_totalprice < hi " +
        "GROUP BY band ORDER BY band"),
    "b3_join_outer" ->
      ("SELECT c_mktsegment, CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers, " +
        "COUNT(o_orderkey) AS n_big_orders, " +
        "CAST(COUNT(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END) AS BIGINT) " +
        "AS n_without, " +
        s"${sumMoney("o_totalprice")} AS big_total " +
        "FROM customer LEFT OUTER JOIN orders " +
        "ON c_custkey = o_custkey AND o_totalprice > 400000.0 " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "b3_join_outer_full" ->
      ("SELECT side, count(*) AS n FROM (" +
        "SELECT CASE WHEN c_custkey IS NULL THEN 'order_only' " +
        "WHEN o_custkey IS NULL THEN 'customer_only' ELSE 'both' END AS side " +
        "FROM (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') c " +
        "FULL OUTER JOIN (SELECT DISTINCT o_custkey FROM orders " +
        "WHERE o_totalprice > 400000.0) o ON c_custkey = o_custkey) " +
        "GROUP BY side ORDER BY side"),
    "b8_partitioned_scan" ->
      ("SELECT CAST(ts AS DATE) AS event_date, event_type, " +
        "count(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value " +
        "FROM events " +
        "WHERE CAST(ts AS DATE) BETWEEN '2024-01-05' AND '2024-01-09' " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    // Layout must not change semantics: the bucketed join's oracle is the
    // plain join.
    "b8_bucketed_join" ->
      (s"SELECT o_orderpriority, $revenueSql AS revenue, COUNT(*) AS n_items " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "b3_join_salted" ->
      (s"SELECT o_orderpriority, $revenueSql AS revenue, COUNT(*) AS n_items " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "b7_scalar_fns" ->
      ("SELECT event_id, upper(event_type) AS etype_upper, " +
        "CAST(length(event_type) AS INT) AS etype_len, " +
        "substring(event_type, 1, 3) AS etype_pre, " +
        "CAST(year(ts) AS INT) AS yr, CAST(month(ts) AS INT) AS mon, " +
        "CAST(day(ts) AS INT) AS dom, " +
        "strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_str, " +
        "CAST(regexp_extract(props, '[0-9]+') AS INT) AS k, " +
        "CAST(round(CAST(value AS DECIMAL(18,6)) * CAST(2.5 AS DECIMAL(3,1)), 2) AS DOUBLE) AS scaled " +
        "FROM events ORDER BY event_id")
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b1_filter_project" -> (b1FilterProject _),
    "b2_agg_q1" -> (b2AggQ1 _),
    "b2_agg_distinct" -> (b2AggDistinct _),
    "b3_join_agg" -> (b3JoinAgg _),
    "b3_join_broadcast" -> (b3JoinBroadcast _),
    "b3_join_semi" -> (b3JoinSemi _),
    "b3_join_anti" -> (b3JoinAnti _),
    "b3_join_range" -> (b3JoinRange _),
    "b3_join_salted" -> ((s: SparkSession, d: String) => b3JoinSalted(s, d)),
    "b3_join_outer" -> (b3JoinOuter _),
    "b3_join_outer_full" -> (b3JoinOuterFull _),
    "b8_bucketed_join" -> ((s: SparkSession, d: String) => b8BucketedJoin(s, d)),
    "b8_partitioned_scan" -> (b8PartitionedScan _),
    "b4_window_topn" -> (b4WindowTopN _),
    "b4_window_topn_agg" -> ((s: SparkSession, d: String) => b4WindowTopNAgg(s, d)),
    "b4_window_running" -> (b4WindowRunning _),
    "b4_window_lag" -> (b4WindowLag _),
    "b4_window_range" -> (b4WindowRange _),
    "b2_agg_var" -> (b2AggVar _),
    "b2_agg_corr" -> (b2AggCorr _),
    "b3_join_notin" -> (b3JoinNotIn _),
    "b4_window_ranks" -> (b4WindowRanks _),
    "b5_topk" -> (b5TopK _),
    "b5_setops" -> (b5SetOps _),
    "b5_distinct" -> (b5Distinct _),
    "b5_subquery_corr" -> (b5SubqueryCorr _),
    "b6_rollup" -> (b6Rollup _),
    "b6_cube" -> (b6Cube _),
    "b6_grouping_sets" -> (b6GroupingSets _),
    "b2_pivot" -> (b2Pivot _),
    "b2_agg_approx" -> (b2AggApprox _),
    "b2_percentiles" -> (b2Percentiles _),
    "b2_percentiles_approx" -> (b2PercentilesApprox _),
    "b7_scalar_fns" -> (b7ScalarFns _)
  )
}
