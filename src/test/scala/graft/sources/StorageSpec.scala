package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Physical-layout verification: bucketed joins plan without a shuffle;
  * partitioned scans prune directories.
  */
class StorageSpec extends SparkSuite {

  test("bucketed join is shuffle-free (no Exchange on either side)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    Storage.writeBucketed(li, "li_b", "l_orderkey", 8)
    Storage.writeBucketed(o, "o_b", "o_orderkey", 8)
    // Disable auto-broadcast so the plan exercises the co-located
    // sort-merge path a 100 TB fact-fact join would take (at sf0.001
    // everything fits under the broadcast threshold).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(plan.contains("Bucketed: true"), plan.take(800))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      // one exchange is allowed for the final groupBy; the join adds none
      assert(exchanges <= 1, s"unexpected join shuffles:\n${plan.take(1500)}")
      // correctness unchanged
      val expect = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned write prunes on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events"
    val ev = graft.Tables.load(spark, sf, "events")
      .withColumn("event_date", to_date(col("ts")))
    Storage.writePartitioned(ev, dir, Seq("event_date"))
    val pruned = spark.read.parquet(dir)
      .filter(col("event_date") === "2024-01-02")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(800))
    val expected = ev.filter(to_date(col("ts")) === "2024-01-02").count()
    assert(pruned.count() == expected)
    assert(expected > 0)
  }
}
