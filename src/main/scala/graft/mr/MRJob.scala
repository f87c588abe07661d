package graft.mr

import org.apache.spark.sql.{Dataset, SparkSession}

/** The tMapReduce job kernel, re-expressed as a Spark Dataset pipeline.
  *
  * Reference semantics (all cites into /root/reference):
  *  - input is a list of opaque string KV pairs, sorted bytewise by key at
  *    launch (`src/tmapreduce/master.cc:736-738`);
  *  - the sorted input is split into `mapper_num` contiguous ranges
  *    (`src/tmapreduce/job.cc:10-28`) — ≙ range partitioning;
  *  - user Map is a per-record flatMap `(k,v) => Seq[(k',v')]`
  *    (`src/tmapreduce/mrf.h:9`, bridge `src/tmapreduce/wrapper.cc:10-31`);
  *  - Merge groups all values per key exactly once and sorts keys ascending
  *    (`src/tmapreduce/job.cc:45-66`) — in the reference this is a
  *    single-threaded std::map on the master; here it is Spark's
  *    distributed shuffle (the whole point of the re-architecture);
  *  - user Reduce is a per-group flatMap `(k, values) => Seq[out]`
  *    (`src/tmapreduce/mrf.h:11`, `src/tmapreduce/wrapper.cc:33-55`);
  *  - final result concatenates group outputs in ascending key order
  *    (`src/tmapreduce/job.cc:68-77`).
  *
  * Documented deviation (SURVEY.md §2.1 note 3): within a key, the
  * reference presents values in map-subjob emission order, which is not
  * reproducible in any distributed engine; we define the value order as
  * SORTED for determinism. Commutative reduces (the reference's own
  * implicit contract — it re-executes subjobs at-least-once) see no
  * difference.
  *
  * Scale note: `flatMapGroups` materializes one key's values at a time on
  * one task — the per-key value list must fit in executor memory. That is
  * inherent to the MapReduce Reduce contract itself; the relational surface
  * (graft.queries.*) is the scale path for aggregations, with partial
  * (map-side) aggregation that this shape cannot express.
  */
object MRJob {
  /** Per-record UDTF: emit 0..n output pairs for one input pair. */
  type MapFn = (String, String) => IterableOnce[(String, String)]
  /** Per-group UDTF: emit 0..n output strings for one (key, values) group. */
  type ReduceFn = (String, Seq[String]) => IterableOnce[String]

  /** Run one job. Output rows are in ascending key order, and within a key
    * in reduce-emission order (range-partitioned: collecting or writing the
    * dataset preserves the global order across partitions).
    */
  def run(
      spark: SparkSession,
      input: Dataset[(String, String)],
      mapFn: MapFn,
      reduceFn: ReduceFn,
      mappers: Int = 2,
      reducers: Int = 2): Dataset[String] = {
    require(mappers > 0, "mapper_num must be > 0")   // master.cc:530-532
    require(reducers > 0, "reducer_num must be > 0")
    import spark.implicits._

    val mapped = input
      // Normalize column names: a Dataset[(String,String)] built from a
      // DataFrame keeps its source column names, so address by position.
      .toDF("_1", "_2").as[(String, String)]
      // O2 launch sort + O3 contiguous-range split: the reference sorts
      // the input and splits it into `mappers` contiguous ranges
      // (master.cc:736-738, job.cc:10-28). Post-shuffle that sort is
      // UNOBSERVABLE — values are re-sorted per group (deviation note
      // below) and output is re-sorted by key — so we keep only the
      // parallelism knob (round-robin repartition) and skip the range
      // sampling pass + sort, saving a full input scan.
      .repartition(mappers)
      .flatMap { case (k, v) => mapFn(k, v) } // O5 user map

    mapped
      .groupByKey(_._1) // O6 shuffle replaces the master-side merge
      .flatMapGroups { (k, it) =>
        val values = it.map(_._2).toArray
        java.util.Arrays.sort(values.asInstanceOf[Array[AnyRef]])
        // Keep (key, emissionIndex) so the final order is fully defined.
        reduceFn(k, scala.collection.immutable.ArraySeq.unsafeWrapArray(values))
          .iterator.zipWithIndex.map { case (out, i) => (k, i, out) }
      }
      // O4 reduce-side contiguous split + O8 key-ordered concatenation:
      // range partitions are globally ordered, so sorting within partitions
      // yields a total order without an extra global sort pass.
      .repartitionByRange(reducers, $"_1", $"_2")
      .sortWithinPartitions($"_1", $"_2")
      .map(_._3)
  }

  /** Reference-shape runner: in-memory KV list in, string list out
    * (the `/launch` → `/getresult` surface, gateway.cc:66-184).
    * Only for modest inputs — the Dataset overload is the scale path.
    */
  def runLocal(
      spark: SparkSession,
      input: Seq[(String, String)],
      mapFn: MapFn,
      reduceFn: ReduceFn,
      mappers: Int = 2,
      reducers: Int = 2): Seq[String] = {
    require(input.nonEmpty, "input kvs must be non-empty") // master.cc:533-535
    import spark.implicits._
    run(spark, input.toDS(), mapFn, reduceFn, mappers, reducers)
      .collect().toSeq
  }
}
