package graft.mr

/** The analog of the reference's typed-worker discovery: a worker scans its
  * `mrf_path` for `*.so` files and advertises their basenames as acceptable
  * job types (`/root/reference/src/tmapreduce/worker_server.cc:38-45`,
  * etcd registration `master.cc:516-525`). Spark ships closures with the
  * job, so "loading" collapses to a name → function-pair map populated at
  * build time (SURVEY.md §2.1 O16/O17).
  */
object JobTypeRegistry {
  /** A registered job type. `combineFn`, when declared, asserts the reduce
    * is a commutative monoid over its values (see [[MRJob.CombineFn]]) and
    * lets MRJob insert map-side partial aggregation — the registry is where
    * a user states that algebraic fact about their UDF pair, exactly like
    * declaring a Combiner class alongside a Reducer in classic MapReduce.
    */
  final case class MapReduceFn(
      mapFn: MRJob.MapFn,
      reduceFn: MRJob.ReduceFn,
      combineFn: Option[MRJob.CombineFn] = None)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MapReduceFn]()

  def register(
      jobType: String,
      mapFn: MRJob.MapFn,
      reduceFn: MRJob.ReduceFn,
      combineFn: Option[MRJob.CombineFn] = None): Unit =
    registry.put(jobType, MapReduceFn(mapFn, reduceFn, combineFn))

  def lookup(jobType: String): Option[MapReduceFn] =
    Option(registry.get(jobType))

  def types: Set[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet().asScala.toSet
  }

  // ---- built-in job types (what tMapReduce users ship as .so files) ----

  /** Per-character counting with the exact filter of the shipped example:
    * letters a-z (after lowercase) and digits 0-9 only
    * (`/root/reference/example/word_count/word_count.cc:5-22`). The map
    * emits one ("c", "1") pair per retained character; reduce sums.
    */
  val charCountMap: MRJob.MapFn = (_, v) =>
    v.toLowerCase.iterator.collect {
      case c if (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') =>
        (c.toString, "1")
    }

  /** Word variant: whitespace tokenization, empty tokens dropped. */
  val wordCountMap: MRJob.MapFn = (_, v) =>
    v.split(' ').iterator.filter(_.nonEmpty).map(w => (w, "1"))

  /** Sum of integer-valued strings, as in the example's reduce
    * (`word_count.cc:24-34`): emit one "total" string per key.
    */
  val sumReduce: MRJob.ReduceFn = (_, values) =>
    Iterator.single(values.iterator.map(_.toLong).sum.toString)

  /** Emit the key once per group — the MapReduce spelling of DISTINCT. */
  val distinctReduce: MRJob.ReduceFn = (k, _) => Iterator.single(k)

  /** Identity map (pass-through). */
  val identityMap: MRJob.MapFn = (k, v) => Iterator.single((k, v))

  /** The shipped example's reduce VERBATIM: emits the key and the total as
    * TWO result strings (`word_count.cc:24-34` pushes `reduce_kv.first`
    * then the sum) — the exact `/getresult` wire shape of the reference's
    * example `.so`.
    */
  val exampleReduce: MRJob.ReduceFn = (k, values) =>
    Iterator(k, values.iterator.map(_.toLong).sum.toString)

  /** Integer-sum combiner: the monoid behind [[sumReduce]] /
    * [[exampleReduce]]. sum(partial sums) == sum(all values), so the reduce
    * output is unchanged by partial aggregation.
    */
  val sumCombine: MRJob.CombineFn = (a, b) => (a.toLong + b.toLong).toString

  /** Value-ignoring combiner for reduces that never read their values
    * (DISTINCT): any fold is valid; keep the left value.
    */
  val anyCombine: MRJob.CombineFn = (a, _) => a

  register("charcount", charCountMap, sumReduce, Some(sumCombine))
  register("wordcount", wordCountMap, sumReduce, Some(sumCombine))
  register("distinct", wordCountMap, distinctReduce, Some(anyCombine))
  // identity's reduce emits one row PER VALUE — not a fold of the values,
  // so it must not declare a combiner (reduce needs every raw pair).
  register("identity", identityMap, (k, vs) => vs.map(v => s"$k\t$v"))
  // The reference example registers this UDF pair under the .so basename
  // "wordcount" even though it counts characters (word_count.cc:5-22);
  // graft names it for what it does.
  register("charcount_example", charCountMap, exampleReduce, Some(sumCombine))
}
