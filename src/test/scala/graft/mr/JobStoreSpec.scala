package graft.mr

import graft.SparkSuite
import graft.mr.JobStore.JobSpec

class JobStoreSpec extends SparkSuite {

  private def kv(pairs: (String, String)*) = {
    import spark.implicits._
    pairs.toDS()
  }

  test("launch → getResult round-trip with token auth") {
    val store = new JobStore(clock = () => 0L)
    val Right(id) = store.launch(spark,
      JobSpec("wc", "wordcount", "tok"), kv(("d1", "a b a"), ("d2", "b")))
    assert(store.getResult(id, "wrong") == Left("wrong token")) // master.cc:691
    assert(store.getResult(id, "tok") == Right(Seq("2", "2"))) // a=2, b=2 in key order
  }

  test("launch validation mirrors master.cc:527-559") {
    val store = new JobStore(clock = () => 0L)
    assert(store.launch(spark, JobSpec("j", "wordcount", "t", mappers = 0),
      kv(("a", "b"))).isLeft)
    assert(store.launch(spark, JobSpec("j", "nosuchtype", "t"),
      kv(("a", "b"))).isLeft)
    assert(store.launch(spark, JobSpec("j", "wordcount", "t"), kv()).isLeft)
  }

  test("results expire after TTL (JOB_RESULT_TIMEOUT_SECOND, master.h:27)") {
    var now = 0L
    val store = new JobStore(clock = () => now, ttlMillis = 1000L)
    val Right(id) = store.launch(spark,
      JobSpec("wc", "wordcount", "t"), kv(("d", "x")))
    assert(store.getResult(id, "t").isRight)
    now = 999L
    assert(store.getResult(id, "t").isRight)
    now = 1000L
    assert(store.getResult(id, "t") == Left(s"no such job: $id"))
  }

  test("unknown job id") {
    val store = new JobStore(clock = () => 0L)
    assert(store.getResult(42L, "t") == Left("no such job: 42"))
  }

  test("cancel: running job lands CANCELLED; terminal jobs are not cancellable") {
    // A deliberately slow job type so the cancel races a genuinely
    // in-flight Spark stage (interruptOnCancel kills the sleeping tasks).
    JobTypeRegistry.register("slow_identity_spec",
      (k, v) => { Thread.sleep(5000); Iterator.single((k, v)) },
      (k, vs) => vs.map(v => s"$k\t$v"))
    val store = new JobStore(clock = () => 0L)
    val Right(id) = store.launchAsync(spark,
      JobSpec("slow", "slow_identity_spec", "tok"), kv(("a", "1"), ("b", "2")))
    Thread.sleep(500) // let the executor thread set its job group
    assert(store.status(id) == Some(JobStore.Running))
    // guard order mirrors getResult: exists → token → running
    assert(store.cancel(spark, 99L, "tok") == Left("no such job: 99"))
    assert(store.cancel(spark, id, "nope") == Left("wrong token"))
    assert(store.cancel(spark, id, "tok") == Right(()))
    assert(store.status(id) == Some(JobStore.Cancelled))
    // the reference's not-finished error shape (master.cc:694-696)
    assert(store.getResult(id, "tok") == Left("job not finished"))
    // already terminal → not cancellable (master.cc:571-583 guard)
    assert(store.cancel(spark, id, "tok") == Left("job not running"))
    // a finished job is likewise not cancellable
    val Right(fin) = store.launch(spark,
      JobSpec("wc", "wordcount", "t"), kv(("d", "x")))
    assert(store.cancel(spark, fin, "t") == Left("job not running"))
    // the cancelled state is terminal even after the killed stage's
    // exception lands in the executor thread
    Thread.sleep(1500)
    assert(store.status(id) == Some(JobStore.Cancelled))
  }

  test("cancel immediately after async launch: the job never completes") {
    // The race the thread-interrupt + pre-run status check close: a
    // cancel landing before the executor thread sets its job group (or
    // submits its first Spark job) must still prevent the work from
    // running to completion — not just flip the reported status.
    JobTypeRegistry.register("slow_identity_race",
      (k, v) => { Thread.sleep(3000); Iterator.single((k, v)) },
      (k, vs) => vs.map(v => s"$k\t$v"))
    val store = new JobStore(clock = () => 0L)
    val Right(id) = store.launchAsync(spark,
      JobSpec("slow", "slow_identity_race", "tok"), kv(("a", "1")))
    assert(store.cancel(spark, id, "tok") == Right(())) // no sleep first
    assert(store.status(id) == Some(JobStore.Cancelled))
    // longer than the map's sleep: a leaked run would have FINISHED by now
    Thread.sleep(4500)
    assert(store.status(id) == Some(JobStore.Cancelled),
      "a cancelled job ran to completion behind the CANCELLED status")
    assert(store.getResult(id, "tok") == Left("job not finished"))
  }

  test("async launch returns immediately; result appears on poll") {
    val store = new JobStore(clock = () => 0L)
    val Right(id) = store.launchAsync(spark,
      JobSpec("wc", "wordcount", "t"), kv(("d1", "x y x"), ("d2", "y")))
    // poll (the reference client polls every 2s, word_count_client.cc:54-57)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var res: Either[String, Seq[String]] = Left("job not finished")
    while (res == Left("job not finished") && System.nanoTime() < deadline) {
      Thread.sleep(100)
      res = store.getResult(id, "t")
    }
    assert(res == Right(Seq("2", "2"))) // x=2, y=2 in key order
  }
}
