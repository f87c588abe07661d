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
