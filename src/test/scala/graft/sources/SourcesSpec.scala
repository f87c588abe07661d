package graft.sources

import graft.SparkSuite
import graft.mr.{JobTypeRegistry, MRJob}

import java.nio.file.Files

/** O1/O10 gateway parity: launch JSON in → MR job → JSON array out —
  * the reference's single_node.sh curl smoke, as library calls.
  */
class SourcesSpec extends SparkSuite {

  private def writeTemp(content: String): String = {
    val f = Files.createTempFile("launch", ".json")
    Files.writeString(f, content)
    f.toString
  }

  test("launch JSON round-trip: ingest, run, sink (single_node.sh shape)") {
    val path = writeTemp(
      """{"name": "wc-test", "type": "wordcount", "mapper_num": 2,
        |"reducer_num": 2, "token": "ztorchan",
        |"kvs": [{"key": "k1", "value": "a b a"},
        |        {"key": "k2", "value": "b"},
        |        {"key": "k3", "value": "c a"}]}""".stripMargin)
    val Right(launch) = Sources.readLaunchJson(spark, path)
    assert(launch.name == "wc-test" && launch.jobType == "wordcount")
    assert(launch.mapperNum == 2 && launch.reducerNum == 2)
    val fns = JobTypeRegistry.lookup(launch.jobType).get
    val result = MRJob.run(spark, launch.kvs, fns.mapFn, fns.reduceFn,
      launch.mapperNum, launch.reducerNum).collect().toSeq
    assert(result == Seq("3", "2", "1")) // a=3, b=2, c=1 in key order
    val out = Files.createTempFile("result", ".json").toString
    Sources.writeResultJson(result, out)
    assert(Files.readString(java.nio.file.Paths.get(out)) == """["3","2","1"]""")
  }

  test("validation: empty kvs rejected (master.cc:533-535)") {
    val path = writeTemp(
      """{"name": "x", "type": "wordcount", "mapper_num": 1,
        |"reducer_num": 1, "token": "t", "kvs": []}""".stripMargin)
    assert(Sources.readLaunchJson(spark, path) == Left("kvs must be non-empty"))
  }

  test("validation: missing field rejected (gateway.cc:15-51)") {
    val path = writeTemp(
      """{"name": "x", "mapper_num": 1, "reducer_num": 1, "token": "t",
        |"kvs": [{"key": "a", "value": "b"}]}""".stripMargin)
    val res = Sources.readLaunchJson(spark, path)
    assert(res.isLeft && res.swap.exists(_.contains("type")))
  }

  test("malformed JSON rejected") {
    val path = writeTemp("""{"name": oops""")
    assert(Sources.readLaunchJson(spark, path).isLeft)
  }

  test("escaped characters survive the result sink") {
    val out = Files.createTempFile("result", ".json").toString
    Sources.writeResultJson(Seq("a\"b", "c\\d", "e\nf"), out)
    assert(Files.readString(java.nio.file.Paths.get(out)) ==
      "[\"a\\\"b\",\"c\\\\d\",\"e\\nf\"]")
  }
}
