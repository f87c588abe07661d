package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins [[PipelineOps.knuthBucketSql]] — the shared portable sampling
  * bucket — over the FULL int64 id range, including the ids past
  * ~3.47e9 where the naive `(id * m) % 2^32` overflows int64 (Spark
  * wraps silently, DuckDB raises BIGINT overflow). The reference value
  * is exact BigInt arithmetic, which is also what DuckDB computes for
  * the rendered `//` form (every intermediate fits int64, and DuckDB's
  * integer ops are exact-or-error — so Spark ≡ BigInt ≡ DuckDB).
  */
class KnuthBucketSpec extends SparkSuite {

  private val M = BigInt(2654435761L)
  private val TwoPow32 = BigInt(4294967296L)

  /** The mathematical bucket: floorMod(id · m, 2^32). */
  private def exact(id: Long): Long = ((BigInt(id) * M) mod TwoPow32).toLong

  // The 100 TB posture: ids straddling every overflow boundary —
  // below/at/above the ~3.47e9 naive-overflow point, above 2^32,
  // near Long.MaxValue, and (sign-safety) negative.
  private val ids = Seq(
    0L, 1L, 42L, 499L, 1234567L, 3469999999L, 3470000000L,
    4294967295L, 4294967296L, 4294967301L, 5000000000L,
    123456789012345L, Long.MaxValue - 1, Long.MaxValue,
    -1L, -42L, -5000000000L, Long.MinValue + 1, Long.MinValue)

  test("overflow-safe bucket equals exact (id*m) mod 2^32 over the full int64 range") {
    val session = spark
    import session.implicits._
    val got = ids.toDF("doc_id")
      .withColumn("bucket", expr(PipelineOps.knuthBucketSql("doc_id", "div")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(got(id) == exact(id),
        s"id=$id: spark=${got(id)} exact=${exact(id)}")
      assert(got(id) >= 0L && got(id) < 4294967296L, s"id=$id: out of range")
    }
  }

  test("bit-identical to the naive form for in-range ids (every existing hash unchanged)") {
    val session = spark
    import session.implicits._
    val inRange = ids.filter(id => id >= 0L && id <= 3470000000L)
    val rows = inRange.toDF("doc_id")
      .withColumn("safe", expr(PipelineOps.knuthBucketSql("doc_id", "div")))
      .withColumn("naive", expr("(doc_id * 2654435761) % 4294967296"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"id=${r.getLong(0)}: safe=${r.getLong(1)} naive=${r.getLong(2)}")
    }
  }

  test("the naive form actually breaks past the overflow point (the bug being fixed)") {
    val session = spark
    import session.implicits._
    // At id = 2^33 the naive product overflows int64: ANSI Spark (the
    // 4.x default, and this session's config) fails the whole job,
    // non-ANSI Spark wraps silently, DuckDB raises — in every mode the
    // 100 TB-scale pipeline either dies or diverges from its oracle.
    // The safe form computes the exact value. If the naive form ever
    // starts succeeding AND agreeing, the split form is dead weight —
    // both arms assert.
    val safe = Seq(8589934592L).toDF("doc_id")
      .withColumn("safe", expr(PipelineOps.knuthBucketSql("doc_id", "div")))
      .head().getLong(1)
    assert(safe == exact(8589934592L))
    scala.util.Try(Seq(8589934592L).toDF("doc_id")
      .withColumn("naive", expr("(doc_id * 2654435761) % 4294967296"))
      .head().getLong(1)) match {
      case scala.util.Failure(e) =>
        // ANSI: long overflow fails the job — the fix matters
        val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
        assert(msgs.toLowerCase.contains("overflow"), s"unexpected failure: $msgs")
      case scala.util.Success(v) => assert(v != safe,
        "naive form no longer overflows — revisit whether the split form is still needed")
    }
  }

  test("the DuckDB rendering differs from the Spark one only in the integer-division spelling") {
    val s = PipelineOps.knuthBucketSql("doc_id", "div")
    val d = PipelineOps.knuthBucketSql("doc_id", "//")
    assert(s.replace(" div ", " // ") == d)
  }
}
