package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** normalizeTs contract: the one shared ts-normalization point must
  * convert the encodings it KNOWS and fail loudly on the ones it
  * doesn't — a silently wrong nanos/micros guess shifts every event
  * timestamp 1000× (see the corpus-regeneration gotcha the function
  * exists for).
  */
class TablesSpec extends SparkSuite {

  test("int64 nanos converts exactly (integer division, no double round-trip)") {
    // 2024-01-02 03:04:05.123456789 UTC in nanos
    val nanos = 1704164645123456789L
    val out = Tables.normalizeTs(
      spark.range(1).select(lit(nanos).as("ts")))
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == nanos / 1000L) // truncated, not rounded via double
  }

  test("int64 too small to be nanos fails loudly instead of converting 1000x off") {
    // Plausible MICROS for 2024 — the exact value a mis-encoded corpus
    // would ship; the old behavior converted it to 1970-01-20.
    val micros = 1704164645123456L
    val out = Tables.normalizeTs(spark.range(1).select(lit(micros).as("ts")))
    val e = intercept[Exception](out.collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("normalizeTs")),
      s"expected the normalizeTs diagnostic, got: ${e.getMessage}")
  }

  test("timestamp passes through; unrecognized types are rejected at plan time") {
    val ts = Tables.normalizeTs(
      spark.range(1).select(current_timestamp().as("ts")))
    assert(ts.schema("ts").dataType == TimestampType)
    val e = intercept[IllegalArgumentException](
      Tables.normalizeTs(spark.range(1).select(lit("2024-01-01").as("ts"))))
    assert(e.getMessage.contains("unrecognized ts encoding"))
  }
}
