package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest/egress parity with the reference's HTTP JSON surface:
  *
  *  - O1 ingest: `POST /launch` bodies are
  *    `{name, type, mapper_num, reducer_num, token, kvs: [{key, value}]}`,
  *    validated field-by-field at
  *    `/root/reference/src/tmapreduce/gateway.cc:15-51`;
  *  - O10 sink: `GET /getresult` returns the result strings as a JSON
  *    array (`gateway.cc:167-176`).
  *
  * Here the gateway becomes a library API: schema-checked `spark.read
  * .json` in, JSON array out. General tabular sources (parquet/csv/json/
  * text) are one-liners on `spark.read` and are exercised throughout
  * graft.Tables / the query surface.
  */
object Sources {

  /** The launch payload schema (gateway.cc:15-51, master_service.proto
    * LaunchMsg). `from_json`-compatible for embedded use.
    */
  val launchSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("mapper_num", IntegerType, nullable = false),
    StructField("reducer_num", IntegerType, nullable = false),
    StructField("token", StringType, nullable = false),
    StructField("kvs", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", StringType, nullable = false)))), nullable = false)))

  final case class Launch(
      name: String,
      jobType: String,
      mapperNum: Int,
      reducerNum: Int,
      token: String,
      kvs: Dataset[(String, String)])

  /** Read + validate one launch JSON document (the `/launch` body). Errors
    * mirror the gateway's checks: missing/ill-typed fields and empty kvs
    * are rejected (gateway.cc:15-51, master.cc:530-535).
    */
  def readLaunchJson(spark: SparkSession, path: String): Either[String, Launch] =
    validateLaunch(spark, spark.read
      .option("multiLine", "true")
      .schema(launchSchema)
      .option("mode", "FAILFAST")
      .json(path))

  /** Parse + validate a launch document held in memory (an HTTP `/launch`
    * request body) — same schema and checks as [[readLaunchJson]].
    */
  def parseLaunchJson(spark: SparkSession, body: String): Either[String, Launch] = {
    import spark.implicits._
    validateLaunch(spark, spark.read
      .schema(launchSchema)
      .option("mode", "FAILFAST")
      .json(Seq(body).toDS()))
  }

  private def validateLaunch(
      spark: SparkSession, raw: DataFrame): Either[String, Launch] = {
    import spark.implicits._
    try {
      val rows = raw.collect()
      if (rows.length != 1) Left(s"expected one launch document, got ${rows.length}")
      else {
        val r = rows(0)
        val bad = launchSchema.fieldNames.filter(f => r.isNullAt(r.fieldIndex(f)))
        if (bad.nonEmpty) Left(s"missing/invalid fields: ${bad.mkString(", ")}")
        else {
          val kvRows = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("kvs"))
            .map(kv => (kv.getString(0), kv.getString(1)))
          if (kvRows.isEmpty) Left("kvs must be non-empty") // master.cc:533-535
          else Right(Launch(r.getString(0), r.getString(1), r.getInt(2),
            r.getInt(3), r.getString(4), kvRows.toDS()))
        }
      }
    } catch {
      case e: Exception => Left(s"malformed launch JSON: ${e.getMessage}")
    }
  }

  /** O10 sink: write result strings as a single JSON array file (the
    * `/getresult` response body shape, gateway.cc:167-176).
    */
  def writeResultJson(results: Seq[String], path: String): Unit = {
    def esc(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path),
      results.map(esc).mkString("[", ",", "]"))
  }

  /** Distributed result sink for large outputs: one string column to a
    * JSON-lines directory (each line `{"result": ...}`) — the scale form
    * of O10 (the reference holds results in master RAM, `job.h:86-88`).
    */
  def writeResultJsonl(results: Dataset[String], dir: String): Unit =
    results.toDF("result").write.mode("overwrite").json(dir)
}
