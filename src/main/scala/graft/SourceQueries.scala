package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Source-format operators (SURVEY §2.1/§2.3): schema'd JSON extraction
  * from string columns (the record-envelope `data` pattern, S1/S3) and
  * the multimodal binary decode stage (documented stub decoder, real
  * partition-parallel plumbing). */
object SourceQueries extends QueryGroup {

  /** S3/M1: parse an embedded JSON column with an explicit schema
    * (from_json, codegen'd — no per-record Python loop) and filter on an
    * extracted field. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val schema = StructType(Seq(StructField("k", LongType)))
    Tables.load(spark, dir, "events")
      .select($"event_id", from_json($"props", schema).getField("k").as("k"))
      .filter($"k" > 50L)
  }
  private val jsonExtractOracle: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50""".stripMargin

  /** Multimodal decode stage: documents' UTF-8 bytes as the opaque
    * payload through the typed mapPartitions pipeline (sources.Multimodal);
    * the oracle recomputes the stub checksum by folding byte values. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sources.Multimodal.documentsAsMedia(Tables.load(spark, dir, "documents"))
      .select($"mediaId".as("media_id"), $"nBytes".as("n_bytes"),
        $"checksum", $"width".cast("long").as("width"),
        $"height".cast("long").as("height"))
  }
  private val binaryMetaOracle: String =
    s"""WITH m AS (
       |  SELECT doc_id AS media_id,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      [CAST(unicode(text[i]) AS BIGINT) for i in range(1, len(text)+1)]),
       |      (a,b) -> (a*31+b) % 2147483647) AS checksum
       |  FROM documents)
       |SELECT media_id, n_bytes, checksum,
       |  checksum % 640 + 1 AS width, checksum % 480 + 1 AS height
       |FROM m""".stripMargin

  override def register(): Unit = {
    Queries.register(QueryDef("s3_json_extract", jsonExtract, Some(jsonExtractOracle)))
    Queries.register(QueryDef("m1_binary_meta", binaryMeta, Some(binaryMetaOracle)))
  }
}
