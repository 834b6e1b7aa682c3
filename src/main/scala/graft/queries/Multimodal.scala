package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Media
import graft.tables.Tables

/** Multimodal-column pipeline: opaque binary payloads decoded to typed
  * features via per-partition batched codec calls (graft.multimodal).
  * The corpus has no real media, so the harness treats each document's
  * UTF-8 bytes as the payload; the codec is the documented stub. The
  * plumbing under oracle check here — binary schema, mapPartitions
  * decode, feature projection — is exactly what a real codec rides.
  */
object Multimodal {

  def q50MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val records = Media
      .fromText(Tables.documents(s, dir), idCol = "doc_id", textCol = "text", kind = "image")
      .as[Media.MediaRecord]
    Media
      .decodeFeatures(records)
      .toDF()
      .select(
        col("mediaId").as("media_id"),
        col("width"),
        col("height"),
        col("channels"),
        col("meanIntensity").as("mean_intensity"),
        col("payloadBytes").as("payload_bytes")
      )
      .orderBy("media_id")
  }

  /** The documents are ASCII, so octet length == char length and the
    * byte sum is the sum of ASCII codes — lets DuckDB mirror the stub
    * codec exactly.
    */
  val q50Sql: String =
    """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents)
      |SELECT doc_id AS media_id,
      |  CAST(GREATEST(1, n % 1024) AS INTEGER) AS width,
      |  CAST(GREATEST(1, (n // 1024) % 1024) AS INTEGER) AS height,
      |  CAST(3 AS INTEGER) AS channels,
      |  -- empty payload: the stub codec pins meanIntensity to 0.0, not 0/0
      |  CASE WHEN n = 0 THEN 0.0
      |       ELSE CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, LENGTH(text) + 1),
      |              i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), (a, x) -> a + x) AS DOUBLE) / n
      |  END AS mean_intensity,
      |  CAST(n AS BIGINT) AS payload_bytes
      |FROM d
      |ORDER BY media_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_media_features" -> (q50MediaFeatures _)
  )

  val oracles: Map[String, String] = Map(
    "q50_media_features" -> q50Sql
  )
}
