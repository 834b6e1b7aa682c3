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

  // ---- q121: paired multimodal curation (CLIP-style image+caption gating) ----
  // The multimodal-training counterpart of the text-only quality
  // family: each media record pairs with its caption (media_id =
  // doc_id, the alt-text pairing), the pair survives only if BOTH
  // sides pass — caption word-count bounds + a stopword (a real-
  // language check), media geometry bounds + intensity band — and
  // survivors get an aspect-ratio bucket (floor(2·w/h), capped), the
  // multimodal analog of q95's length bucketing: batches form within a
  // bucket so tensor shapes are uniform. Every media feature comes
  // from the deterministic codec (q50) and every ratio is an exact
  // integer quotient, so the whole pair table hash-gates.
  def q121MultimodalPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val records = Media
      .fromText(Tables.documents(s, dir), idCol = "doc_id", textCol = "text", kind = "image")
      .as[Media.MediaRecord]
    val media = Media
      .decodeFeatures(records)
      .toDF()
      .select(
        col("mediaId").as("media_id"),
        col("width"),
        col("height"),
        col("meanIntensity").as("mean_intensity"))
    val stop = graft.operators.TextAnalysis.gopherStopwords
    val caps = Tables
      .documents(s, dir)
      .select(col("doc_id").as("media_id"), split(trim(lower(col("text"))), "\\s+").as("_toks"))
      .select(
        col("media_id"),
        size(col("_toks")).as("n_words"),
        size(filter(typedLit(stop), sw => array_contains(col("_toks"), sw))).as("n_stop"))
    val keepCaption = col("n_words") >= 5 && col("n_words") <= 2000 && col("n_stop") >= 1
    val keepMedia =
      col("width") >= 2 && col("height") >= 1 &&
        col("mean_intensity") >= 10.0 && col("mean_intensity") <= 200.0
    caps
      .join(media, "media_id")
      .filter(keepCaption && keepMedia)
      // exact-integer quotient floor == integer division below 2^53
      .withColumn(
        "aspect_bucket",
        least(floor(col("width") * lit(2.0) / col("height")).cast("int"), lit(8)))
      .select(
        col("media_id"), col("n_words"), col("n_stop"),
        col("width"), col("height"), col("aspect_bucket"), col("mean_intensity"))
      .orderBy("media_id")
  }

  val q121Sql: String = {
    val stop = graft.operators.TextAnalysis.gopherStopwords
      .map("'" + _ + "'")
      .mkString("[", ",", "]")
    """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS n,
      |             regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
      |           FROM documents),
      |media AS (SELECT doc_id AS media_id,
      |    CAST(GREATEST(1, n % 1024) AS INTEGER) AS width,
      |    CAST(GREATEST(1, (n // 1024) % 1024) AS INTEGER) AS height,
      |    CASE WHEN n = 0 THEN 0.0
      |         ELSE CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |                list_transform(range(1, LENGTH(text) + 1),
      |                  i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), (a, x) -> a + x)
      |              AS DOUBLE) / n
      |    END AS mean_intensity
      |  FROM d),
      |caps AS (SELECT doc_id AS media_id,
      |    CAST(LEN(toks) AS INTEGER) AS n_words,
      |    CAST(LEN(list_filter(STOPLIST, sw -> list_contains(toks, sw))) AS INTEGER) AS n_stop
      |  FROM d)
      |SELECT media_id, n_words, n_stop, width, height,
      |  CAST(LEAST(FLOOR(width * 2.0 / height), 8) AS INTEGER) AS aspect_bucket,
      |  mean_intensity
      |FROM caps JOIN media USING (media_id)
      |WHERE n_words >= 5 AND n_words <= 2000 AND n_stop >= 1
      |  AND width >= 2 AND height >= 1
      |  AND mean_intensity >= 10.0 AND mean_intensity <= 200.0
      |ORDER BY media_id""".stripMargin.replace("STOPLIST", stop)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_media_features" -> (q50MediaFeatures _),
    "q121_multimodal_pairs" -> (q121MultimodalPairs _)
  )

  val oracles: Map[String, String] = Map(
    "q50_media_features" -> q50Sql,
    "q121_multimodal_pairs" -> q121Sql
  )
}
