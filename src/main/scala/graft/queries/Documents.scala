package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Training-data pipeline: text analysis + deduplication over `documents`.
  *
  * Everything here is higher-order-function based (codegen'd Catalyst
  * expressions over arrays), no UDFs: tokenization via split, stopword
  * counting via array filter, dedup via hash-groupBy. The MinHash/SimHash
  * near-dup path lives in graft.operators.Dedup (no SQL oracle — verified
  * by ScalaTest properties instead).
  */
object Documents {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  // ---- q30: exact deduplication (hash groupBy) -----------------------------
  def q30DedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("text_hash")

  val q30Sql: String =
    """SELECT md5(text) AS text_hash,
      |       MIN(doc_id) AS keep_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_copies
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY text_hash""".stripMargin

  // ---- q31: token counting ---------------------------------------------------
  def q31TokenStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"),
        length(col("text")).as("len_chars")
      )
      .orderBy("doc_id")

  val q31Sql: String =
    """SELECT doc_id,
      |  CAST(LEN(regexp_split_to_array(TRIM(text), '\s+')) AS INTEGER) AS n_tokens,
      |  CAST(LENGTH(text) AS INTEGER) AS len_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- q32: quality scoring (length / punctuation / stopword ratios) ---------
  def q32TextQuality(s: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(lower(col("text"))), "\\s+")
    val nTok = size(toks)
    val nStop = size(filter(toks, w => w.isInCollection(stopwords)))
    val nPunct = length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))
    docs(s, dir)
      .select(
        col("doc_id"),
        nTok.as("n_tokens"),
        nStop.as("n_stopwords"),
        nPunct.as("n_punct"),
        (nStop.cast("double") / nTok).as("stopword_ratio"),
        (nPunct.cast("double") / length(col("text"))).as("punct_ratio")
      )
      .orderBy("doc_id")
  }

  val q32Sql: String =
    s"""SELECT doc_id,
       |  CAST(LEN(toks) AS INTEGER) AS n_tokens,
       |  CAST(LEN(list_filter(toks, w -> w IN (${stopwords.map("'" + _ + "'").mkString(",")}))) AS INTEGER) AS n_stopwords,
       |  CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,;:!?]', '', 'g')) AS INTEGER) AS n_punct,
       |  CAST(LEN(list_filter(toks, w -> w IN (${stopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE) / LEN(toks) AS stopword_ratio,
       |  CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,;:!?]', '', 'g')) AS DOUBLE) / LENGTH(text) AS punct_ratio
       |FROM (SELECT doc_id, text, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
       |      FROM documents) d
       |ORDER BY doc_id""".stripMargin

  // ---- q33: corpus profile by language ----------------------------------------
  def q33LangProfile(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        countDistinct(col("source")).as("n_sources")
      )
      .orderBy("lang")

  val q33Sql: String =
    """SELECT lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_chars,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---- q34: n-gram shingles (dedup building block, exact-SQL-checkable) --------
  // 3-gram shingle count per document: the first stage of MinHash dedup,
  // verified exactly here; hashing stages are property-tested in ScalaTest.
  def q34Shingles(s: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(lower(col("text"))), "\\s+")
    docs(s, dir)
      .select(col("doc_id"), toks.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        // kernel expression; equal to the declarative distinct-transform
        // form (property-tested in TextHashExprsSpec)
        size(graft.expressions.TextHashExprs.shingleSet(col("toks"), 3)).as("n_distinct_shingles")
      )
      .orderBy("doc_id")
  }

  val q34Sql: String =
    """SELECT doc_id,
      |  CAST(LEN(toks) AS INTEGER) AS n_tokens,
      |  CAST(LEN(list_distinct(
      |    list_transform(range(0, LEN(toks) - 2),
      |      i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS INTEGER) AS n_distinct_shingles
      |FROM (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
      |      FROM documents) d
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_dedup_exact" -> (q30DedupExact _),
    "q31_token_stats" -> (q31TokenStats _),
    "q32_text_quality" -> (q32TextQuality _),
    "q33_lang_profile" -> (q33LangProfile _),
    "q34_shingles" -> (q34Shingles _)
  )

  val oracles: Map[String, String] = Map(
    "q30_dedup_exact" -> q30Sql,
    "q31_token_stats" -> q31Sql,
    "q32_text_quality" -> q32Sql,
    "q33_lang_profile" -> q33Sql,
    "q34_shingles" -> q34Sql
  )
}
