package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{col, expr}

import graft.SparkSpec

/** q73 two-pass global packing must be bit-identical to the naive
  * single-window form it replaced (one global running sum ordered by
  * doc_id). The window form serializes the corpus through one task —
  * kept here only as the semantic oracle.
  */
class PackingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("two-pass pack spans == single-window golden, bit for bit") {
    val twoPass = Documents.q73PackSpans(spark, dir).collect().map(_.toString).toSeq

    val w = Window
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val golden = graft.tables.Tables
      .documents(spark, dir)
      .select(col("doc_id"), F.size(F.split(F.trim(F.lower(col("text"))), "\\s+")).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("start_tok", F.sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("start_tok"),
        expr("CAST(start_tok div 512 AS INT)").as("first_chunk"),
        expr("CAST((start_tok + n_tokens - 1) div 512 AS INT)").as("last_chunk"),
        expr("CAST((start_tok + n_tokens - 1) div 512 - start_tok div 512 + 1 AS INT)").as("n_chunks")
      )
      .orderBy("doc_id")
      .collect()
      .map(_.toString)
      .toSeq

    twoPass shouldBe golden
    twoPass.size should be > 0
  }
}
