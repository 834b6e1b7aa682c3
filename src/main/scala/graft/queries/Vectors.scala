package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Dot products are computed with codegen'd higher-order functions
  * (zip_with + aggregate) after widening floats to doubles; the fold is
  * sequential in array order, so results are bit-deterministic and
  * engine-comparable. Brute-force top-k here is the correctness baseline;
  * the LSH-bucketed scale path lives in graft.operators.Similarity.
  */
object Vectors {

  private def emb(s: SparkSession, dir: String): DataFrame = Tables.embeddings(s, dir)

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def asDouble(c: org.apache.spark.sql.Column) = transform(c, _.cast("double"))

  // ---- q40: brute-force cosine top-k --------------------------------------
  // Query set = vec_id < 8; candidates = everything else. One broadcast of
  // the tiny query side, map-side dot products, per-query top-k via window.
  def q40KnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val q = e.filter(col("vec_id") < 8).select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val c = e.select(col("vec_id").as("nid"), col("emb").as("nemb"))
    val pairs = c
      .join(broadcast(q), col("nid") =!= col("qid"))
      .select(
        col("qid"),
        col("nid"),
        (dot(col("qemb"), col("nemb")) /
          (sqrt(dot(col("qemb"), col("qemb"))) * sqrt(dot(col("nemb"), col("nemb"))))).as("cosine")
      )
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("qid", "rank", "nid", "cosine")
      .orderBy("qid", "rank")
  }

  val q40Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 8),
      |pairs AS (
      |  SELECT qid, e.vec_id AS nid,
      |    list_reduce(list_transform(list_zip(qemb, emb), p -> p[1] * p[2]), (a, b) -> a + b)
      |      / (sqrt(list_reduce(list_transform(list_zip(qemb, qemb), p -> p[1] * p[2]), (a, b) -> a + b))
      |       * sqrt(list_reduce(list_transform(list_zip(emb, emb),  p -> p[1] * p[2]), (a, b) -> a + b))) AS cosine
      |  FROM e CROSS JOIN q
      |  WHERE e.vec_id <> qid),
      |ranked AS (
      |  SELECT qid, nid, cosine,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS INTEGER) AS rank
      |  FROM pairs)
      |SELECT qid, rank, nid, cosine FROM ranked WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin

  // ---- q41: vector norms + per-label stats -----------------------------------
  def q41NormStats(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(
      col("vec_id"),
      col("label"),
      sqrt(dot(asDouble(col("embedding")), asDouble(col("embedding")))).as("norm")
    )
    e.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        min(col("norm")).as("min_norm"),
        max(col("norm")).as("max_norm")
      )
      .orderBy("label")
  }

  val q41Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label,
      |    sqrt(list_reduce(list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])),
      |         p -> p[1] * p[2]), (a, b) -> a + b)) AS norm
      |  FROM embeddings)
      |SELECT label,
      |  CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  MIN(norm) AS min_norm,
      |  MAX(norm) AS max_norm
      |FROM e
      |GROUP BY label
      |ORDER BY label""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_knn_brute_force" -> (q40KnnBruteForce _),
    "q41_norm_stats" -> (q41NormStats _)
  )

  val oracles: Map[String, String] = Map(
    "q40_knn_brute_force" -> q40Sql,
    "q41_norm_stats" -> q41Sql
  )
}
