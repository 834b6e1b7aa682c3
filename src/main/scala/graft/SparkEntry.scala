package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Documents, Events, Multimodal, Relational, TextPipeline, Vectors}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog aggregates every operator family:
  *   - graft.queries.Relational  — joins/aggs/windows/set-ops/sorts (§2.8)
  *   - graft.queries.Events      — stream-processing parity, batch-expressed
  *   - graft.queries.Documents   — text analysis + dedup pipeline ops
  *   - graft.queries.Vectors     — similarity search
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * This is the go-fish s2s-enrichment pattern (SURVEY §2.4) as an as-of
    * join over the events stream.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    Events.q22AsOfEnrich(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val raw = Relational.queries ++ Events.queries ++ Documents.queries ++ Vectors.queries ++
      TextPipeline.queries ++ Multimodal.queries
    raw.map { case (name, fn) =>
      name -> { (s: SparkSession, dir: String) =>
        GraftSession.tune(s)
        fn(s, dir)
      }
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Events.oracles ++ Documents.oracles ++ Vectors.oracles ++
      TextPipeline.oracles ++ Multimodal.oracles
}
