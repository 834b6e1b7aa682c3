package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The idiomatic Structured-Streaming forms of go-fish's enrichment and
  * windowing patterns (SURVEY §2.4/§2.6 name these as the documented
  * API, with the KV-parity forms in [[StatefulRules]]).
  *
  * Unlike the reference's unbounded KV (no TTL, state grows forever —
  * cloudTrail_s2s_join.go keeps every AssumeRole ever seen), these are
  * watermark-bounded: state is dropped once the watermark passes, so a
  * 1000-executor job holds hours of state, not months. That is the
  * correct trade at 100 TB — the parity form exists for byte-exact
  * reference behavior, this form is what production pipelines should
  * use.
  */
object StreamJoins {

  /** Watermarked stream-stream left-outer enrichment join: each probe
    * row picks up build rows of the same key within `bandSeconds`
    * BEFORE it (build.ts ∈ [probe.ts − band, probe.ts]). Probe rows
    * with no preceding build row emit with nulls once the watermark
    * passes (left-outer completeness is watermark-gated by design).
    *
    * Column contract: both sides need `key` and a timestamp column;
    * right-side non-key columns are prefixed with `build_` in the
    * output to avoid collisions.
    */
  def enrichmentJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeTs: String,
      buildTs: String,
      watermarkDelay: String,
      bandSeconds: Long
  ): DataFrame = {
    val p = probe.withWatermark(probeTs, watermarkDelay)
    val b = build
      .withWatermark(buildTs, watermarkDelay)
      .select(
        build.columns.map(c =>
          if (c == key) col(c) else col(c).as(s"build_$c")
        ): _*
      )
    val bTs = s"build_$buildTs"
    p.join(
      b,
      p(key) === b(key) &&
        col(bTs) <= col(probeTs) &&
        col(bTs) >= col(probeTs) - expr(s"INTERVAL $bandSeconds SECONDS"),
      "leftOuter"
    ).drop(b(key))
  }

  /** Watermarked exact deduplication: drop repeats of `keys` arriving
    * within the watermark horizon — at-least-once sources (replayed
    * Kinesis/Kafka batches) become effectively-once streams. State is
    * one entry per distinct key, dropped as the watermark passes; an
    * unbounded dropDuplicates would grow state forever at corpus scale.
    */
  def dedupExact(df: DataFrame, tsCol: String, watermarkDelay: String, keys: String*): DataFrame = {
    require(keys.nonEmpty, "dedupExact needs at least one key column")
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
  }

  /** Stream-static enrichment (SURVEY §2.4's third form): when the
    * build side is a slowly-changing DIMENSION rather than a stream,
    * join the stream against the static table directly — Spark
    * re-plans the static side per micro-batch (so an updated dimension
    * parquet is picked up), no state store involved, and a small
    * dimension broadcasts into every batch.
    */
  def staticEnrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame = {
    val d = dim.select(
      dim.columns.map(c => if (c == key) col(c) else col(c).as(s"dim_$c")): _*
    )
    stream.join(d, Seq(key), "left_outer")
  }

  /** Event-time tumbling-window aggregation (the streaming form of
    * q21_event_hourly): counts and a sum per (window, key), state
    * bounded by the watermark. The reference has only processing-time
    * flushes (window.go); event-time windows are the engine upgrade.
    */
  def tumblingAgg(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      windowLength: String,
      watermarkDelay: String
  ): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol),
        col("n"),
        col("sum_value")
      )
}
