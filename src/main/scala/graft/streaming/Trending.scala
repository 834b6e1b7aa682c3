package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.SpaceSavingAgg

/** Windowed trending top-k over a stream — "what are the heaviest keys
  * this window" (trending domains on a certstream feed, hottest event
  * names on a CloudTrail firehose), the monitoring question the
  * reference's keyed-count rules circle around but cannot answer
  * without one state entry PER DISTINCT KEY.
  *
  * The aggregate is the engine's SpaceSaving summary
  * ([[SpaceSavingAgg]], a TypedImperativeAggregate): per window pane
  * only `capacity` slots exist map-side, shuffle-side AND in the
  * streaming state store — state per pane is O(capacity), never
  * O(distinct keys), which at 100 TB key cardinality is the difference
  * between a bounded summary and an unbounded state store. The buffers
  * serialize through the aggregate's own codec, so the state-store
  * round-trip between micro-batches is exact.
  *
  * Semantics under micro-batching: SpaceSaving is merge-order
  * sensitive once keys overflow `capacity`, so a multi-batch pane may
  * differ from the single-pass batch sketch IN WHICH overflow slots it
  * holds — but the SpaceSaving guarantees survive every merge path
  * (`cnt` bounds the true count from above by at most `max_err`; any
  * key with true count > N/capacity is present). With
  * `capacity >= distinct keys` the sketch is exact and micro-batch
  * split points cannot change the result at all (spec-pinned both
  * ways).
  *
  * Append mode + watermark: a pane emits ONCE, finalized, when the
  * watermark passes its end — the trending report for a closed window,
  * exactly-once under checkpoint recovery like every other streaming
  * agg.
  */
object Trending {

  /** Event-time windowed trending top-k.
    *
    * @param df        streaming (or batch — same plan) frame
    * @param tsCol     event-time timestamp column
    * @param keyCol    the trending key (domain, event name, token …)
    * @param windowDur tumbling window duration, e.g. "1 hour"; with
    *                  `slide` a sliding window
    * @param watermark lateness bound, e.g. "10 minutes"
    * @param k         report size per window
    * @param capacity  SpaceSaving slots per pane (state bound; exact
    *                  when >= the pane's distinct-key count)
    * @return one row per closed window: (window_start, window_end,
    *         topk: array&lt;struct&lt;item, cnt, max_err&gt;&gt;)
    */
  def topKByWindow(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDur: String,
      watermark: String,
      k: Int,
      capacity: Int,
      slide: Option[String] = None
  ): DataFrame = {
    val win: Column =
      slide.fold(window(col(tsCol), windowDur))(s => window(col(tsCol), windowDur, s))
    df.withWatermark(tsCol, watermark)
      .groupBy(win.as("win"))
      .agg(SpaceSavingAgg.topk(col(keyCol), k, capacity).as("topk"))
      .select(
        col("win.start").as("window_start"),
        col("win.end").as("window_end"),
        col("topk"))
  }
}
