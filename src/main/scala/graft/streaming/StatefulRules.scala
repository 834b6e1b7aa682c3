package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming forms of the two stateful go-fish patterns. Both ride
  * Spark's state store (checkpointed, exactly-once — a strict upgrade
  * over the reference's at-most-once BoltDB KV, SURVEY §2.6), and both
  * shuffle by key exactly once: state lives on the executors, so key
  * cardinality scales out with the cluster instead of a single
  * process's disk.
  */
object StatefulRules {

  /** A record on the wire of a keyed enrichment: `side` 0 = build
    * (writes the KV), 1 = probe (reads it). `payload` is opaque to the
    * state machine (typically an OutputEvent precursor as JSON).
    */
  case class KeyedMsg(key: String, tSec: Long, side: Int, payload: String)

  case class Enriched(key: String, tSec: Long, payload: String, resolved: Option[String])

  /** Streaming as-of enrichment (reference: cloudTrail_s2s_join.go:68-78
    * build / 37-57 probe): per key, remember the latest build payload;
    * each probe is answered with the value visible at its arrival.
    * Last-write-wins, unbounded state, no TTL — exactly the reference's
    * KV semantics. Within a micro-batch, rows are replayed in
    * (time, side) order so build rows precede probes at equal time.
    */
  def enrichment(msgs: Dataset[KeyedMsg]): Dataset[Enriched] = {
    import msgs.sparkSession.implicits._
    msgs
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[KeyedMsg], state: GroupState[String]) => {
          var latest = state.getOption
          val out = Vector.newBuilder[Enriched]
          it.toVector.sortBy(m => (m.tSec, m.side)).foreach { m =>
            if (m.side == 0) latest = Some(m.payload)
            else out += Enriched(key, m.tSec, m.payload, latest)
          }
          latest.foreach(state.update)
          out.result().iterator
        }
      )
  }

  case class CountedState(firstPayload: String, n: Int, deadlineMs: Long)

  case class Flushed(key: String, payload: String, occurrences: Int)

  /** Interval flush with emit-and-clear (reference: window.go:19-49 +
    * cloudTrail_agg.go:36-96): per key, keep the FIRST payload and an
    * occurrence count; `intervalMs` after the key last saw data, emit
    * one record and clear the state — the reference's `Window()`
    * ForEach+Delete flush, expressed as a ProcessingTimeTimeout instead
    * of a ticker goroutine.
    */
  def intervalFlushCount(
      msgs: Dataset[(String, String)],
      intervalMs: Long
  ): Dataset[Flushed] = {
    import msgs.sparkSession.implicits._
    msgs
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (key: String, it: Iterator[(String, String)], state: GroupState[CountedState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Flushed(key, s.firstPayload, s.n))
          } else {
            val batch = it.toVector
            if (batch.isEmpty) Iterator.empty
            else {
              // The flush DEADLINE is fixed when the window opens and
              // kept in state. Two paths can cross it:
              //   - quiet key: the ProcessingTimeTimeout fires (armed
              //     with the REMAINING time each batch — Spark cancels a
              //     key's timeout on every invocation, and re-arming
              //     with the full interval would postpone forever);
              //   - hot key: a timeout can NEVER fire for a key that has
              //     data in every batch (timeouts only run for keys
              //     absent from the batch), so the data path itself
              //     emits once the deadline passes.
              // Either way the cadence matches the reference's ticker
              // (window.go:28-49): one flush per interval per active key.
              val now = state.getCurrentProcessingTimeMs()
              val cur0 = state.getOption.getOrElse(CountedState(batch.head._2, 0, now + intervalMs))
              val cur = cur0.copy(n = cur0.n + batch.size)
              if (now >= cur.deadlineMs) {
                state.remove()
                Iterator.single(Flushed(key, cur.firstPayload, cur.n))
              } else {
                state.update(cur)
                state.setTimeoutDuration(math.max(1L, cur.deadlineMs - now))
                Iterator.empty
              }
            }
          }
        }
      )
  }

  /** The enrichment state machine on Spark 4's `transformWithState`
    * API — the successor to flatMapGroupsWithState: explicit typed
    * state variables, TTL support, RocksDB-only state store.
    * Semantics identical to [[enrichment]] (asserted in tests).
    * Requires `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider on the running query.
    */
  class EnrichmentProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[String, KeyedMsg, Enriched] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}

    @transient private var latest: ValueState[String] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[String]("latest", Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedMsg], timer: TimerValues): Iterator[Enriched] = {
      val out = Vector.newBuilder[Enriched]
      rows.toVector.sortBy(m => (m.tSec, m.side)).foreach { m =>
        if (m.side == 0) latest.update(m.payload)
        else out += Enriched(key, m.tSec, m.payload, Option(latest.get()))
      }
      out.result().iterator
    }
  }

  /** [[enrichment]] via transformWithState (see [[EnrichmentProcessor]]). */
  def enrichmentTws(msgs: Dataset[KeyedMsg]): Dataset[Enriched] = {
    import msgs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    msgs
      .groupByKey(_.key)
      .transformWithState(new EnrichmentProcessor, TimeMode.None(), OutputMode.Append)
  }

  /** Interval flush on transformWithState TIMERS — the direct
    * expression of the reference's ticker (window.go:19-49): a timer
    * registered when the key's window opens fires `intervalMs` later
    * REGARDLESS of arriving data (unlike flatMapGroupsWithState
    * timeouts, which Spark cancels on every invocation — see
    * [[intervalFlushCount]]'s two-path workaround). Emit-and-clear on
    * expiry, exactly one flush per interval per active key.
    */
  class CountFlushProcessor(intervalMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, String), Flushed] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}

    @transient private var st: ValueState[CountedState] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CountedState]("counted", Encoders.product[CountedState], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, String)],
        timers: TimerValues
    ): Iterator[Flushed] = {
      val batch = rows.toVector
      if (batch.nonEmpty) {
        val cur = Option(st.get())
        if (cur.isEmpty) {
          val deadline = timers.getCurrentProcessingTimeInMs() + intervalMs
          getHandle.registerTimer(deadline)
          st.update(CountedState(batch.head._2, batch.size, deadline))
        } else {
          st.update(cur.get.copy(n = cur.get.n + batch.size))
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: String,
        timers: TimerValues,
        expired: ExpiredTimerInfo
    ): Iterator[Flushed] = {
      val cur = Option(st.get())
      st.clear()
      cur.map(c => Flushed(key, c.firstPayload, c.n)).iterator
    }
  }

  /** [[intervalFlushCount]] via transformWithState timers (RocksDB
    * state store required, like [[enrichmentTws]]).
    */
  def intervalFlushCountTws(msgs: Dataset[(String, String)], intervalMs: Long): Dataset[Flushed] = {
    import msgs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    msgs
      .groupByKey(_._1)
      .transformWithState(new CountFlushProcessor(intervalMs), TimeMode.ProcessingTime(), OutputMode.Append)
  }

  /** Event-time gap sessions on a stream — the built-in streaming form
    * of graft.operators.Sessionize (batch). Watermark bounds state: a
    * session closes once the watermark passes its end + gap.
    */
  def sessionCounts(
      df: org.apache.spark.sql.DataFrame,
      keyCol: String,
      tsCol: String,
      gap: String,
      watermarkDelay: String
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events")
      )
  }

}
