package graft.decode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.EventType

/** Decode-dispatch: the Spark form of go-fish's trial decoding
  * (reference: event_types.go:52-65 — try every registered decoder,
  * first success wins; unmatched records are dropped with a log line,
  * pipeline.go:396-399).
  *
  * One `from_json` per registered schema (all evaluated in a single
  * codegen'd projection — no per-record loop), matched in registry
  * order with required-field validation, surfaced as:
  *   - `_event_type` — name of the first matching type (null = no match)
  *   - `_raw`        — the original JSON (kept for branch re-decodes)
  *   - `_<name>`     — the parsed struct for each registered type
  */
object Decode {

  /** `raw` must have a string column `value` (the shape every go-fish
    * source emits: one JSON/text record per row).
    */
  def dispatch(raw: DataFrame, registry: Seq[EventType]): DataFrame = {
    val withParsed = registry.foldLeft(raw.withColumn("_raw", col("value"))) { (df, et) =>
      val parsed =
        if (et.raw) struct(col("value").as(et.schema.head.name)) // byte-cast type: always succeeds
        else from_json(col("value"), et.schema)
      df.withColumn(s"_${et.name}", parsed)
    }
    val typeCol = registry.foldRight(lit(null).cast("string")) { (et, elseCol) =>
      when(matches(et), et.name).otherwise(elseCol)
    }
    withParsed.withColumn("_event_type", typeCol)
  }

  private def matches(et: EventType): Column = {
    val parsed = col(s"_${et.name}")
    // The raw catch-all claims any non-null record. The check must be
    // on `value` itself: `parsed` is a struct literal, which is never
    // null, so testing it would claim even null records — which the
    // fast path (null-propagating detector) correctly dead-letters.
    if (et.raw) col("value").isNotNull
    else
      et.required
        .map(f => parsed.getField(f).isNotNull)
        .foldLeft(parsed.isNotNull)(_ && _)
  }

  /** [[dispatch]] with single-pass type detection: `_event_type` comes
    * from one Jackson parse per record (graft.expressions.JsonTypeOfExpr)
    * instead of one `from_json` per registered schema in the CASE chain.
    * The `_<name>` struct columns are still declared, but Catalyst
    * prunes the unconsumed ones, so a record is parsed at most twice
    * (detect + its own schema) rather than N+1 times. Same output as
    * [[dispatch]] (asserted in DecodeSpec).
    */
  def dispatchFast(raw: DataFrame, registry: Seq[EventType]): DataFrame = {
    import graft.expressions.{JsonDispatch, JsonTypeOfExpr}
    import org.apache.spark.sql.types.DataType
    val spec: JsonDispatch.TypeSpec = registry.map { et =>
      et.name -> (
        if (et.raw) Array.empty[(String, DataType)]
        else et.required.map(f => f -> et.schema(f).dataType).toArray
      )
    }.toArray
    // from_json parses timestamps with the session zone's formatter —
    // the detector must use the same zone to agree on claim/no-claim.
    val zoneId = raw.sparkSession.sessionState.conf.sessionLocalTimeZone
    val withParsed = registry.foldLeft(raw.withColumn("_raw", col("value"))) { (df, et) =>
      val parsed =
        if (et.raw) struct(col("value").as(et.schema.head.name))
        else from_json(col("value"), et.schema)
      df.withColumn(s"_${et.name}", parsed)
    }
    withParsed.withColumn("_event_type", JsonTypeOfExpr.column(col("value"), spec, zoneId))
  }

  /** Records claimed by `name`, flattened to that type's schema plus
    * `_raw` (the "assert or drop" idiom rules use — SURVEY §1.1).
    */
  def ofType(dispatched: DataFrame, name: String): DataFrame =
    dispatched
      .filter(col("_event_type") === name)
      .select(col("_raw"), col(s"_$name.*"))

  /** Records no decoder claimed (the reference logs & drops these;
    * exposing them makes a dead-letter sink possible).
    */
  def deadLetter(dispatched: DataFrame): DataFrame =
    dispatched.filter(col("_event_type").isNull).select(col("_raw"))
}
