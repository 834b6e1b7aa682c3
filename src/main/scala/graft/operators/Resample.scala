package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling with forward fill: one row per (key, tick)
  * on a fixed grid between each key's first and last observation,
  * carrying the most recent value at-or-before the tick.
  *
  * The gap-filling pattern every metrics/event pipeline needs (go-fish
  * emits only on arrival — SURVEY §2.6; a downstream consumer wanting a
  * regular grid has to build it). Composition, not new machinery:
  * per-key bounds (one agg) → `sequence` + `explode` generates the grid
  * inline (no driver-side tick table, no cross join) → [[AsOfJoin]]
  * attaches the last observation per tick (one more shuffle).
  */
object Resample {

  /** Per-key floor-aligned tick grid: (key, tick_us) from
    * floor(min/step)·step to floor(max/step)·step.
    *
    * Grid alignment must be FLOOR division (`t - pmod(t, step)`), all
    * in integer arithmetic: `div` truncates toward zero, shifting the
    * grid one step for pre-1970 (negative) timestamps, and a double
    * `/` could round across a grid boundary for large epoch-micros.
    * pmod keeps the remainder in [0, step) regardless of sign.
    */
  private def tickGrid(df: DataFrame, key: String, timeUs: String, stepUs: Long): DataFrame = {
    // stepUs=0 would not error: pmod(t, 0) is null in non-ANSI mode,
    // sequence(null, null) is null, and explode(null) silently drops
    // every key. Fail fast instead.
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    df.groupBy(col(key))
      .agg(min(col(timeUs)).as("_min_t"), max(col(timeUs)).as("_max_t"))
      .select(
        col(key),
        // NOTE: one key's whole grid materializes as a single array
        // before explode — (max-min)/step elements. Spark caps
        // sequence() at ~2^31 elements, but executor memory is the real
        // bound: a 3-year span at 1-second steps is ~95M longs in one
        // row. Pick stepUs so span/step stays ~1e6 per key, or
        // pre-split long-span keys into time bands first.
        explode(
          sequence(
            expr(s"_min_t - pmod(_min_t, ${stepUs}L)"),
            expr(s"_max_t - pmod(_max_t, ${stepUs}L)"),
            lit(stepUs)
          )
        ).as("tick_us")
      )
  }

  /** @param df       observations
    * @param key      series key column
    * @param timeUs   LONG epoch-micros observation time
    * @param valueCol value to carry forward
    * @param stepUs   grid step in micros
    * @return (key, tick_us, valueCol) — ticks at floor(min/step)·step,
    *         …, floor(max/step)·step per key; valueCol is the last
    *         observation at or before each tick (null until the first
    *         observation's tick).
    */
  def forwardFill(
      df: DataFrame,
      key: String,
      timeUs: String,
      valueCol: String,
      stepUs: Long,
      obsTieBreak: Option[String] = None
  ): DataFrame = {
    val ticks = tickGrid(df, key, timeUs, stepUs)
    // Tie-break among simultaneous observations: caller-provided unique
    // column when available, else the observation time itself (last-
    // write-wins is then nondeterministic between true duplicates).
    val tb = obsTieBreak.map(col).getOrElse(col(timeUs))
    val obs = df.select(col(key), col(timeUs), tb.as("_obs_tb"), col(valueCol).as(s"_v_$valueCol"))
    AsOfJoin(
      left = ticks,
      right = obs,
      key = key,
      leftTime = "tick_us",
      rightTime = timeUs,
      rightVals = Seq(s"_v_$valueCol" -> valueCol),
      tieBreak = "tick_us", // ticks are unique per key
      rightTieBreak = Some("_obs_tb")
    )
  }

  /** Like [[forwardFill]] but LINEARLY INTERPOLATES between the
    * surrounding observations — the gap-fill used when the series is a
    * sampled continuous signal rather than a stepwise state.
    *
    * Composition of both as-of directions: one backward sweep attaches
    * the previous (value, time), one forward sweep the next; the tick's
    * value is the linear blend. Edges degrade gracefully: before the
    * first observation the next value back-fills, after the last the
    * previous carries forward; a tick ON an observation returns that
    * observation exactly (last-write-wins among simultaneous ones).
    * Two key-shuffles total — still no per-row probing anywhere.
    */
  def interpolate(
      df: DataFrame,
      key: String,
      timeUs: String,
      valueCol: String,
      stepUs: Long,
      obsTieBreak: Option[String] = None
  ): DataFrame = {
    val ticks = tickGrid(df, key, timeUs, stepUs)
    val tb = obsTieBreak.map(col).getOrElse(col(timeUs))
    val obs = df.select(
      col(key),
      col(timeUs),
      tb.as("_obs_tb"),
      col(valueCol).as("_v"),
      col(timeUs).cast("long").as("_obs_t")
    )
    val withPrev = AsOfJoin(
      left = ticks,
      right = obs,
      key = key,
      leftTime = "tick_us",
      rightTime = timeUs,
      rightVals = Seq("_v" -> "_pv", "_obs_t" -> "_pt"),
      tieBreak = "tick_us",
      rightTieBreak = Some("_obs_tb")
    )
    val withBoth = AsOfJoin(
      left = withPrev,
      right = obs,
      key = key,
      leftTime = "tick_us",
      rightTime = timeUs,
      rightVals = Seq("_v" -> "_nv", "_obs_t" -> "_nt"),
      tieBreak = "tick_us",
      rightTieBreak = Some("_obs_tb"),
      direction = "forward"
    )
    // Identical operand order on any mirroring SQL engine keeps the
    // interpolated double bit-deterministic.
    val interp = col("_pv") + (col("_nv") - col("_pv")) *
      ((col("tick_us") - col("_pt")).cast("double") / (col("_nt") - col("_pt")).cast("double"))
    withBoth
      .select(
        col(key),
        col("tick_us"),
        when(col("_pt").isNull, col("_nv"))
          .when(col("_nt").isNull, col("_pv"))
          .when(col("_nt") === col("_pt"), col("_pv"))
          .otherwise(interp)
          .as(valueCol)
      )
  }
}
