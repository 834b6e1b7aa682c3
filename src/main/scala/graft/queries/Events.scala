package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Num._
import graft.operators.{AsOfJoin, Sessionize}
import graft.tables.Tables
import graft.operators.Pinned.PinOps

/** Event-stream processing surface, batch-expressed over the `events`
  * table. These are the go-fish capabilities (SURVEY §2.3-2.6) recast as
  * Catalyst plans:
  *   - decode-dispatch    → from_json / get_json_object on `props`
  *   - keyed enrichment   → AsOfJoin (the s2s KV-join pattern)
  *   - windowed keyed agg → time-bucketed groupBy
  *   - interval flush     → sessionization / tumbling windows
  * The same transforms run under Structured Streaming via graft.streaming.
  */
object Events {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  // ---- q20: per-type stats incl. JSON prop extraction (decode-dispatch) ----
  def q20TypeStats(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        countDistinct(col("user_id")).as("n_users"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k")
      )
      .orderBy("event_type")

  val q20Sql: String =
    """SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value,
      |  MIN(value) AS min_value,
      |  MAX(value) AS max_value,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---- q21: tumbling-window aggregation (hourly) ---------------------------
  def q21Hourly(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
        col("event_type")
      )
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("hour", "event_type")

  val q21Sql: String =
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  // ---- q22: as-of enrichment (the go-fish s2s KV join, flagship) ------------
  // Every purchase is enriched with the latest signup of the same user at or
  // before the purchase time (left outer: purchases before any signup keep null).
  // q22 and q88 attest the SAME oracle through two physical shapes, so
  // their inputs and projection live in shared helpers — an edit that
  // reached only one copy would silently break that invariant.
  private def enrichPurchases(e: DataFrame): DataFrame = e
    .filter(col("event_type") === "purchase")
    .select("event_id", "user_id", "ts_us", "value")

  private def enrichSignups(e: DataFrame): DataFrame = e
    .filter(col("event_type") === "signup")
    .select(
      col("user_id"),
      col("ts_us"),
      col("event_id").as("signup_event_id"),
      col("ts_us").as("signup_ts_us"),
      get_json_object(col("props"), "$.k").cast("long").as("signup_k")
    )

  private def enrichProject(joined: DataFrame): DataFrame = joined
    .select(
      col("event_id"),
      col("user_id"),
      col("value").as("purchase_value"),
      col("signup_ts_us"),
      col("signup_k")
    )
    .orderBy("event_id")

  def q22AsOfEnrich(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    enrichProject(
      AsOfJoin(
        left = enrichPurchases(e),
        right = enrichSignups(e),
        key = "user_id",
        leftTime = "ts_us",
        rightTime = "ts_us",
        rightVals = Seq("signup_ts_us" -> "signup_ts_us", "signup_k" -> "signup_k"),
        tieBreak = "event_id",
        rightTieBreak = Some("signup_event_id")
      ))
  }

  val q22Sql: String =
    """WITH base AS (
      |  SELECT event_id, user_id, value, event_type, props,
      |         epoch_ns(ts) // 1000 AS ts_us
      |  FROM events WHERE event_type IN ('signup', 'purchase')),
      |seq AS (
      |  SELECT event_id, user_id, value, event_type,
      |    LAST_VALUE(CASE WHEN event_type = 'signup' THEN ts_us END IGNORE NULLS)
      |      OVER w AS signup_ts_us,
      |    LAST_VALUE(CASE WHEN event_type = 'signup'
      |                    THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END IGNORE NULLS)
      |      OVER w AS signup_k
      |  FROM base
      |  WINDOW w AS (PARTITION BY user_id
      |               ORDER BY ts_us, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, value AS purchase_value, signup_ts_us, signup_k
      |FROM seq WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  // ---- q88: banded as-of — q22 through the hot-key fallback -----------------
  // Identical semantics and oracle to q22; the physical shape is the
  // time-banded two-pass (AsOfJoin.banded): each (user, hour band)
  // sweeps independently and cross-band matches resolve on per-band
  // summaries, so a user with a 10⁸-event timeline no longer
  // serializes through one task. Hash-matching q22's oracle attests
  // the fallback end-to-end.
  def q88AsOfBanded(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    enrichProject(
      AsOfJoin
        .banded(
          left = enrichPurchases(e),
          right = enrichSignups(e),
          key = "user_id",
          leftTime = "ts_us",
          rightTime = "ts_us",
          rightVals = Seq("signup_ts_us" -> "signup_ts_us", "signup_k" -> "signup_k"),
          tieBreak = "event_id",
          rightTieBreak = Some("signup_event_id"),
          bandUs = 3600000000L // 1 h bands
        ))
  }

  // ---- q23: sessionization (gap-based) ---------------------------------------
  def q23Sessions(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 3600L * 1000000L // 1 hour
    Sessionize(ev(s, dir), key = "user_id", timeUs = "ts_us", tieBreak = "event_id", gapUs = gapUs)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        dsum(col("value")).as("session_value")
      )
      .orderBy("user_id", "session_id")
  }

  val q23Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS ts_us FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER w <= 3600000000 THEN 0 ELSE 1 END AS new_s
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sessions AS (
      |  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MIN(ts_us) AS session_start_us,
      |  MAX(ts_us) AS session_end_us,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS session_value
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // ---- q24: per-user funnel (pivot-style conditional counts) ------------------
  def q24Funnel(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") === "view", lit(1))).as("n_view"),
        count(when(col("event_type") === "click", lit(1))).as("n_click"),
        count(when(col("event_type") === "purchase", lit(1))).as("n_purchase"),
        dsum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))).as("purchase_value")
      )
      .orderBy("user_id")

  val q24Sql: String =
    """SELECT user_id,
      |  CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view,
      |  CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
      |  CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
      |  CAST(CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS purchase_value
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---- q25: interval join (click → purchase within 1 hour) --------------------
  // A range/interval join: equi-key on user plus a time-band predicate.
  // Scale shape: shuffle both sides by user_id once (equi part), the
  // band predicate evaluates inside the joined partition — no cross
  // product, no broadcast of a big side.
  def q25IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val clicks = e
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts_us").as("click_us"))
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_us").as("purchase_us"), col("value"))
    // Both sides descend from the same scan: explicit aliases keep the
    // equi-key unambiguous instead of leaning on Spark's self-join
    // disambiguation heuristic (which logs a trivially-true-predicate
    // warning while guessing).
    clicks
      .as("c")
      .join(
        purchases.as("p"),
        col("c.user_id") === col("p.user_id") &&
          col("purchase_us") > col("click_us") &&
          col("purchase_us") <= col("click_us") + 3600L * 1000000L
      )
      .select(col("c.user_id"), col("click_id"), col("purchase_id"), col("value").as("purchase_value"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  val q25Sql: String =
    """WITH e AS (SELECT user_id, event_id, event_type, value, epoch_ns(ts) // 1000 AS ts_us FROM events),
      |c AS (SELECT user_id, event_id AS click_id, ts_us AS click_us FROM e WHERE event_type = 'click'),
      |p AS (SELECT user_id, event_id AS purchase_id, ts_us AS purchase_us, value FROM e WHERE event_type = 'purchase')
      |SELECT c.user_id AS user_id, click_id, purchase_id, value AS purchase_value
      |FROM c JOIN p ON c.user_id = p.user_id
      |  AND purchase_us > click_us AND purchase_us <= click_us + 3600000000
      |ORDER BY c.user_id, click_id, purchase_id""".stripMargin

  // ---- q26: percentiles / median --------------------------------------------------
  // Exact percentiles over the double `value` column. The hash match
  // relies on Spark's `percentile` and DuckDB's `quantile_cont` sharing
  // the same symmetric-lerp interpolation ((1-f)*lo + f*hi); an oracle
  // engine using lo + (hi-lo)*f can differ in the last ulp.
  def q26Percentiles(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("p50_value"),
        expr("percentile(value, 0.9)").as("p90_value"),
        count(lit(1)).as("n")
      )
      .orderBy("event_type")

  val q26Sql: String =
    """SELECT event_type,
      |  quantile_cont(value, 0.5) AS p50_value,
      |  quantile_cont(value, 0.9) AS p90_value,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---- q45: approximate aggregates (HLL, approx quantiles) --------------------
  // Raw sketch estimates are engine-specific by design (Spark's HLL++
  // and quantile summaries vs DuckDB's HLL and t-digest), so the raw
  // values can never hash-match. Instead of skipping the gate, each
  // engine band-checks ITS OWN sketches against ITS OWN exact
  // aggregates and emits the verdict booleans plus the exact anchors —
  // those hash bit-for-bit, so the engine-private sketch path is fully
  // gated after all. Tolerances are deliberately wide multiples of the
  // configured accuracy (HLL rsd=1% checked at ±10%; quantile rank
  // error 1/10000 checked at ±5% of value + 0.001 absolute), so the
  // gate is deterministic-per-engine, not flaky: both engines either
  // always pass at a given scale or fail loudly in dev. The p99 check
  // is a RANK band, not a value band (round 14): at n≈200 rows per
  // group (sf0.001) the interpolated p99 sits between two tail order
  // statistics that can be 28% of value apart, so Spark's GK sketch —
  // which returns an ACTUAL element, never an interpolation — can be
  // both rank-perfect and 25% off in value (DuckDB's t-digest read up
  // to 13.9% off the same way). Rank error is what a quantile sketch
  // actually bounds, so the gate asserts it: the approx p99 must land
  // between the exact p97 and the max (±2 percentile ranks — vs the
  // configured 1/2000 rank accuracy, generous but far from vacuous,
  // and scale-free where any value band is either too tight at small
  // n or vacuous at large n). Portable, value-hashed sketch twins
  // live in q79 (KMV), q105 (HLL), q109 (priority sampling); exact
  // counterparts in q15 and q26.
  def q45ApproxStats(s: SparkSession, dir: String): DataFrame = {
    // the distinct aggregate and the stats aggregate both scan the
    // fact table — pin the 3-column projection so it reads once
    val e = ev(s, dir)
      .select(col("event_type"), col("user_id"), col("value"))
      .pinned
    // countDistinct must NOT share the aggregate with the percentile
    // functions: Spark's distinct rewrite pre-groups by (event_type,
    // user_id), and the TypedImperative percentile buffers then
    // materialize PER USER GROUP (~100k OpenHashMaps at sf0.1 — 6.7 s
    // where the two separate aggregations cost 1.5 + 0.9 s). Two scans
    // of the fact table joined on the 5-row group key beat one
    // combined plan by 4×.
    val dist = e
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    e.groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.01).as("_au"),
        expr("approx_percentile(value, array(0.5D, 0.99D), 2000)").as("_qs"),
        expr("percentile(value, array(0.5D, 0.99D))").as("_xs"),
        expr("percentile(value, 0.97D)").as("_p97"),
        max(col("value")).as("_vmax"),
        count(lit(1)).as("n")
      )
      .join(broadcast(dist), "event_type")
      .select(
        col("event_type"),
        col("n"),
        col("n_users"),
        (abs(col("_au") - col("n_users")) <= col("n_users") * lit(0.1)).as("hll_ok"),
        (abs(col("_qs").getItem(0) - col("_xs").getItem(0)) <=
          abs(col("_xs").getItem(0)) * lit(0.05) + lit(0.001)).as("p50_ok"),
        (col("_qs").getItem(1) >= col("_p97") && col("_qs").getItem(1) <= col("_vmax"))
          .as("p99_ok")
      )
      .orderBy("event_type")
  }

  val q45Sql: String =
    """SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
      |    <= COUNT(DISTINCT user_id) * 0.1 AS hll_ok,
      |  abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
      |    <= abs(quantile_cont(value, 0.5)) * 0.05 + 0.001 AS p50_ok,
      |  approx_quantile(value, 0.99)
      |    BETWEEN quantile_cont(value, 0.97) AND MAX(value) AS p99_ok
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---- q57: cohort retention ---------------------------------------------------
  // Classic event-stream analytics: users grouped by first-seen day,
  // tracked across subsequent activity days. Two shuffles total: the
  // min-ts-per-user aggregate, then the (cohort, offset) count — the
  // cohort join is a shuffle-free re-aggregation of the same user key.
  def q57Retention(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("user_id"), date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
    val firstDay = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    e.join(firstDay, "user_id")
      .select(
        col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("int").as("day_offset"),
        col("user_id")
      )
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  val q57Sql: String =
    """WITH e AS (SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events),
      |f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id)
      |SELECT cohort_day,
      |  CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_offset,
      |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
      |FROM e JOIN f ON e.user_id = f.user_id
      |GROUP BY cohort_day, day_offset
      |ORDER BY cohort_day, day_offset""".stripMargin

  // ---- q58: sliding event-time windows (batch form) ------------------------------
  // 2-hour windows sliding by 1 hour: each event belongs to two windows.
  // Spark's window() generates the assignment inline (no join against a
  // window table); the oracle unnests the two bucket offsets.
  def q58Sliding(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"),
        col("n")
      )
      .orderBy("window_start", "event_type")

  val q58Sql: String =
    """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |w AS (SELECT event_type,
      |        date_trunc('hour', ts) - INTERVAL (off) HOUR AS window_start
      |      FROM e, (SELECT unnest([0, 1]) AS off))
      |SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
      |FROM w
      |GROUP BY window_start, event_type
      |ORDER BY window_start, event_type""".stripMargin

  // ---- q62: time-series resample + forward fill ----------------------------------
  // Daily grid per user between first and last purchase, carrying the
  // latest purchase value forward — the gap-filling pattern regular-grid
  // consumers need over an irregular event stream. Composition of
  // sequence-explode grid generation and AsOfJoin (operators.Resample).
  def q62Resample(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val purchases = ev(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    graft.operators.Resample
      .forwardFill(purchases, key = "user_id", timeUs = "ts_us", valueCol = "value",
        stepUs = dayUs, obsTieBreak = Some("event_id"))
      .select("user_id", "tick_us", "value")
      .orderBy("user_id", "tick_us")
  }

  val q62Sql: String =
    """WITH p AS (SELECT user_id, epoch_ns(ts) // 1000 AS ts_us,
      |                  event_id AS eid, value
      |           FROM events WHERE event_type = 'purchase'),
      |b AS (SELECT user_id, MIN(ts_us) AS mn, MAX(ts_us) AS mx FROM p GROUP BY user_id),
      |ticks AS (SELECT user_id,
      |            unnest(range((mn // 86400000000) * 86400000000,
      |                         (mx // 86400000000) * 86400000000 + 1,
      |                         86400000000)) AS tick_us
      |          FROM b)
      |SELECT t.user_id, t.tick_us,
      |  (SELECT p2.value FROM p p2
      |   WHERE p2.user_id = t.user_id AND p2.ts_us <= t.tick_us
      |   ORDER BY p2.ts_us DESC, p2.eid DESC LIMIT 1) AS value
      |FROM ticks t
      |ORDER BY user_id, tick_us""".stripMargin

  // ---- q81: next-event attribution (forward as-of + tolerance) --------------------
  // Conversion lag: each signup attributed to the user's NEXT purchase
  // within 7 days — the forward mirror of q22's enrichment, exercising
  // AsOfJoin's direction + tolerance surface. Same single-shuffle sweep;
  // the oracle is an independent formulation (correlated LATERAL top-1).
  def q81NextPurchase(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val signups = e
      .filter(col("event_type") === "signup")
      .select("event_id", "user_id", "ts_us")
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("ts_us"),
        col("event_id").as("purchase_event_id"),
        col("ts_us").as("purchase_ts_us"),
        col("value").as("purchase_value")
      )
    AsOfJoin(
      left = signups,
      right = purchases,
      key = "user_id",
      leftTime = "ts_us",
      rightTime = "ts_us",
      rightVals = Seq(
        "purchase_value" -> "next_purchase_value",
        "purchase_ts_us" -> "next_purchase_ts_us"
      ),
      tieBreak = "event_id",
      rightTieBreak = Some("purchase_event_id"),
      direction = "forward",
      toleranceUs = Some(604800000000L) // 7 days in micros
    )
      .select(
        col("event_id"),
        col("user_id"),
        col("next_purchase_value"),
        (col("next_purchase_ts_us") - col("ts_us")).as("wait_us")
      )
      .orderBy("event_id")
  }

  val q81Sql: String =
    """WITH base AS (
      |  SELECT event_id, user_id, value, event_type,
      |         epoch_ns(ts) // 1000 AS ts_us
      |  FROM events WHERE event_type IN ('signup', 'purchase')),
      |s AS (SELECT event_id, user_id, ts_us FROM base WHERE event_type = 'signup'),
      |p AS (SELECT event_id AS pid, user_id, ts_us AS pts, value
      |      FROM base WHERE event_type = 'purchase')
      |SELECT s.event_id, s.user_id, n.next_purchase_value, n.wait_us
      |FROM s LEFT JOIN LATERAL (
      |  SELECT p.value AS next_purchase_value, p.pts - s.ts_us AS wait_us
      |  FROM p
      |  WHERE p.user_id = s.user_id AND p.pts >= s.ts_us
      |    AND p.pts - s.ts_us <= 604800000000
      |  ORDER BY p.pts, p.pid LIMIT 1) n ON TRUE
      |ORDER BY s.event_id""".stripMargin

  // ---- q82: linear-interpolation resample ------------------------------------------
  // q62's grid with interpolated (not stepwise) values — the sampled-
  // continuous-signal form of gap filling. Two as-of sweeps (prev/next
  // observation) and a linear blend whose operand order matches the
  // oracle exactly, so the interpolated doubles hash-match.
  def q82Interpolate(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val purchases = ev(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    graft.operators.Resample
      .interpolate(purchases, key = "user_id", timeUs = "ts_us", valueCol = "value",
        stepUs = dayUs, obsTieBreak = Some("event_id"))
      .select("user_id", "tick_us", "value")
      .orderBy("user_id", "tick_us")
  }

  val q82Sql: String =
    """WITH p AS (SELECT user_id, epoch_ns(ts) // 1000 AS ts_us,
      |                  event_id AS eid, value
      |           FROM events WHERE event_type = 'purchase'),
      |b AS (SELECT user_id, MIN(ts_us) AS mn, MAX(ts_us) AS mx FROM p GROUP BY user_id),
      |ticks AS (SELECT user_id,
      |            unnest(range((mn // 86400000000) * 86400000000,
      |                         (mx // 86400000000) * 86400000000 + 1,
      |                         86400000000)) AS tick_us
      |          FROM b),
      |j AS (SELECT t.user_id, t.tick_us,
      |  (SELECT p2.value FROM p p2 WHERE p2.user_id = t.user_id AND p2.ts_us <= t.tick_us
      |   ORDER BY p2.ts_us DESC, p2.eid DESC LIMIT 1) AS pv,
      |  (SELECT p2.ts_us FROM p p2 WHERE p2.user_id = t.user_id AND p2.ts_us <= t.tick_us
      |   ORDER BY p2.ts_us DESC, p2.eid DESC LIMIT 1) AS pt,
      |  (SELECT p2.value FROM p p2 WHERE p2.user_id = t.user_id AND p2.ts_us >= t.tick_us
      |   ORDER BY p2.ts_us ASC, p2.eid ASC LIMIT 1) AS nv,
      |  (SELECT p2.ts_us FROM p p2 WHERE p2.user_id = t.user_id AND p2.ts_us >= t.tick_us
      |   ORDER BY p2.ts_us ASC, p2.eid ASC LIMIT 1) AS nt
      |  FROM ticks t)
      |SELECT user_id, tick_us,
      |  CASE WHEN pt IS NULL THEN nv
      |       WHEN nt IS NULL THEN pv
      |       WHEN nt = pt THEN pv
      |       ELSE pv + (nv - pv) * (CAST(tick_us - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
      |  END AS value
      |FROM j
      |ORDER BY user_id, tick_us""".stripMargin

  // ---- q92: event-type transition matrix (per-user Markov path analysis) -------
  // The per-key sequence operator: each user's event stream ordered by
  // time, paired with its successor via lead(), aggregated into a
  // transition matrix (how often type A is followed by type B, and by
  // how many users). One shuffle on user_id for the window, one for the
  // matrix agg — the matrix itself is |types|^2 rows regardless of data
  // size. event_id breaks timestamp ties deterministically.
  def q92EventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    ev(s, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(
        count(lit(1)).as("n_transitions"),
        countDistinct(col("user_id")).as("n_users")
      )
      .orderBy("event_type", "next_type")
  }

  val q92Sql: String =
    """WITH s AS (SELECT user_id, event_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |  FROM events)
      |SELECT event_type, next_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_transitions,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM s WHERE next_type IS NOT NULL
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q92_event_transitions" -> (q92EventTransitions _),
    "q82_interpolate" -> (q82Interpolate _),
    "q81_next_purchase" -> (q81NextPurchase _),
    "q62_resample" -> (q62Resample _),
    "q57_retention" -> (q57Retention _),
    "q58_sliding" -> (q58Sliding _),
    "q45_approx_stats" -> (q45ApproxStats _),
    "q20_event_type_stats" -> (q20TypeStats _),
    "q21_event_hourly" -> (q21Hourly _),
    "q22_asof_enrich" -> (q22AsOfEnrich _),
    "q88_asof_banded" -> (q88AsOfBanded _),
    "q23_sessions" -> (q23Sessions _),
    "q24_funnel" -> (q24Funnel _),
    "q25_interval_join" -> (q25IntervalJoin _),
    "q26_percentiles" -> (q26Percentiles _)
  )

  val oracles: Map[String, String] = Map(
    "q92_event_transitions" -> q92Sql,
    "q82_interpolate" -> q82Sql,
    "q81_next_purchase" -> q81Sql,
    "q62_resample" -> q62Sql,
    "q57_retention" -> q57Sql,
    "q58_sliding" -> q58Sql,
    "q45_approx_stats" -> q45Sql,
    "q20_event_type_stats" -> q20Sql,
    "q21_event_hourly" -> q21Sql,
    "q22_asof_enrich" -> q22Sql,
    "q88_asof_banded" -> q22Sql, // bit-identical by design

    "q23_sessions" -> q23Sql,
    "q24_funnel" -> q24Sql,
    "q25_interval_join" -> q25Sql,
    "q26_percentiles" -> q26Sql
  )
}
