package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{EventSchemas, Level}
import graft.operators.AsOfJoin

/** Principal-name derivation (reference: cloudTrail_s2s_join.go:98-130
  * and cloudTrail_agg.go:98-115 — two variants of the same switch).
  */
object Principal {

  /** Missing JSON strings are null after from_json, but the reference's
    * Go structs unmarshal them to "" — Sprintf("user/%s", "") yields
    * "user/", so the Spark arms must not let a null field null the
    * whole principal.
    */
  private def str(c: Column): Column = coalesce(c, lit(""))

  /** Arms common to both variants. `ui` is the userIdentity struct. */
  private def common(ui: Column): PartialFunction[String, Column] = {
    case "IAMUser"       => concat(lit("user/"), str(ui.getField("userName")))
    case "AWSAccount"    => concat(lit("account/"), str(ui.getField("accountId")))
    case "FederatedUser" => concat(lit("user/"), str(ui.getField("sessionContext").getField("sessionIssuer").getField("userName")))
    case "AWSService"    => concat(lit("service/"), str(ui.getField("invokedBy")))
  }

  private def switchOn(ui: Column)(arms: (String, Column)*): Column =
    arms
      .foldLeft(when(lit(false), lit(null.asInstanceOf[String]))) { case (acc, (t, v)) =>
        acc.when(ui.getField("type") === t, v)
      }
      .otherwise("unknown")

  /** Aggregation-rule variant: AssumedRole resolves statically to
    * `role/<sessionIssuer.userName>`, Root to the literal "Root"
    * (reference: cloudTrail_agg.go:98-115).
    */
  def aggVariant(ui: Column): Column = {
    val c = common(ui)
    switchOn(ui)(
      "IAMUser" -> c("IAMUser"),
      "AWSAccount" -> c("AWSAccount"),
      "AssumedRole" -> concat(lit("role/"), str(ui.getField("sessionContext").getField("sessionIssuer").getField("userName"))),
      "FederatedUser" -> c("FederatedUser"),
      "AWSService" -> c("AWSService"),
      "Root" -> lit("Root")
    )
  }

  /** S2S-join variant: AssumedRole resolves through the KV lookup
    * (`resolved`, supplied by the join; falls back to the raw
    * principalId on miss — reference: cloudTrail_s2s_join.go:124-130);
    * Root prefers the user name, falling back to the account id
    * (reference: cloudTrail_s2s_join.go:116-122).
    */
  def s2sVariant(ui: Column, resolved: Column): Column = {
    val c = common(ui)
    switchOn(ui)(
      "IAMUser" -> c("IAMUser"),
      "AWSAccount" -> c("AWSAccount"),
      "AssumedRole" -> coalesce(Rules.nonEmpty(resolved), ui.getField("principalId"), lit("")),
      "FederatedUser" -> c("FederatedUser"),
      "AWSService" -> c("AWSService"),
      "Root" -> concat(
        lit("account/"),
        coalesce(Rules.nonEmpty(ui.getField("userName")), ui.getField("accountId"), lit(""))
      )
    )
  }
}

/** Stream-to-stream enrichment join (reference:
  * cloudTrail_s2s_join.go:37-130; golden expectation
  * integration_test.go:185-276).
  *
  * Build side: AssumeRole events write assumedRoleId → principal.
  * Probe side: CreateUser events resolve their principalId against the
  * latest preceding build row (as-of, last-write-wins, no TTL) and emit
  * a "UserCreated" OutputEvent.
  *
  * Batch form uses graft.operators.AsOfJoin (one shuffle, no KV store);
  * the streaming form is graft.streaming.StatefulEnrichment.
  */
object CloudTrailS2SJoinRule extends Rule {
  val name = "cloudTrailS2SJoin"
  override val eventType: Option[String] = Some("CloudTrail")

  /** Schema of the probe-side payload carried through the streaming
    * state machine as JSON (all fields the OutputEvent needs).
    */
  private val probePayloadSchema = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("userIdentity", EventSchemas.cloudTrail.schema("userIdentity").dataType),
      org.apache.spark.sql.types.StructField("eventTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("eventID", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("sourceIPAddress", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("recipientAccountId", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("userCreated", org.apache.spark.sql.types.StringType)
    )
  )

  /** Streaming form: the batch AsOfJoin uses window functions (not
    * available under streaming), so the same semantics run on
    * flatMapGroupsWithState (graft.streaming.StatefulRules.enrichment):
    * the KV write is the state update, the probe reads the state at
    * arrival — exactly the reference's BoltDB protocol.
    */
  override def applyStreaming(ct: DataFrame): DataFrame = {
    import ct.sparkSession.implicits._
    import graft.streaming.StatefulRules
    import graft.streaming.StatefulRules.KeyedMsg

    val build = ct
      .filter(col("eventName") === "AssumeRole")
      .select(
        from_json(col("_raw"), EventSchemas.assumeRoleResponse)
          .getField("responseElements")
          .getField("assumedRoleUser")
          .getField("assumedRoleId")
          .as("key"),
        col("eventTime").cast("long").as("tSec"),
        lit(0).as("side"),
        Principal.s2sVariant(col("userIdentity"), lit(null).cast("string")).as("payload")
      )
      .filter(col("key").isNotNull)

    val probe = ct
      .filter(col("eventName") === "CreateUser")
      .select(
        col("userIdentity").getField("principalId").as("key"),
        col("eventTime").cast("long").as("tSec"),
        lit(1).as("side"),
        to_json(
          struct(
            col("userIdentity"),
            col("eventTime"),
            col("eventID"),
            col("sourceIPAddress"),
            col("recipientAccountId"),
            element_at(col("requestParameters"), "userName").as("userCreated")
          )
        ).as("payload")
      )

    val enriched = StatefulRules.enrichment(build.unionByName(probe).as[KeyedMsg])

    val p = from_json(col("payload"), probePayloadSchema)
    enriched
      .toDF()
      .select(
        Rules.outputEvent(
          source = lit("CloudTrail"),
          eventTime = p.getField("eventTime"),
          eventType = lit("UserCreated"),
          name = lit("IAMUserCreated"),
          level = lit(Level.Warn),
          eventId = p.getField("eventID"),
          entity = Principal.s2sVariant(p.getField("userIdentity"), col("resolved")),
          sourceIP = p.getField("sourceIPAddress"),
          body = map(
            lit("AccountID"), p.getField("recipientAccountId"),
            lit("UserCreated"), p.getField("userCreated")
          ),
          occurrences = lit(1)
        ): _*
      )
  }

  /** Input: decoded CloudTrail records (Decode.ofType output, `_raw` kept). */
  def apply(ct: DataFrame): DataFrame = {
    val assumeRole = ct
      .filter(col("eventName") === "AssumeRole")
      .select(
        // Branch re-decode of the open-typed responseElements from raw JSON
        // (reference keeps it as interface{} and mapstructure-decodes).
        from_json(col("_raw"), EventSchemas.assumeRoleResponse)
          .getField("responseElements")
          .getField("assumedRoleUser")
          .getField("assumedRoleId")
          .as("principalId"),
        Principal.s2sVariant(col("userIdentity"), lit(null).cast("string")).as("principal"),
        col("eventTime").cast("long").as("t_sec"),
        col("eventID")
      )
      .filter(col("principalId").isNotNull)

    val createUser = ct
      .filter(col("eventName") === "CreateUser")
      .select(
        col("userIdentity"),
        col("userIdentity").getField("principalId").as("principalId"),
        col("eventTime"),
        col("eventTime").cast("long").as("t_sec"),
        col("eventID"),
        col("sourceIPAddress"),
        col("recipientAccountId"),
        element_at(col("requestParameters"), "userName").as("userCreated")
      )

    val enriched = AsOfJoin(
      left = createUser,
      right = assumeRole,
      key = "principalId",
      leftTime = "t_sec",
      rightTime = "t_sec",
      rightVals = Seq("principal" -> "resolvedPrincipal"),
      tieBreak = "eventID"
    )

    enriched.select(
      Rules.outputEvent(
        source = lit("CloudTrail"),
        eventTime = col("eventTime"),
        eventType = lit("UserCreated"),
        name = lit("IAMUserCreated"),
        level = lit(Level.Warn),
        eventId = col("eventID"),
        entity = Principal.s2sVariant(col("userIdentity"), col("resolvedPrincipal")),
        sourceIP = col("sourceIPAddress"),
        body = map(
          lit("AccountID"), col("recipientAccountId"),
          lit("UserCreated"), col("userCreated")
        ),
        occurrences = lit(1)
      ): _*
    )
  }
}

/** Keyed count with windowed flush (reference: cloudTrail_agg.go:30-96;
  * golden expectation Occurrences=3, integration_test.go:319-416).
  *
  * Filter no-MFA events, key by principal, keep the FIRST event's fields
  * and count occurrences. Batch form: groupBy + first-by-time; the
  * interval-flush streaming form is graft.streaming.IntervalFlushAgg.
  */
object CloudTrailNoMfaAggRule extends Rule {
  val name = "cloudTrailNoMfaAgg"
  override def flushIntervalSec: Int = 2
  override val eventType: Option[String] = Some("CloudTrail")

  private val aggPayloadSchema = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("eventTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("eventID", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("sourceIPAddress", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("recipientAccountId", org.apache.spark.sql.types.StringType)
    )
  )

  /** Streaming form: keyed count with interval flush on
    * flatMapGroupsWithState + ProcessingTimeTimeout — the reference's
    * ticker/Window()/emit-and-clear loop (window.go:19-49).
    */
  override def applyStreaming(ct: DataFrame): DataFrame = {
    import ct.sparkSession.implicits._
    import graft.streaming.StatefulRules

    val keyed = ct
      .filter(col("userIdentity.sessionContext.attributes.mfaAuthenticated") === "false")
      .select(
        Principal.aggVariant(col("userIdentity")).as("_1"),
        to_json(
          struct(col("eventTime"), col("eventID"), col("sourceIPAddress"), col("recipientAccountId"))
        ).as("_2")
      )
      .as[(String, String)]

    val flushed = StatefulRules.intervalFlushCount(keyed, flushIntervalSec * 1000L)

    val p = from_json(col("payload"), aggPayloadSchema)
    flushed
      .toDF()
      .select(
        Rules.outputEvent(
          source = lit("CloudTrail"),
          eventTime = p.getField("eventTime"),
          eventType = lit("NoMFA"),
          name = lit("NoMFA"),
          level = lit(Level.Warn),
          eventId = p.getField("eventID"),
          entity = col("key"),
          sourceIP = p.getField("sourceIPAddress"),
          body = map(lit("AccountID"), p.getField("recipientAccountId")),
          occurrences = col("occurrences")
        ): _*
      )
  }

  def apply(ct: DataFrame): DataFrame = {
    val noMfa = ct
      .filter(
        col("userIdentity.sessionContext.attributes.mfaAuthenticated") === "false"
      )
      .withColumn("principal", Principal.aggVariant(col("userIdentity")))
    val w = Window.partitionBy(col("principal")).orderBy(col("eventTime"), col("eventID"))
    noMfa
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("principal"))))
      .filter(col("_rn") === 1)
      .select(
        Rules.outputEvent(
          source = lit("CloudTrail"),
          eventTime = col("eventTime"),
          eventType = lit("NoMFA"),
          name = lit("NoMFA"),
          level = lit(Level.Warn),
          eventId = col("eventID"),
          entity = col("principal"),
          sourceIP = col("sourceIPAddress"),
          body = map(lit("AccountID"), col("recipientAccountId")),
          occurrences = col("_n").cast("int")
        ): _*
      )
  }
}

/** Trending event names per event-time window — the monitoring
  * "what is hot right now" report as a built-in rule: a 10-minute
  * tumbling-window SpaceSaving top-5 over the decoded CloudTrail
  * feed's eventName ([[graft.streaming.Trending]]). State per window
  * pane is O(capacity=64) in the map-side buffers, the shuffle AND the
  * streaming state store — never one entry per distinct key, which is
  * the scale posture a 100 TB firehose needs. The record type changes
  * downstream (the aRule precedent): one row per closed window and
  * rank, (WindowStart, WindowEnd, Rank, Item, Cnt, MaxErr).
  *
  * Batch and streaming share the SAME declarative plan — the sketch is
  * a first-class Catalyst TypedImperativeAggregate, so Structured
  * Streaming checkpoints its buffers like any windowed aggregation and
  * append mode emits each pane once, finalized, when the watermark
  * passes (no flatMapGroupsWithState needed).
  */
object TrendingEventsRule extends Rule {
  val name = "trendingEvents"
  override val eventType: Option[String] = Some("CloudTrail")

  def apply(ct: DataFrame): DataFrame = {
    val report = graft.streaming.Trending.topKByWindow(
      ct, tsCol = "eventTime", keyCol = "eventName",
      windowDur = "10 minutes", watermark = "5 minutes", k = 5, capacity = 64)
    report.select(
      col("window_start").as("WindowStart"),
      col("window_end").as("WindowEnd"),
      posexplode(col("topk")).as(Seq("_pos", "_e"))
    ).select(
      col("WindowStart"),
      col("WindowEnd"),
      (col("_pos") + 1).cast("int").as("Rank"),
      col("_e.item").as("Item"),
      col("_e.cnt").as("Cnt"),
      col("_e.max_err").as("MaxErr")
    )
  }
}
