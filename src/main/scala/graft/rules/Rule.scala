package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A rule is a declarative DataFrame transform — the Spark replacement
  * for go-fish's compiled-plugin `Rule.Process` (reference: rule.go:15-22).
  *
  * Differences by design (SURVEY §2.3):
  *   - `Process` is row-at-a-time opaque code; a graft rule is a Catalyst
  *     plan, so filters/projections fuse into whole-stage codegen and push
  *     into scans.
  *   - `nil`-result filtering happens inside the rule (an explicit
  *     `.filter`), not at the sink.
  *   - Rules may change the record type mid-stream (the reference's
  *     boolean-emitting test rules do) — output schema is per-rule.
  */
trait Rule {
  def name: String

  /** Seconds between state flushes; 0 = stateless
    * (reference: rule.go:19 `WindowInterval`).
    */
  def flushIntervalSec: Int = 0

  /** The decoded event type this rule consumes when fed directly from a
    * source (the reference's downcast-or-drop idiom); None = consume the
    * parent's records as-is (rule-to-rule edges).
    */
  def eventType: Option[String] = None

  def apply(df: DataFrame): DataFrame

  /** Streaming form. Stateless rules run the same plan; stateful rules
    * override with their flatMapGroupsWithState equivalent (batch uses
    * window functions, which streaming cannot).
    */
  def applyStreaming(df: DataFrame): DataFrame = apply(df)
}

/** Helpers shared by the built-in rules. */
object Rules {

  /** Null-safe "empty string in Go is missing" coalesce: Go unmarshals
    * absent JSON fields to "", Spark to null — treat both as absent.
    */
  def nonEmpty(c: Column): Column = when(length(c) > 0, c)

  /** OutputEvent columns in canonical order (graft.model.OutputEvent). */
  def outputEvent(
      source: Column,
      eventTime: Column,
      eventType: Column,
      name: Column,
      level: Column,
      eventId: Column,
      entity: Column,
      sourceIP: Column,
      body: Column,
      occurrences: Column
  ): Seq[Column] = Seq(
    source.as("Source"),
    eventTime.as("EventTime"),
    eventType.as("EventType"),
    name.as("Name"),
    level.as("Level"),
    eventId.as("EventId"),
    entity.as("Entity"),
    sourceIP.as("SourceIP"),
    body.as("Body"),
    occurrences.as("Occurrences")
  )
}

/** Emits whether `Str == "a"` — note the record type changes to boolean
  * downstream (reference: testdata/rules/a.go:12-18).
  */
object ExampleARule extends Rule {
  val name = "aRule"
  override val eventType: Option[String] = Some("exampleEventType")
  def apply(df: DataFrame): DataFrame =
    df.select((coalesce(col("Str"), lit("")) === "a").as("result"))
}

/** Emits whether `len(Str) == 1` (reference: testdata/rules/length.go:12-18). */
object ExampleLengthRule extends Rule {
  val name = "lengthRule"
  override val eventType: Option[String] = Some("exampleEventType")
  def apply(df: DataFrame): DataFrame =
    df.select((length(coalesce(col("Str"), lit(""))) === 1).as("result"))
}

/** Non-heartbeat certs with any `^www.*` domain → OutputEvent
  * (reference: examples/certstream/rules/domain_cert_issued.go:33-54).
  * The reference's `string(CertIndex)` rune-cast bug is implemented as a
  * proper integer→string cast.
  */
object DomainCertIssuedRule extends Rule {
  val name = "domainCertIssued"
  override val eventType: Option[String] = Some("certStream")
  def apply(df: DataFrame): DataFrame =
    df.filter(
        col("message_type") =!= "heartbeat" &&
          exists(col("data.leaf_cert.all_domains"), _.rlike("^www.*"))
      )
      .select(
        Rules.outputEvent(
          source = lit("CertStream"),
          eventTime = timestamp_seconds(col("data.seen").cast("long")),
          eventType = col("message_type"),
          name = lit("DomainNameSeenInCertificate"),
          level = lit(graft.model.Level.Info),
          eventId = col("data.cert_index").cast("string"),
          entity = col("data.source.name"),
          sourceIP = lit(null).cast("string"),
          body = lit(null).cast("map<string,string>"),
          occurrences = lit(1)
        ): _*
      )
}
