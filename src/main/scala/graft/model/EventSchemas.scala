package graft.model

import org.apache.spark.sql.types._

/** Schema registry: the Spark replacement for go-fish's event-type
  * plugins (reference: event_types.go:13-50). Each entry gives the
  * struct an incoming JSON record decodes into, plus the fields that
  * must be present for the type to claim a record (the reference's
  * "first decoder that succeeds" dispatch is meaningless for JSON —
  * any JSON unmarshals into any Go struct — so we dispatch on
  * registry order + required-field presence, which is the semantics
  * the reference's tests actually rely on).
  */
final case class EventType(
    name: String,
    schema: StructType,
    /** Top-level fields that must decode non-null for a match. */
    required: Seq[String],
    /** Raw types cast the record into their single string field instead
      * of JSON-parsing it (reference:
      * testdata/eventTypes/example_event_type.go:10-15 — a byte-slice
      * cast that always succeeds, making the type a catch-all).
      */
    raw: Boolean = false
)

object EventSchemas {

  /** Line-oriented example type (reference:
    * testdata/eventStructs/example.go:5-11 — a raw string payload).
    */
  val example: EventType = EventType(
    name = "exampleEventType",
    schema = StructType(Seq(StructField("Str", StringType))),
    required = Seq("Str"),
    raw = true
  )

  /** CloudTrail (reference: testdata/statefulIntegrationTests/
    * eventStructs/cloudTrail.go:7-51). `responseElements` is open-typed
    * in the reference (interface{}, branch-decoded per rule via
    * mapstructure) — branch decoding here happens via from_json on the
    * retained raw JSON, so it is omitted from the static schema.
    */
  val cloudTrail: EventType = EventType(
    name = "CloudTrail",
    schema = StructType(
      Seq(
        StructField("eventVersion", StringType),
        StructField(
          "userIdentity",
          StructType(
            Seq(
              StructField("type", StringType),
              StructField("principalId", StringType),
              StructField("arn", StringType),
              StructField("accountId", StringType),
              StructField("accessKeyId", StringType),
              StructField("userName", StringType),
              StructField("invokedBy", StringType),
              StructField(
                "sessionContext",
                StructType(
                  Seq(
                    StructField(
                      "attributes",
                      StructType(
                        Seq(
                          StructField("mfaAuthenticated", StringType),
                          StructField("creationDate", TimestampType)
                        )
                      )
                    ),
                    StructField(
                      "sessionIssuer",
                      StructType(
                        Seq(
                          StructField("type", StringType),
                          StructField("principalId", StringType),
                          StructField("arn", StringType),
                          StructField("accountId", StringType),
                          StructField("userName", StringType)
                        )
                      )
                    )
                  )
                )
              )
            )
          )
        ),
        StructField("eventTime", TimestampType),
        StructField("eventSource", StringType),
        StructField("eventName", StringType),
        StructField("awsRegion", StringType),
        StructField("sourceIPAddress", StringType),
        StructField("userAgent", StringType),
        StructField("requestParameters", MapType(StringType, StringType)),
        StructField(
          "resources",
          ArrayType(
            StructType(
              Seq(
                StructField("ARN", StringType),
                StructField("accountId", StringType),
                StructField("type", StringType)
              )
            )
          )
        ),
        StructField("requestID", StringType),
        StructField("sharedEventID", StringType),
        StructField("eventID", StringType),
        StructField("eventType", StringType),
        StructField("recipientAccountId", StringType)
      )
    ),
    required = Seq("eventVersion", "eventTime", "eventName")
  )

  /** Branch schema for AssumeRole responseElements (reference:
    * eventStructs/cloudTrail.go:59-69, decoded at
    * cloudTrail_s2s_join.go:69-72).
    */
  val assumeRoleResponse: StructType = StructType(
    Seq(
      StructField(
        "responseElements",
        StructType(
          Seq(
            StructField(
              "assumedRoleUser",
              StructType(
                Seq(
                  StructField("assumedRoleId", StringType),
                  StructField("arn", StringType)
                )
              )
            )
          )
        )
      )
    )
  )

  /** Certificate-transparency feed (reference:
    * examples/certstream/eventStructs/cert_stream.go:6-69, abbreviated
    * to the fields the in-repo rule reads).
    */
  val certStream: EventType = EventType(
    name = "certStream",
    schema = StructType(
      Seq(
        StructField("message_type", StringType),
        StructField("timestamp", DoubleType),
        StructField(
          "data",
          StructType(
            Seq(
              StructField("update_type", StringType),
              StructField(
                "leaf_cert",
                StructType(
                  Seq(
                    StructField(
                      "subject",
                      StructType(Seq(StructField("aggregated", StringType), StructField("CN", StringType)))
                    ),
                    StructField("not_before", DoubleType),
                    StructField("not_after", DoubleType),
                    StructField("all_domains", ArrayType(StringType))
                  )
                )
              ),
              // LongType: the reference's Go `CertIndex int` is 64-bit,
              // and real CT log indexes exceed Int32 — IntegerType would
              // make from_json null the field (EventId=null downstream).
              StructField("cert_index", LongType),
              StructField("seen", DoubleType),
              StructField(
                "source",
                StructType(Seq(StructField("url", StringType), StructField("name", StringType)))
              )
            )
          )
        )
      )
    ),
    required = Seq("message_type", "data")
  )

  /** Registry in dispatch order: most specific first (the reference's
    * plugin-glob order was nondeterministic; see SURVEY §1.1).
    */
  val registry: Seq[EventType] = Seq(cloudTrail, certStream, example)

  def byName(name: String): Option[EventType] = registry.find(_.name == name)
}
