package graft

import org.apache.spark.sql.functions._

/** StreamBench's inlined event templates must keep decoding as
  * CloudTrail and matching the measured rules — otherwise the bench
  * would silently measure dead-letter throughput and report it as
  * rule throughput. Pins the decode label, the rule-side predicates,
  * and the varied-identity derivation for both templates.
  */
class StreamBenchSpec extends SparkSpec {
  import spark.implicits._

  private def dispatched(lines: String*) =
    graft.decode.Decode.dispatchFast(lines.toDF("value"), model.EventSchemas.registry)

  /** What the pipeline hands a CloudTrail rule (compiler: ofType). */
  private def asCloudTrail(lines: String*) =
    graft.decode.Decode.ofType(dispatched(lines: _*), "CloudTrail")

  test("both templates decode as CloudTrail (never dead-letter)") {
    val d = dispatched(StreamBench.createUserTemplate, StreamBench.assumeRoleTemplate)
    d.select(col("_event_type")).as[String].collect().toSeq shouldBe Seq("CloudTrail", "CloudTrail")
  }

  test("the CreateUser template feeds the stateful-agg rule's filter and VARIED key") {
    // aggVariant keys AssumedRole on sessionIssuer.userName — the
    // bench must vary THAT field or the keyed count degenerates to a
    // single hot key (the round-11 finding this spec pins)
    val d = asCloudTrail(
      StreamBench.createUserTemplate
        .replace("Bob-EC2-dev", "user-7")
        .replace("AssumeNothing", "role-7"))
    val row = d
      .filter(col("userIdentity.sessionContext.attributes.mfaAuthenticated") === "false")
      .select(rules.Principal.aggVariant(col("userIdentity")))
      .as[String]
      .collect()
    row.length shouldBe 1
    row.head shouldBe "role/role-7"
  }

  test("the template pair drives the s2s rule end to end: build key matches probe key") {
    val build = asCloudTrail(StreamBench.assumeRoleTemplate.replace("Bob-EC2-dev", "user-3"))
      .filter(col("eventName") === "AssumeRole")
      .select(
        from_json(col("_raw"), model.EventSchemas.assumeRoleResponse)
          .getField("responseElements").getField("assumedRoleUser").getField("assumedRoleId"))
      .as[String].collect()
    val probe = asCloudTrail(StreamBench.createUserTemplate.replace("Bob-EC2-dev", "user-3"))
      .filter(col("eventName") === "CreateUser")
      .select(col("userIdentity.principalId"))
      .as[String].collect()
    build.length shouldBe 1
    probe.length shouldBe 1
    build.head shouldBe probe.head // the enrichment join would land
  }
}
