package graft.rules

import org.apache.spark.sql.Row

import graft.{Fixtures, SparkSpec}
import graft.decode.Decode
import graft.model.EventSchemas

/** The reference's two golden integration scenarios
  * (integration_test.go:185-276 and 319-416), batch form: same input
  * JSON, same exact OutputEvent.
  */
class CloudTrailRulesSpec extends SparkSpec {
  import spark.implicits._

  private def decodeCloudTrail(lines: String*) =
    Decode.ofType(Decode.dispatch(lines.toDF("value"), EventSchemas.registry), "CloudTrail")

  test("s2s join golden: AssumeRole then CreateUser resolves Entity user/Bob") {
    val ct = decodeCloudTrail(Fixtures.assumeRoleEvent, Fixtures.createUserEvent)
    val out = CloudTrailS2SJoinRule(ct).collect()
    out.length shouldBe 1
    val r = out.head
    r.getAs[String]("Source") shouldBe "CloudTrail"
    r.getAs[java.sql.Timestamp]("EventTime").getTime shouldBe 1479144345000L // 2016-11-14T17:25:45Z
    r.getAs[String]("EventType") shouldBe "UserCreated"
    r.getAs[String]("Name") shouldBe "IAMUserCreated"
    r.getAs[Int]("Level") shouldBe graft.model.Level.Warn
    r.getAs[String]("EventId") shouldBe "dEXAMPLE-265a-41e0-9352-4401bEXAMPLE"
    r.getAs[String]("Entity") shouldBe "user/Bob"
    r.getAs[String]("SourceIP") shouldBe "192.0.2.1"
    r.getAs[Map[String, String]]("Body") shouldBe Map(
      "AccountID" -> "777788889999",
      "UserCreated" -> "god_user"
    )
    r.getAs[Int]("Occurrences") shouldBe 1
  }

  test("s2s join without a preceding AssumeRole falls back to the raw principalId") {
    val ct = decodeCloudTrail(Fixtures.createUserEvent)
    val out = CloudTrailS2SJoinRule(ct).collect()
    out.length shouldBe 1
    // reference: cloudTrail_s2s_join.go:124-130 — probe-miss passes the id through
    out.head.getAs[String]("Entity") shouldBe "AIDAQRSTUVWXYZEXAMPLE:Bob-EC2-dev"
  }

  test("principal arms mirror Go zero-values: a missing userName yields user/, not null") {
    // Go unmarshals an absent string to "" (Sprintf -> "user/"); Spark's
    // from_json gives null, which would null the whole concat without
    // the coalesce in Principal.common.
    // createUserEvent's userIdentity has no userName field; flipping its
    // type to IAMUser routes it through the user/<userName> arm.
    val noUserName = Fixtures.createUserEvent.replace(""""type": "AssumedRole"""", """"type": "IAMUser"""")
    val ct = decodeCloudTrail(noUserName)
    val out = CloudTrailS2SJoinRule(ct).collect()
    out.length shouldBe 1
    out.head.getAs[String]("Entity") shouldBe "user/"
  }

  test("agg golden: three no-MFA events aggregate to Occurrences=3, Entity role/AssumeNothing") {
    val ct = decodeCloudTrail(Fixtures.createUserEvent, Fixtures.createUserEvent, Fixtures.createUserEvent)
    val out = CloudTrailNoMfaAggRule(ct).collect()
    out.length shouldBe 1
    val r = out.head
    r.getAs[String]("Source") shouldBe "CloudTrail"
    r.getAs[java.sql.Timestamp]("EventTime").getTime shouldBe 1479144345000L
    r.getAs[String]("EventType") shouldBe "NoMFA"
    r.getAs[String]("Name") shouldBe "NoMFA"
    r.getAs[Int]("Level") shouldBe graft.model.Level.Warn
    r.getAs[String]("EventId") shouldBe "dEXAMPLE-265a-41e0-9352-4401bEXAMPLE"
    r.getAs[String]("Entity") shouldBe "role/AssumeNothing"
    r.getAs[String]("SourceIP") shouldBe "192.0.2.1"
    r.getAs[Map[String, String]]("Body") shouldBe Map("AccountID" -> "777788889999")
    r.getAs[Int]("Occurrences") shouldBe 3
  }

  test("agg rule ignores MFA-authenticated events") {
    val mfaEvent = Fixtures.createUserEvent.replace("\"mfaAuthenticated\": \"false\"", "\"mfaAuthenticated\": \"true\"")
    val ct = decodeCloudTrail(mfaEvent)
    CloudTrailNoMfaAggRule(ct).count() shouldBe 0
  }

  test("example predicate rules match the reference (testdata/rules/{a,length}.go)") {
    val df = Seq("a", "b", "ab", "").toDF("Str")
    ExampleARule(df).as[Boolean].collect().toSeq shouldBe Seq(true, false, false, false)
    ExampleLengthRule(df).as[Boolean].collect().toSeq shouldBe Seq(true, true, false, false)
  }

  test("certstream rule emits OutputEvent for www domains, skips heartbeats") {
    val certs = Decode.ofType(
      Decode.dispatch(
        Seq(
          Fixtures.certStreamEvent,
          """{"message_type": "heartbeat", "data": {"update_type": "x", "leaf_cert": {"subject": {}, "all_domains": ["www.skip.me"]}, "cert_index": 1, "seen": 1.0, "source": {"url": "u", "name": "n"}}}"""
        ).toDF("value"),
        EventSchemas.registry
      ),
      "certStream"
    )
    val out: Array[Row] = DomainCertIssuedRule(certs).collect()
    out.length shouldBe 1
    out.head.getAs[String]("Name") shouldBe "DomainNameSeenInCertificate"
    out.head.getAs[String]("Entity") shouldBe "Example CT Log"
    out.head.getAs[String]("EventId") shouldBe "12345"
    out.head.getAs[Int]("Level") shouldBe graft.model.Level.Info
  }
}
