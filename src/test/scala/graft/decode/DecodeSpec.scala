package graft.decode

import org.apache.spark.sql.functions._

import graft.{Fixtures, SparkSpec}
import graft.model.EventSchemas

class DecodeSpec extends SparkSpec {
  import spark.implicits._

  // JSON-only registry: the raw example type is a catch-all (always
  // matches, like the reference's byte-cast decoder), so pipelines that
  // want dead-lettering register only JSON types — registries are
  // per-pipeline, mirroring the reference's per-pipeline eventFolder.
  private val jsonOnly = Seq(EventSchemas.cloudTrail, EventSchemas.certStream)

  private def dispatch(lines: String*) =
    Decode.dispatch(lines.toDF("value"), jsonOnly)

  test("CloudTrail records are claimed by the CloudTrail type") {
    val d = dispatch(Fixtures.assumeRoleEvent, Fixtures.createUserEvent)
    d.select("_event_type").as[String].collect().toSeq shouldBe Seq("CloudTrail", "CloudTrail")
  }

  test("certstream records dispatch to certStream, not CloudTrail") {
    val d = dispatch(Fixtures.certStreamEvent)
    d.select("_event_type").as[String].head() shouldBe "certStream"
  }

  test("non-JSON records are dead-lettered, not dropped silently") {
    val d = dispatch("not json at all", Fixtures.assumeRoleEvent)
    Decode.deadLetter(d).as[String].collect().toSeq shouldBe Seq("not json at all")
    Decode.ofType(d, "CloudTrail").count() shouldBe 1
  }

  test("ofType flattens the claimed schema and keeps _raw") {
    val ct = Decode.ofType(dispatch(Fixtures.createUserEvent), "CloudTrail")
    ct.columns should contain allOf ("_raw", "eventName", "userIdentity", "eventTime")
    ct.select("eventName").as[String].head() shouldBe "CreateUser"
    ct.select(col("userIdentity.sessionContext.attributes.mfaAuthenticated"))
      .as[String]
      .head() shouldBe "false"
  }

  test("eventTime parses as a UTC instant") {
    val ct = Decode.ofType(dispatch(Fixtures.createUserEvent), "CloudTrail")
    ct.select(col("eventTime").cast("long")).as[Long].head() shouldBe 1479144345L // 2016-11-14T17:25:45Z
  }

  test("JSON that matches no required fields is unclaimed") {
    val d = dispatch("""{"foo": 1}""")
    d.select("_event_type").as[Option[String]].head() shouldBe None
  }

  test("dispatchFast labels records identically to dispatch") {
    val inputs = Seq(
      Fixtures.assumeRoleEvent,
      Fixtures.createUserEvent,
      Fixtures.certStreamEvent,
      "not json at all",
      """{"foo": 1}""",
      """{"eventVersion": "1.0", "eventTime": "2016-11-14T17:25:45Z"}""", // missing eventName
      """{"eventVersion": "1.0", "eventTime": "garbage", "eventName": "X"}""", // unparseable ts
      """{"eventVersion": "1.0", "eventTime": 1479144345, "eventName": "X"}""", // epoch ts
      """{"message_type": "heartbeat", "data": {}}""",
      """{"message_type": "certificate_update", "data": 5}""", // data not a struct... but
      """[1, 2, 3]""", // JSON but not an object
      "",
      // Adversarial rows (ADVICE r2): JacksonParser conversion rules
      // that mere presence/shape checks would get wrong.
      """{"message_type": "x", "data": {"cert_index": 1.5}}""", // fractional for LONG subfield
      """{"message_type": "x", "data": {"cert_index": 2147483648}}""", // > Int32 — valid for LONG cert_index
      """{"message_type": "x", "data": {"cert_index": 9223372036854775808}}""", // overflows LONG subfield
      """{"message_type": "x", "data": {"cert_index": 7}}""", // valid integral subfield
      """{"message_type": "x", "data": {"leaf_cert": {"all_domains": "notarray"}}}""", // string for array, 2 deep
      """{"message_type": "x", "data": {"leaf_cert": {"not_before": "abc"}}}""", // string for double, 2 deep
      """{"message_type": "x", "data": {"seen": 1}}""", // int token for double — fine
      """{"eventVersion": "1.0", "eventTime": "2016-11", "eventName": "X"}""", // partial-format ts
      """{"eventVersion": "1.0", "eventTime": "2016-11-14 17:25:45+02:00", "eventName": "X"}""", // offset ts
      """{"eventVersion": 1.0, "eventTime": "2016-11-14T17:25:45Z", "eventName": "X"}""", // number for string
      """{"eventVersion": "1.0", "eventTime": true, "eventName": "X"}""", // bool for timestamp
      // from_json's default-on parser features (r5 review): both paths
      // must parse single-quoted JSON and bare non-numeric tokens.
      """{'eventVersion': '1.0', 'eventTime': '2016-11-14T17:25:45Z', 'eventName': 'X'}""",
      """{"message_type": "x", "data": {"seen": NaN}}""", // bare NaN for double
      null // null record: dead-lettered by BOTH paths, even with a raw catch-all
    )
    for (registry <- Seq(jsonOnly, EventSchemas.registry)) {
      val slow = Decode
        .dispatch(inputs.toDF("value"), registry)
        .select("_event_type")
        .as[Option[String]]
        .collect()
        .toSeq
      val fast = Decode
        .dispatchFast(inputs.toDF("value"), registry)
        .select("_event_type")
        .as[Option[String]]
        .collect()
        .toSeq
      fast shouldBe slow
    }
  }

  test("nested subfield mismatch nulls only the leaf — record stays claimed") {
    // from_json (PERMISSIVE) nulls data.cert_index when LONG receives
    // 1.5 but keeps the enclosing `data` struct, so certStream still
    // claims the record; both dispatch paths must agree (ADVICE r2).
    val row = """{"message_type": "x", "data": {"cert_index": 1.5}}"""
    for (d <- Seq(Decode.dispatch(Seq(row).toDF("value"), jsonOnly),
                  Decode.dispatchFast(Seq(row).toDF("value"), jsonOnly))) {
      d.select("_event_type").as[Option[String]].head() shouldBe Some("certStream")
      d.select(col("_certStream.data.cert_index")).as[Option[Long]].head() shouldBe None
    }
  }

  test("top-level integral required field rejects fractional and overflowing numbers") {
    // The divergence ADVICE r2 flagged: a presence-only check would
    // claim {"n": 1.5} while from_json nulls the INT field. Both paths
    // must leave such records unclaimed.
    val intEvent = graft.model.EventType(
      name = "intEvent",
      schema = org.apache.spark.sql.types.StructType.fromDDL("n INT, tag STRING"),
      required = Seq("n")
    )
    val rows = Seq(
      """{"n": 3}""", // claimed
      """{"n": 1.5}""", // fractional → from_json nulls n → unclaimed
      """{"n": 2147483648}""", // > Int.MaxValue → unclaimed
      """{"n": "7"}""" // string token for INT → unclaimed
    )
    val slow = Decode.dispatch(rows.toDF("value"), Seq(intEvent))
      .select("_event_type").as[Option[String]].collect().toSeq
    val fast = Decode.dispatchFast(rows.toDF("value"), Seq(intEvent))
      .select("_event_type").as[Option[String]].collect().toSeq
    slow shouldBe Seq(Some("intEvent"), None, None, None)
    fast shouldBe slow
  }

  test("byte required field accepts Jackson's unsigned-extended range [-128, 255]") {
    // JacksonParser converts bytes via Jackson's getByteValue, which
    // (JACKSON-804) accepts 128..255 and WRAPS them to negative — so
    // {"b": 200} is a claimed record with b = -56, not a rejection.
    val byteEvent = graft.model.EventType(
      name = "byteEvent",
      schema = org.apache.spark.sql.types.StructType.fromDDL("b BYTE, tag STRING"),
      required = Seq("b")
    )
    val rows = Seq(
      """{"b": -128}""", // claimed
      """{"b": 127}""", // claimed
      """{"b": 200}""", // claimed, wraps to -56
      """{"b": 255}""", // claimed, wraps to -1
      """{"b": 256}""", // out of range → unclaimed
      """{"b": -129}""" // out of range → unclaimed
    )
    val slow = Decode.dispatch(rows.toDF("value"), Seq(byteEvent))
      .select("_event_type").as[Option[String]].collect().toSeq
    val fast = Decode.dispatchFast(rows.toDF("value"), Seq(byteEvent))
      .select("_event_type").as[Option[String]].collect().toSeq
    slow shouldBe Seq(Some("byteEvent"), Some("byteEvent"), Some("byteEvent"), Some("byteEvent"), None, None)
    fast shouldBe slow
    Decode.ofType(Decode.dispatch(Seq("""{"b": 200}""").toDF("value"), Seq(byteEvent)), "byteEvent")
      .select("b").as[Byte].head() shouldBe (-56: Byte)
  }

  test("decimal required fields accept string decimals and reject precision overflow") {
    // JacksonParser parses quoted decimals and nulls values that
    // overflow the declared precision — the detector must mirror both.
    val decEvent = graft.model.EventType(
      name = "decEvent",
      schema = org.apache.spark.sql.types.StructType.fromDDL("amount DECIMAL(10,2), tag STRING"),
      required = Seq("amount")
    )
    val rows = Seq(
      """{"amount": 1.23}""", // number token → claimed
      """{"amount": "1.23"}""", // string decimal → claimed (JacksonParser parses it)
      """{"amount": 12345678901.23}""", // precision 13 > 10 → nulled → unclaimed
      """{"amount": "not a number"}""" // unparseable → unclaimed
    )
    val slow = Decode.dispatch(rows.toDF("value"), Seq(decEvent))
      .select("_event_type").as[Option[String]].collect().toSeq
    val fast = Decode.dispatchFast(rows.toDF("value"), Seq(decEvent))
      .select("_event_type").as[Option[String]].collect().toSeq
    slow shouldBe Seq(Some("decEvent"), Some("decEvent"), None, None)
    fast shouldBe slow
  }

  test("dispatchFast == dispatch on randomized records (property)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    import org.apache.spark.sql.types.StructType

    // Registry spanning every required-field kind the detector special-
    // cases: integral, fractional, bool, timestamp, struct, array.
    val reg = Seq(
      graft.model.EventType("intish", StructType.fromDDL("n INT, tag STRING"), Seq("n")),
      graft.model.EventType("tsish", StructType.fromDDL("ts TIMESTAMP, v DOUBLE"), Seq("ts", "v")),
      graft.model.EventType(
        "nested",
        StructType.fromDDL("d STRUCT<x: INT, s: STRING>, a ARRAY<STRING>, b BOOLEAN"),
        Seq("d", "a")
      )
    )

    // Random JSON value rendered by hand (alphanumeric strings only, so
    // no escaping concerns); each field of each row draws a random TYPE
    // too, which is what pressures the claim/no-claim boundary.
    val scalarGen: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(s => "\"" + s.take(8) + "\""),
      Gen.choose(Long.MinValue, Long.MaxValue).map(_.toString),
      Gen.choose(-3000000000L, 3000000000L).map(_.toString), // straddles int range
      Gen.choose(-1e6, 1e6).map(d => f"$d%.3f"),
      Gen.oneOf("true", "false", "null"),
      Gen.oneOf(
        "\"2016-11-14T17:25:45Z\"", "\"2016-11\"", "\"2016-11-14 17:25:45+02:00\"",
        "\"garbage\"", "\"NaN\"", "\"Infinity\"", "1479144345", "1.5"
      )
    )
    val valueGen: Gen[String] = Gen.frequency(
      6 -> scalarGen,
      2 -> Gen.listOfN(2, scalarGen).map(_.mkString("[", ",", "]")),
      2 -> Gen.listOfN(2, Gen.zip(Gen.oneOf("x", "s", "y"), scalarGen))
        .map(_.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}"))
    )
    val fieldNames = Seq("n", "tag", "ts", "v", "d", "a", "b", "junk")
    val rowGen: Gen[String] = Gen
      .someOf(fieldNames)
      .flatMap(ks =>
        Gen.sequence[Seq[String], String](ks.map(k => valueGen.map(v => "\"" + k + "\":" + v)))
      )
      .map(_.mkString("{", ",", "}"))

    val prop = forAll(Gen.listOfN(25, rowGen)) { rows =>
      val all = rows ++ Seq("not json", "", "[1,2]")
      val slow = Decode.dispatch(all.toDF("value"), reg)
        .select("_event_type").as[Option[String]].collect().toSeq
      val fast = Decode.dispatchFast(all.toDF("value"), reg)
        .select("_event_type").as[Option[String]].collect().toSeq
      slow == fast
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("raw catch-all type claims everything the JSON types reject") {
    val d = Decode.dispatch(
      Seq(Fixtures.createUserEvent, "just a line").toDF("value"),
      EventSchemas.registry
    )
    d.select("_event_type").as[String].collect().toSeq shouldBe Seq("CloudTrail", "exampleEventType")
    Decode
      .ofType(d, "exampleEventType")
      .select("Str")
      .as[String]
      .head() shouldBe "just a line"
  }
}
