package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.Fixtures

/** Mirrors the reference's config/validation unit tests
  * (pipeline_test.go:86-206).
  */
class PipelineConfigSpec extends AnyFunSuite with Matchers {

  test("parse NEVER throws: arbitrary junk comes back as Left or a parsed config (property)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    // config input is API-facing (the ApiServer maps Left to a 400) —
    // an escaping exception would 500. Shapes: random text, random
    // JSON scalars/arrays where objects are expected, wrong-typed
    // knobs (the round-12 max_files_per_trigger hardening must throw
    // INSIDE parse's try, not past it).
    val scalar = Gen.oneOf(
      Gen.alphaNumStr.map(s => s""""$s""""),
      Gen.choose(-5, 5).map(_.toString),
      // width-overflow class (ADVICE r12): integers past the knob's
      // target width must land in parse's error arm, not wrap through
      // BigInt.toInt — generate across int/long boundaries too
      Gen.oneOf(1L << 31, (1L << 32) + 1, Long.MaxValue).map(_.toString),
      Gen.const("92233720368547758080"), // past Long.MaxValue
      Gen.oneOf("null", "true", "false", "2.5", "-1", "0", "[]", "{}"))
    val sourceObj = scalar.flatMap(v =>
      Gen.oneOf(
        s"""{"type": "File", "path": "/x", "max_files_per_trigger": $v}""",
        s"""{"type": "Kafka", "max_offsets_per_trigger": $v,
           |  "kafka_config": {"broker": "b:9092", "topic": "t", "partitions": $v}}""".stripMargin,
        s"""{"type": $v}""",
        v))
    val cfg = for {
      src <- sourceObj
      ss <- scalar
      junk <- Gen.alphaNumStr
    } yield Gen.oneOf(
      s"""{"eventFolder": "builtin", "stateStore": $ss, "rules": $junk,
         | "sources": {"s": $src}, "sinks": [], "states": 7}""".stripMargin,
      s"""{"sources": {"s": $src}}""",
      junk,
      s"[$ss, $ss"
    )
    val prop = forAll(cfg.flatMap(identity)) { raw =>
      PipelineConfig.parse(raw) match {
        case Left(msg) => msg.nonEmpty
        case Right(c)  => PipelineConfig.validate(c, Set("aRule")).isLeft || true
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    withClue(res.status) { res.passed shouldBe true }
  }

  private val registry = Set("aRule", "lengthRule", "cloudTrailS2SJoin")

  test("parses the golden config shape") {
    val c = PipelineConfig.parse(Fixtures.pipelineConfig).toOption.get
    c.rules.keySet shouldBe Set("searchConversation", "lengthRule")
    c.rules("searchConversation").source shouldBe "fileInput"
    c.rules("searchConversation").sink shouldBe Some("fileOutput")
    c.sources("fileInput").`type` shouldBe "File"
    c.sources("fileInput").path shouldBe Some("testdata/pipelines/input")
    c.sinks("fileOutput").path shouldBe Some("testdata/pipelines/output")
  }

  test("valid config validates") {
    val c = PipelineConfig.parse(Fixtures.pipelineConfig).toOption.get
    PipelineConfig.validate(c, registry).isRight shouldBe true
  }

  test("rejects a rule with an unknown source") {
    val c = PipelineConfig
      .parse("""{"rules": {"r": {"source": "nope", "plugin": "aRule"}},
               | "sources": {"s": {"type": "File"}}, "sinks": {}, "states": {}}""".stripMargin)
      .toOption
      .get
    PipelineConfig.validate(c, registry).left.toOption.get should include("Invalid source")
  }

  test("rejects a rule with an unknown state (pipeline_test.go:146-170)") {
    val c = PipelineConfig
      .parse("""{"rules": {"r": {"source": "s", "plugin": "aRule", "state": "missing"}},
               | "sources": {"s": {"type": "File"}}, "sinks": {}, "states": {}}""".stripMargin)
      .toOption
      .get
    PipelineConfig.validate(c, registry).left.toOption.get should include("Invalid state")
  }

  test("rejects duplicate names across sections (pipeline_test.go:122-144)") {
    val c = PipelineConfig
      .parse("""{"rules": {"x": {"source": "x", "plugin": "aRule"}},
               | "sources": {"x": {"type": "File"}}, "sinks": {}, "states": {}}""".stripMargin)
      .toOption
      .get
    PipelineConfig.validate(c, registry).left.toOption.get should include("duplicate keys")
  }

  test("rejects two rules sharing one state (pipeline_test.go:172-206)") {
    val c = PipelineConfig
      .parse("""{"rules": {
               |   "r1": {"source": "s", "plugin": "aRule", "state": "kv"},
               |   "r2": {"source": "s", "plugin": "aRule", "state": "kv"}},
               | "sources": {"s": {"type": "File"}}, "sinks": {},
               | "states": {"kv": {"type": "KV"}}}""".stripMargin)
      .toOption
      .get
    PipelineConfig.validate(c, registry).left.toOption.get should include("only one rule")
  }

  test("rejects an unregistered plugin (replaces the .so stat check)") {
    val c = PipelineConfig
      .parse("""{"rules": {"r": {"source": "s", "plugin": "no_such.so"}},
               | "sources": {"s": {"type": "File"}}, "sinks": {}, "states": {}}""".stripMargin)
      .toOption
      .get
    PipelineConfig.validate(c, registry).left.toOption.get should include("Invalid plugin")
  }

  test("malformed JSON is a Left, not an exception") {
    PipelineConfig.parse("{nope").isLeft shouldBe true
  }

  test("rejects a cyclic rule graph instead of overflowing the compiler") {
    // r1 → r2 (sink edge) and r2 → r1 (source edge) form a cycle.
    val c = PipelineConfig
      .parse("""{"rules": {
               |   "r1": {"source": "r2", "plugin": "aRule", "sink": "r2"},
               |   "r2": {"source": "r1", "plugin": "aRule"}},
               | "sources": {"s": {"type": "File"}}, "sinks": {}, "states": {}}""".stripMargin)
      .toOption
      .get
    PipelineConfig.validate(c, registry).left.toOption.get should include("cycle")
  }

  test("self-loop is a cycle") {
    val c = PipelineConfig
      .parse("""{"rules": {"r": {"source": "s", "plugin": "aRule", "sink": "r"}},
               | "sources": {"s": {"type": "File"}}, "sinks": {}, "states": {}}""".stripMargin)
      .toOption
      .get
    PipelineConfig.validate(c, registry).left.toOption.get should include("cycle")
  }

  test("trigger caps: present-but-invalid is a config error, including integer overflow") {
    def src(knob: String): String =
      s"""{"sources": {"s": {"type": "File", "path": "/x", $knob}}}"""
    // the ADVICE-flagged wrap class: BigInt.toInt truncates, so 2^31
    // must be rejected (it would wrap negative) and 2^32+1 must be
    // rejected (it would wrap to 1 == a near-stalled pipeline), not
    // silently accepted
    for (bad <- Seq(s"${1L << 31}", s"${(1L << 32) + 1}", "0", "-3", "2.5", "\"ten\"", "[]"))
      withClue(s"max_files_per_trigger: $bad") {
        PipelineConfig.parse(src(s""""max_files_per_trigger": $bad""")).left.toOption.get should
          include("max_files_per_trigger")
      }
    // the Kafka cap is a LONG (offset totals legitimately exceed
    // Int.MaxValue); past Long.MaxValue or non-integral is the error
    for (bad <- Seq("92233720368547758080", "0", "-1", "1.5", "\"many\""))
      withClue(s"max_offsets_per_trigger: $bad") {
        PipelineConfig
          .parse("""{"sources": {"k": {"type": "Kafka", "max_offsets_per_trigger": BAD,
                   |  "kafka_config": {"broker": "b:9092", "topic": "t"}}}}""".stripMargin
            .replace("BAD", bad))
          .left.toOption.get should include("max_offsets_per_trigger")
      }
    // kafka partitions: same wrap guard; 0 stays the documented
    // whole-topic-subscribe form
    PipelineConfig
      .parse(s"""{"sources": {"k": {"type": "Kafka",
                |  "kafka_config": {"broker": "b:9092", "topic": "t", "partitions": ${1L << 31}}}}}""".stripMargin)
      .left.toOption.get should include("partitions")
    PipelineConfig
      .parse("""{"sources": {"k": {"type": "Kafka",
               |  "kafka_config": {"broker": "b:9092", "topic": "t", "partitions": 0}}}}""".stripMargin)
      .toOption.get.sources("k").kafkaPartitions shouldBe None
  }

  test("a trigger cap on the wrong source type fails validation, not silently ignored") {
    val filesOnKafka = PipelineConfig
      .parse("""{"rules": {}, "states": {}, "sinks": {},
               | "sources": {"k": {"type": "Kafka", "max_files_per_trigger": 4,
               |   "kafka_config": {"broker": "b:9092", "topic": "t"}}}}""".stripMargin)
      .toOption.get
    PipelineConfig.validate(filesOnKafka, registry).left.toOption.get should
      include("max_files_per_trigger")
    val offsetsOnFile = PipelineConfig
      .parse("""{"rules": {}, "states": {}, "sinks": {},
               | "sources": {"s": {"type": "File", "path": "/x", "max_offsets_per_trigger": 4}}}""".stripMargin)
      .toOption.get
    PipelineConfig.validate(offsetsOnFile, registry).left.toOption.get should
      include("max_offsets_per_trigger")
  }

  test("kafka_config block parses broker and topic (input/kafka.go parity)") {
    val c = PipelineConfig
      .parse("""{"rules": {}, "states": {}, "sinks": {},
               | "sources": {"k": {"type": "Kafka",
               |   "kafka_config": {"broker": "b1:9092", "topic": "events", "partitions": 4}}}}""".stripMargin)
      .toOption
      .get
    c.sources("k").kafkaBroker shouldBe Some("b1:9092")
    c.sources("k").kafkaTopic shouldBe Some("events")
  }

  test("diamond fan-out/fan-in is NOT a cycle") {
    val c = PipelineConfig
      .parse("""{"rules": {
               |   "top": {"source": "s", "plugin": "aRule"},
               |   "l":   {"source": "top", "plugin": "aRule", "sink": "bottom"},
               |   "r":   {"source": "top", "plugin": "aRule", "sink": "bottom"},
               |   "bottom": {"source": "s", "plugin": "aRule"}},
               | "sources": {"s": {"type": "File"}}, "sinks": {}, "states": {}}""".stripMargin)
      .toOption
      .get
    PipelineConfig.validate(c, registry).isRight shouldBe true
  }
}
