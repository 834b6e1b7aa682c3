package graft.model

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Severity codec parity with the reference (output/event.go:22-55). */
class LevelSpec extends AnyFunSuite with Matchers {

  test("names match the reference") {
    Level.name(Level.Error) shouldBe "error"
    Level.name(Level.Warn) shouldBe "warn"
    Level.name(Level.Info) shouldBe "info"
    Level.name(99) shouldBe "unknown"
  }

  test("parse is case-insensitive and accepts the warning alias") {
    Level.parse("ERROR") shouldBe Some(Level.Error)
    Level.parse("Warning") shouldBe Some(Level.Warn)
    Level.parse("warn") shouldBe Some(Level.Warn)
    Level.parse("iNfO") shouldBe Some(Level.Info)
    Level.parse("fatal") shouldBe None
  }

  test("parse(name(l)) roundtrips for every valid level") {
    (0 to 2).foreach(l => Level.parse(Level.name(l)) shouldBe Some(l))
  }

  test("parse is stable under random casing (property)") {
    val mixedCase: Gen[String] = for {
      base <- Gen.oneOf("error", "warn", "warning", "info")
      flips <- Gen.listOfN(base.length, Gen.oneOf(true, false))
    } yield base.zip(flips).map { case (c, up) => if (up) c.toUpper else c }.mkString
    val prop = forAll(mixedCase) { s =>
      Level.parse(s) == Level.parse(s.toLowerCase) && Level.parse(s).isDefined
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
