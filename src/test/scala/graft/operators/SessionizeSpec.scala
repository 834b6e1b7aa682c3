package graft.operators

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("splits on gaps strictly greater than gapUs") {
    val df = Seq(
      ("u1", 0L, "e1"),
      ("u1", 10L, "e2"), // gap 10 <= 10 → same session
      ("u1", 21L, "e3"), // gap 11 > 10 → new session
      ("u2", 5L, "e4")
    ).toDF("user", "t", "id")
    val out = Sessionize(df, key = "user", timeUs = "t", tieBreak = "id", gapUs = 10L)
      .select("id", "session_id")
      .as[(String, Int)]
      .collect()
      .toMap
    out("e1") shouldBe 1
    out("e2") shouldBe 1
    out("e3") shouldBe 2
    out("e4") shouldBe 1
  }

  test("single event is its own session") {
    val df = Seq(("u1", 42L, "only")).toDF("user", "t", "id")
    val out = Sessionize(df, "user", "t", "id", 100L).select("session_id").as[Int].collect()
    out.toSeq shouldBe Seq(1)
  }

  test("matches a brute-force reference on random inputs (property)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll

    val eventsGen = Gen
      .listOfN(30, Gen.zip(Gen.oneOf("a", "b"), Gen.choose(0L, 60L)))
      .map(_.zipWithIndex.map { case ((k, t), i) => (k, t, s"e$i") })

    val prop = forAll(eventsGen, Gen.choose(1L, 15L)) { (events, gap) =>
      val got = Sessionize(events.toDF("k", "t", "id"), "k", "t", "id", gap)
        .select("id", "session_id")
        .as[(String, Int)]
        .collect()
        .toMap
      // Brute force: per key, walk (t, id)-sorted events, bump the
      // session counter when the gap exceeds gapUs.
      val want = events
        .groupBy(_._1)
        .flatMap { case (_, evs) =>
          val sorted = evs.sortBy(e => (e._2, e._3))
          var sid = 0
          var prev = Long.MinValue
          sorted.map { case (_, t, id) =>
            if (prev == Long.MinValue || t - prev > gap) sid += 1
            prev = t
            id -> sid
          }
        }
        .toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
