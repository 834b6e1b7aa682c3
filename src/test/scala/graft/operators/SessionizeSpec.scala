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
}
