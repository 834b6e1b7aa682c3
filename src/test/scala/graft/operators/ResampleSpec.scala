package graft.operators

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("forward fill carries the latest observation across grid gaps") {
    // step=10: obs at t=3 (v=1.0) and t=27 (v=2.0) → ticks 0,10,20.
    val obs = Seq(("k", 3L, "a", 1.0), ("k", 27L, "b", 2.0)).toDF("k", "t", "id", "v")
    val out = Resample
      .forwardFill(obs, key = "k", timeUs = "t", valueCol = "v", stepUs = 10L, obsTieBreak = Some("id"))
      .select("tick_us", "v")
      .as[(Long, Option[Double])]
      .collect()
      .toMap
    out.keySet shouldBe Set(0L, 10L, 20L)
    out(0L) shouldBe None // tick precedes the first observation
    out(10L) shouldBe Some(1.0)
    out(20L) shouldBe Some(1.0) // gap: value carried forward
  }

  test("numeric obsTieBreak is ordered numerically: seq 10 beats seq 9 at the same instant") {
    // A lexicographic tie-break would pick "9" over "10" and forward-
    // fill the STALE value — the last-write-wins contract demands the
    // native numeric order.
    val obs = Seq(("k", 0L, 9L, 1.0), ("k", 0L, 10L, 2.0)).toDF("k", "t", "seq", "v")
    val out = Resample
      .forwardFill(obs, key = "k", timeUs = "t", valueCol = "v", stepUs = 10L, obsTieBreak = Some("seq"))
      .select("tick_us", "v")
      .as[(Long, Option[Double])]
      .collect()
      .toMap
    out(0L) shouldBe Some(2.0) // seq=10 wrote last
  }

  test("tick at the observation instant sees the observation") {
    val obs = Seq(("k", 10L, "a", 5.0)).toDF("k", "t", "id", "v")
    val out = Resample
      .forwardFill(obs, "k", "t", "v", 10L, Some("id"))
      .select("tick_us", "v")
      .as[(Long, Option[Double])]
      .collect()
      .toMap
    out shouldBe Map(10L -> Some(5.0))
  }

  test("pre-1970 (negative) timestamps align to the floor grid, not toward zero") {
    // step=10: obs at t=-13 → floor grid tick is -20 (truncation toward
    // zero would put it at -10, AFTER the observation) and t=7 → tick 0.
    val obs = Seq(("k", -13L, "a", 1.0), ("k", 7L, "b", 2.0)).toDF("k", "t", "id", "v")
    val out = Resample
      .forwardFill(obs, "k", "t", "v", 10L, Some("id"))
      .select("tick_us", "v")
      .as[(Long, Option[Double])]
      .collect()
      .toMap
    out.keySet shouldBe Set(-20L, -10L, 0L)
    out(-20L) shouldBe None // tick precedes the first observation
    out(-10L) shouldBe Some(1.0)
    out(0L) shouldBe Some(1.0) // obs at t=7 is after the tick — carry t=-13's value
  }

  test("interpolate blends linearly between observations, steps at edges") {
    // step=10: obs at t=0 (v=0.0) and t=20 (v=10.0) → ticks 0,10,20.
    val obs = Seq(("k", 0L, "a", 0.0), ("k", 20L, "b", 10.0)).toDF("k", "t", "id", "v")
    val out = Resample
      .interpolate(obs, "k", "t", "v", 10L, Some("id"))
      .select("tick_us", "v")
      .as[(Long, Option[Double])]
      .collect()
      .toMap
    out(0L) shouldBe Some(0.0) // on the observation
    out(10L) shouldBe Some(5.0) // midpoint
    out(20L) shouldBe Some(10.0)
  }

  test("interpolate back-fills before the first observation") {
    // obs at t=15 and t=25 → grid 10..20; tick 10 precedes the first obs.
    val obs = Seq(("k", 15L, "a", 3.0), ("k", 25L, "b", 7.0)).toDF("k", "t", "id", "v")
    val out = Resample
      .interpolate(obs, "k", "t", "v", 10L, Some("id"))
      .select("tick_us", "v")
      .as[(Long, Option[Double])]
      .collect()
      .toMap
    out(10L) shouldBe Some(3.0) // head: next value back-fills
    out(20L) shouldBe Some(3.0 + (7.0 - 3.0) * (5.0 / 10.0)) // between 15 and 25
  }

  test("matches a brute-force reference on random series (property)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll

    val step = 10L
    val obsGen = Gen
      .listOfN(15, Gen.zip(Gen.oneOf("a", "b"), Gen.choose(-40L, 40L), Gen.choose(0.0, 9.0)))
      .map(_.zipWithIndex.map { case ((k, t, v), i) => (k, t, s"o$i", v) })

    val prop = forAll(obsGen) { obs =>
      val out = Resample
        .forwardFill(obs.toDF("k", "t", "id", "v"), "k", "t", "v", step, Some("id"))
        .select("k", "tick_us", "v")
        .as[(String, Long, Option[Double])]
        .collect()
        .map { case (k, tick, v) => (k, tick) -> v }
        .toMap
      // Brute force per key: floor grid from min to max, each tick
      // carrying the latest observation at-or-before it (ties on time
      // broken by the id column rendered as a string).
      val want = obs.groupBy(_._1).flatMap { case (k, rows) =>
        val ts = rows.map(_._2)
        def fl(t: Long) = math.floorDiv(t, step) * step
        (fl(ts.min) to fl(ts.max) by step).map { tick =>
          val c = rows.filter(_._2 <= tick)
          (k, tick) -> (if (c.isEmpty) None else Some(c.maxBy(r => (r._2, r._3))._4))
        }
      }.toMap
      out == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("keys resample independently") {
    val obs = Seq(("a", 0L, "x", 1.0), ("a", 25L, "y", 2.0), ("b", 5L, "z", 9.0)).toDF("k", "t", "id", "v")
    val out = Resample
      .forwardFill(obs, "k", "t", "v", 10L, Some("id"))
      .select("k", "tick_us")
      .as[(String, Long)]
      .collect()
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).sorted.toSeq)
      .toMap
    out("a") shouldBe Seq(0L, 10L, 20L)
    out("b") shouldBe Seq(0L)
  }
}
