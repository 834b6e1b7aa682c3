package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(
      left: Seq[(String, String, Long)], // (id, key, t)
      right: Seq[(String, Long, String)] // (key, t, value)
  ): Map[String, Option[String]] = {
    val l = left.toDF("id", "k", "t")
    val r = right.toDF("k", "t", "v")
    AsOfJoin(l, r, key = "k", leftTime = "t", rightTime = "t", rightVals = Seq("v" -> "v"), tieBreak = "id")
      .select("id", "v")
      .as[(String, Option[String])]
      .collect()
      .toMap
  }

  test("latest right row at or before left time wins") {
    val out = run(
      left = Seq(("p1", "a", 10L), ("p2", "a", 25L)),
      right = Seq(("a", 5L, "v5"), ("a", 20L, "v20"), ("a", 30L, "v30"))
    )
    out("p1") shouldBe Some("v5")
    out("p2") shouldBe Some("v20")
  }

  test("probe before any build yields null (left outer)") {
    val out = run(
      left = Seq(("p1", "a", 1L)),
      right = Seq(("a", 5L, "v5"))
    )
    out("p1") shouldBe None
  }

  test("key with no build rows passes through") {
    val out = run(
      left = Seq(("p1", "b", 10L)),
      right = Seq(("a", 5L, "v5"))
    )
    out("p1") shouldBe None
  }

  test("build at equal timestamp is visible to the probe") {
    // Matches the reference: the KV Set happens at event arrival, before
    // any probe of the same instant (cloudTrail_s2s_join.go:68-78).
    val out = run(
      left = Seq(("p1", "a", 10L)),
      right = Seq(("a", 10L, "v10"))
    )
    out("p1") shouldBe Some("v10")
  }

  test("last-write-wins among equal build timestamps") {
    val out = run(
      left = Seq(("p9", "a", 10L)),
      right = Seq(("a", 7L, "first"), ("a", 7L, "second"))
    )
    // Both precede the probe; the running last() takes the later in sort
    // order — any of the two is a valid LWW answer, but it must be
    // deterministic across reruns.
    val again = run(
      left = Seq(("p9", "a", 10L)),
      right = Seq(("a", 7L, "first"), ("a", 7L, "second"))
    )
    out("p9") shouldBe again("p9")
    out("p9").isDefined shouldBe true
  }

  test("right tie-break resolves simultaneous build rows deterministically") {
    val l = Seq(("p1", "a", 10L)).toDF("id", "k", "t")
    val r = Seq(("a", 7L, "first", 1L), ("a", 7L, "second", 2L)).toDF("k", "t", "v", "rid")
    def go() = AsOfJoin(
      l, r, "k", "t", "t", Seq("v" -> "v"), "id", rightTieBreak = Some("rid")
    ).select("v").as[String].head()
    // rid=2 sorts last → last-write-wins picks "second", every run.
    go() shouldBe "second"
    go() shouldBe "second"
  }

  test("internal helper names do not collide with user columns") {
    // Left carries columns literally named _t / _side / _tb / _rv_v:
    // the operator must uniquify its internals around them.
    val l = Seq(("p1", "a", 10L, "keep1", "keep2", "keep3", "keep4"))
      .toDF("id", "k", "t", "_t", "_side", "_tb", "_rv_v")
    val r = Seq(("a", 5L, "v5")).toDF("k", "t", "v")
    val out = AsOfJoin(l, r, "k", "t", "t", Seq("v" -> "v"), "id")
    out.columns.toSeq shouldBe Seq("id", "k", "t", "_t", "_side", "_tb", "_rv_v", "v")
    out.select("_t", "_side", "_tb", "_rv_v", "v").as[(String, String, String, String, String)].head() shouldBe
      (("keep1", "keep2", "keep3", "keep4", "v5"))
  }

  test("forward direction matches the next right row at or after the probe") {
    val l = Seq(("p1", "a", 10L), ("p2", "a", 25L), ("p3", "a", 40L)).toDF("id", "k", "t")
    val r = Seq(("a", 10L, "v10"), ("a", 30L, "v30")).toDF("k", "t", "v")
    val out = AsOfJoin(l, r, "k", "t", "t", Seq("v" -> "v"), "id", direction = "forward")
      .select("id", "v").as[(String, Option[String])].collect().toMap
    out("p1") shouldBe Some("v10") // same instant is visible, like backward
    out("p2") shouldBe Some("v30")
    out("p3") shouldBe None // nothing after the last probe
  }

  test("tolerance nulls out matches beyond the window, both directions") {
    val l = Seq(("p1", "a", 100L), ("p2", "a", 200L)).toDF("id", "k", "t")
    val r = Seq(("a", 95L, "near"), ("a", 120L, "fwd")).toDF("k", "t", "v")
    val back = AsOfJoin(l, r, "k", "t", "t", Seq("v" -> "v"), "id", toleranceUs = Some(10L))
      .select("id", "v").as[(String, Option[String])].collect().toMap
    back("p1") shouldBe Some("near") // gap 5 <= 10
    back("p2") shouldBe None // nearest preceding is 120, gap 80 > 10
    val fwd = AsOfJoin(l, r, "k", "t", "t", Seq("v" -> "v"), "id",
      direction = "forward", toleranceUs = Some(25L))
      .select("id", "v").as[(String, Option[String])].collect().toMap
    fwd("p1") shouldBe Some("fwd") // gap 20 <= 25
    fwd("p2") shouldBe None // nothing at or after 200
  }

  test("forward matches a brute-force reference on random inputs (property)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll

    val keyGen = Gen.oneOf("a", "b", "c")
    val timeGen = Gen.choose(0L, 20L)
    val leftGen = Gen.listOfN(25, Gen.zip(keyGen, timeGen)).map(_.zipWithIndex.map { case ((k, t), i) => (s"L$i", k, t) })
    val rightGen =
      Gen.listOfN(25, Gen.zip(keyGen, timeGen)).map(_.zipWithIndex.map { case ((k, t), i) => (k, t, s"v$i", i.toLong) })

    val prop = forAll(leftGen, rightGen, Gen.option(Gen.choose(0L, 8L))) { (left, right, tol) =>
      val l = left.toDF("id", "k", "t")
      val r = right.toDF("k", "t", "v", "rid")
      val got = AsOfJoin(l, r, "k", "t", "t", Seq("v" -> "v"), "id",
        rightTieBreak = Some("rid"), direction = "forward", toleranceUs = tol)
        .select("id", "v")
        .as[(String, Option[String])]
        .collect()
        .toMap
      // Brute force: earliest right row at or after each left row's time
      // (ties on time broken by rid in its NATIVE numeric order, first
      // wins), nulled when beyond the tolerance.
      val want = left.map { case (id, k, t) =>
        val candidates = right.filter(r => r._1 == k && r._2 >= t)
        val m = if (candidates.isEmpty) None else Some(candidates.minBy(c => (c._2, c._4)))
        id -> m.filter(c => tol.forall(c._2 - t <= _)).map(_._3)
      }.toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("matches a brute-force reference on random inputs (property)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll

    val keyGen = Gen.oneOf("a", "b", "c")
    val timeGen = Gen.choose(0L, 20L)
    val leftGen = Gen.listOfN(25, Gen.zip(keyGen, timeGen)).map(_.zipWithIndex.map { case ((k, t), i) => (s"L$i", k, t) })
    val rightGen =
      Gen.listOfN(25, Gen.zip(keyGen, timeGen)).map(_.zipWithIndex.map { case ((k, t), i) => (k, t, s"v$i", i.toLong) })

    val prop = forAll(leftGen, rightGen) { (left, right) =>
      val l = left.toDF("id", "k", "t")
      val r = right.toDF("k", "t", "v", "rid")
      val got = AsOfJoin(l, r, "k", "t", "t", Seq("v" -> "v"), "id", rightTieBreak = Some("rid"))
        .select("id", "v")
        .as[(String, Option[String])]
        .collect()
        .toMap
      // Brute force: latest right row at or before each left row's time;
      // ties among right rows resolved by rid in its NATIVE numeric
      // order (a string cast would invert it: "9" > "10").
      val want = left.map { case (id, k, t) =>
        val candidates = right.filter(r => r._1 == k && r._2 <= t)
        id -> (if (candidates.isEmpty) None
               else Some(candidates.maxBy(c => (c._2, c._4))._3))
      }.toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("left columns are preserved") {
    val l = Seq(("p1", "a", 10L, 3.5)).toDF("id", "k", "t", "x")
    val r = Seq(("a", 5L, "v")).toDF("k", "t", "v")
    val out = AsOfJoin(l, r, "k", "t", "t", Seq("v" -> "v"), "id")
    out.columns.toSeq shouldBe Seq("id", "k", "t", "x", "v")
    out.select("x").as[Double].head() shouldBe 3.5
  }

  test("banded (hot-key fallback) is bit-identical to the plain sweep (property)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll

    // Times span many small bands so carries cross band boundaries
    // constantly; empty bands, band-edge timestamps (t = multiple of
    // bandUs), keys with no builds, and NULL times on either side
    // (apply treats them as -infinity; banded must agree) all occur
    // under these gens.
    val keyGen = Gen.oneOf("a", "b")
    val timeGen = Gen.frequency(9 -> Gen.choose(0L, 40L).map(Option(_)), 1 -> Gen.const(Option.empty[Long]))
    val leftGen = Gen.listOfN(30, Gen.zip(keyGen, timeGen)).map(_.zipWithIndex.map { case ((k, t), i) => (s"L$i", k, t) })
    val rightGen =
      Gen.listOfN(30, Gen.zip(keyGen, timeGen)).map(_.zipWithIndex.map { case ((k, t), i) => (k, t, s"v$i", i.toLong) })

    val prop = forAll(
      leftGen,
      rightGen,
      Gen.oneOf("backward", "forward"),
      Gen.option(Gen.choose(0L, 10L)),
      Gen.choose(3L, 9L) // band width
    ) { (left, right, dir, tol, band) =>
      val l = left.toDF("id", "k", "t")
      val r = right.toDF("k", "t", "v", "rid")
      def collect(df: org.apache.spark.sql.DataFrame) =
        df.select("id", "v").as[(String, Option[String])].collect().toMap
      val plain = collect(
        AsOfJoin(l, r, "k", "t", "t", Seq("v" -> "v"), "id",
          rightTieBreak = Some("rid"), direction = dir, toleranceUs = tol)
      )
      val banded = collect(
        AsOfJoin.banded(l, r, "k", "t", "t", Seq("v" -> "v"), "id",
          rightTieBreak = Some("rid"), direction = dir, toleranceUs = tol, bandUs = band)
      )
      plain == banded
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("banded carries a match across empty bands and keeps left-outer semantics") {
    val l = Seq(("p1", "a", 1000L), ("p2", "a", 5L), ("p3", "b", 1000L)).toDF("id", "k", "t")
    val r = Seq(("a", 3L, "early")).toDF("k", "t", "v")
    val out = AsOfJoin
      .banded(l, r, "k", "t", "t", Seq("v" -> "v"), "id", bandUs = 10L)
      .select("id", "v")
      .as[(String, Option[String])]
      .collect()
      .toMap
    out("p1") shouldBe Some("early") // ~100 empty bands between build and probe
    out("p2") shouldBe Some("early") // same-band match
    out("p3") shouldBe None // no build for key b
  }

  test("banded fails fast on a real time equal to the internal null sentinel") {
    // Long.MinValue/2 is banded's internal null stand-in; a genuine
    // input at that instant used to be conflated with null (silently
    // diverging from apply) — now the normalization raises instead.
    val sentinel = Long.MinValue / 2
    val l = Seq(("p1", "a", sentinel), ("p2", "a", 10L)).toDF("id", "k", "t")
    val r = Seq(("a", 3L, "x")).toDF("k", "t", "v")
    val e = intercept[Throwable] {
      AsOfJoin.banded(l, r, "k", "t", "t", Seq("v" -> "v"), "id", bandUs = 10L).collect()
    }
    val messages = Iterator
      .iterate(e)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    messages should include("null sentinel")
    // genuinely-null times still band fine (placed at -infinity, as in apply)
    val withNull = Seq(("p1", "a", Some(10L)), ("p2", "a", None: Option[Long])).toDF("id", "k", "t")
    AsOfJoin
      .banded(withNull, r, "k", "t", "t", Seq("v" -> "v"), "id", bandUs = 10L)
      .count() shouldBe 2L
  }
}
