package graft.queries

import graft.SparkSpec

/** Waterfill invariants of the UniMax allocator (q106) that the
  * hash-gate alone doesn't articulate: budget conservation, the cap
  * constraint, the prefix-monotone waterline, and uniformity of the
  * uncapped shares.
  */
class UnimaxSpec extends SparkSpec {

  private lazy val rows = Documents
    .q106UnimaxAlloc(spark, "/root/testdata/sf0.001")
    .collect()
    .map(r =>
      (r.getAs[Long]("n_tokens"), r.getAs[Int]("rank"), r.getAs[Boolean]("capped"),
        r.getAs[Double]("alloc")))
    .sortBy(_._2)

  test("allocations exhaust the budget exactly (uncapped strata split the remainder)") {
    val total = rows.map(_._1).sum
    val budget = total * 6 / 10
    rows.map(_._4).sum shouldBe budget.toDouble +- 1e-6
  }

  test("no stratum exceeds its epoch cap") {
    rows.foreach { case (n, _, capped, alloc) =>
      if (capped) alloc shouldBe n.toDouble // capped: the whole cap, no more
      else alloc should be <= n.toDouble // uncapped: uniform share below the cap
    }
  }

  test("the capped set is a prefix of the cap-ascending order") {
    val flags = rows.map(_._3)
    flags.dropWhile(identity).exists(identity) shouldBe false
  }

  test("every uncapped stratum gets the same uniform share, above every capped cap") {
    val (capped, uncapped) = rows.partition(_._3)
    uncapped.map(_._4).distinct.length shouldBe 1
    if (capped.nonEmpty && uncapped.nonEmpty)
      uncapped.head._4 should be > capped.map(_._1).max.toDouble
  }

  // ---- q123 temperature-mix invariants ---------------------------------------

  private lazy val tRows = Documents
    .q123TemperatureMix(spark, "/root/testdata/sf0.001")
    .collect()
    .map(r =>
      (r.getAs[Long]("n_tokens"), r.getAs[Double]("weight"), r.getAs[Long]("alloc_tokens")))

  test("temperature allocations sum to the budget EXACTLY (largest remainder)") {
    tRows.map(_._3).sum shouldBe 100000L
  }

  test("temperature weights are a probability vector proportional to sqrt(n)") {
    tRows.map(_._2).sum shouldBe 1.0 +- 1e-9
    // ratio check on two strata: w_i/w_j == sqrt(n_i)/sqrt(n_j)
    val a = tRows.head; val b = tRows.last
    (a._2 / b._2) shouldBe (math.sqrt(a._1.toDouble) / math.sqrt(b._1.toDouble)) +- 1e-9
  }

  test("temperature flattens the mix: smallest stratum gains share, largest loses") {
    val total = tRows.map(_._1).sum.toDouble
    val min = tRows.minBy(_._1); val max = tRows.maxBy(_._1)
    (min._2) should be > (min._1 / total) // up-weighted vs raw proportion
    (max._2) should be < (max._1 / total) // down-weighted
  }
}
