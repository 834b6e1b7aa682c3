package graft.expressions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

class SpaceSavingAggSpec extends SparkSpec {
  import spark.implicits._

  private def exactTopK(items: Seq[String], k: Int): Seq[(String, Long)] =
    items
      .groupBy(identity)
      .map { case (i, xs) => (i, xs.size.toLong) }
      .toSeq
      .sortBy { case (i, c) => (-c, i) }
      .take(k)

  test("exact when capacity exceeds the distinct count (any partitioning)") {
    val items = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++ Seq.fill(5)("d")
    for (parts <- Seq(1, 7)) {
      val df = items.toDF("item").repartition(parts)
      val out = df
        .agg(SpaceSavingAgg.topk(col("item"), 3, 16).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select("h.item", "h.cnt", "h.max_err")
        .as[(String, Long, Long)]
        .collect()
        .toSeq
      out.map(t => (t._1, t._2)) shouldBe exactTopK(items, 3)
      out.foreach(_._3 shouldBe 0L) // no evictions → exact
    }
  }

  test("buffer guarantee under arbitrary partitioned merges: est >= true >= est - max_err (property)") {
    // Pure-buffer property (no Spark jobs): stream split into random
    // partitions, one buffer each, merged pairwise — the exact shape
    // partial aggregation produces.
    val skewGen: Gen[List[String]] =
      Gen.listOfN(400, Gen.frequency(8 -> Gen.const("hot"), 3 -> Gen.const("warm"), 2 -> Gen.oneOf((1 to 40).map("t" + _))))
    val prop = forAll(skewGen, Gen.choose(1, 6)) { (items, nParts) =>
      val trueCounts = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
      val parts = items.zipWithIndex.groupBy(_._2 % nParts).values.map(_.map(_._1))
      val buffers = parts.map { p =>
        val b = new SpaceSavingBuffer(8)
        p.foreach(b.add(_))
        b
      }
      val merged = buffers.reduceLeft { (a, b) => a.merge(b); a }
      val bounds = merged.counts.forall { case (item, (est, err)) =>
        val t = trueCounts.getOrElse(item, 0L)
        est >= t && t >= est - err
      }
      // N/capacity guarantee: the heavy hitter (freq ~8/13 >> 1/8) survives.
      bounds && merged.counts.contains("hot")
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("spark partial/final merge path keeps the bounds on skewed data") {
    val items = Seq.fill(200)("hot") ++ Seq.fill(60)("warm") ++ (1 to 40).flatMap(i => Seq.fill(3)("t" + i))
    val trueCounts = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    val out = items
      .toDF("item")
      .repartition(5)
      .agg(SpaceSavingAgg.topk(col("item"), 8, 8).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select("h.item", "h.cnt", "h.max_err")
      .as[(String, Long, Long)]
      .collect()
    out.foreach { case (item, est, err) =>
      val t = trueCounts.getOrElse(item, 0L)
      est should be >= t
      t should be >= (est - err)
    }
    out.map(_._1) should contain("hot")
  }

  test("grouped aggregation: one summary per group") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z")).toDF("g", "item")
    val out = df
      .groupBy("g")
      .agg(SpaceSavingAgg.topk(col("item"), 1, 4).as("hh"))
      .select(col("g"), explode(col("hh")).as("h"))
      .select("g", "h.item", "h.cnt")
      .as[(String, String, Long)]
      .collect()
      .toSet
    out shouldBe Set(("g1", "x", 2L), ("g2", "z", 1L))
  }

  test("items beyond 64 KB survive partial-buffer serialization (no writeUTF cap)") {
    // The aggregate is exposed over arbitrary string columns; a >64 KB
    // item must round-trip the map-side partial serialization, where
    // writeUTF would throw UTFDataFormatException.
    val big = "x" * 100000
    val items = Seq.fill(6)(big) ++ Seq("small")
    val out = items.toDF("item")
      .repartition(3)
      .agg(SpaceSavingAgg.topk(col("item"), 2, 8).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select("h.item", "h.cnt")
      .as[(String, Long)]
      .collect()
      .toMap
    out(big) shouldBe 6L
    out("small") shouldBe 1L
  }
}
