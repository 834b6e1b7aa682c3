package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // a stream with known exact frequencies
  private val stream = (Seq.fill(100)("alpha") ++ Seq.fill(37)("beta") ++
    Seq.fill(5)("gamma") ++ (1 to 50).map(i => s"tail$i")).toDF("w")

  private val exact: Map[String, Long] =
    Map("alpha" -> 100L, "beta" -> 37L, "gamma" -> 5L) ++
      (1 to 50).map(i => s"tail$i" -> 1L)

  test("counters are bounded by d·w and total d·N") {
    val c = CountMin.counters(stream, col("w"), d = 4, w = 64)
    c.count() should be <= (4L * 64)
    c.agg(sum("c")).as[Long].head() shouldBe 4L * 192 // every item increments d buckets
    c.select("r").distinct().as[Int].collect().toSet shouldBe Set(0, 1, 2, 3)
  }

  test("estimates never underestimate and bound the overestimate") {
    val c = CountMin.counters(stream, col("w"), d = 4, w = 64)
    val probes = (exact.keys.toSeq :+ "never-seen").toDF("w")
    val est = CountMin
      .estimate(c, probes, col("w"), d = 4, w = 64)
      .as[(String, Long)]
      .collect()
      .toMap
    exact.foreach { case (k, v) =>
      withClue(k) {
        est(k) should be >= v // the CMS hard invariant
        est(k) should be <= v + 20L // ~e/w * N = (2.72/64)*192 ≈ 8, slack for collisions
      }
    }
    est("never-seen") should be <= 20L // absent items only see collision mass
  }

  test("a wide sketch is exact when buckets do not collide") {
    val tiny = Seq("x", "x", "y").toDF("w")
    val c = CountMin.counters(tiny, col("w"), d = 4, w = 4096)
    val est = CountMin
      .estimate(c, Seq("x", "y", "z").toDF("w"), col("w"), d = 4, w = 4096)
      .as[(String, Long)]
      .collect()
      .toMap
    est("x") shouldBe 2L
    est("y") shouldBe 1L
    est("z") shouldBe 0L
  }

  test("shard sketches merge into exactly the whole-stream sketch (CMS linearity)") {
    val rows = stream.as[String].collect()
    val (s1, s2, s3) = (rows.take(60), rows.slice(60, 130), rows.drop(130))
    val merged = CountMin.merge(Seq(s1, s2, s3).map { shard =>
      CountMin.counters(shard.toSeq.toDF("w"), col("w"), d = 4, w = 64)
    }, d = 4, w = 64)
    val whole = CountMin.counters(stream, col("w"), d = 4, w = 64)
    merged.as[(Int, Long, Long)].collect().toSet shouldBe
      whole.as[(Int, Long, Long)].collect().toSet
    // and estimates off the merged sketch keep the hard invariant
    val est = CountMin
      .estimate(merged, exact.keys.toSeq.toDF("w"), col("w"), d = 4, w = 64)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, v) => est(k) should be >= v }
  }

  test("merge fails loudly on a shard built with different (d, w) — never a silent bad union") {
    val good = CountMin.counters(stream, col("w"), d = 4, w = 64)
    // same schema, foreign parameters: only the coordinate range betrays it
    val foreign = CountMin.counters(stream, col("w"), d = 8, w = 1024)
    val e = intercept[Exception] {
      CountMin.merge(Seq(good, foreign), d = 4, w = 64).count()
    }
    // the raise_error surfaces wrapped in job-failure layers — check the chain
    val msgs = Iterator
      .iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    msgs.toLowerCase should include("different (d, w)")
    // and a structurally wrong input is rejected before any job runs
    val notASketch = Seq((0, 1L)).toDF("r", "b")
    intercept[IllegalArgumentException] {
      CountMin.merge(Seq(good, notASketch), d = 4, w = 64)
    }.getMessage should include("counter table")
  }

  test("merge rejects a SMALLER-(d, w) shard at plan time via the metadata stamp") {
    val good = CountMin.counters(stream, col("w"), d = 4, w = 64)
    // every coordinate of a (2, 32) sketch is in range for (4, 64) —
    // the run-time range check alone would pass it silently
    val small = CountMin.counters(stream, col("w"), d = 2, w = 32)
    val e = intercept[IllegalArgumentException] {
      CountMin.merge(Seq(good, small), d = 4, w = 64)
    }
    e.getMessage should include("different (d, w)")
    e.getMessage should include("d=2, w=32")
  }

  test("the (d, w) stamp survives a parquet round-trip (sketches-move workflow)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    CountMin.counters(stream, col("w"), d = 4, w = 64).write.mode("overwrite").parquet(dir)
    val loaded = spark.read.parquet(dir)
    // wrong declared identity → plan-time rejection straight off disk
    intercept[IllegalArgumentException] {
      CountMin.merge(Seq(loaded), d = 8, w = 64)
    }.getMessage should include("different (d, w)")
    // right identity → merges, and re-merging the MERGED sketch works
    // too (merge re-stamps its output)
    val m = CountMin.merge(Seq(loaded), d = 4, w = 64)
    CountMin.merge(Seq(m, loaded), d = 4, w = 64).count() should be > 0L
    // an UNSTAMPED table falls back to the run-time range check:
    // smaller params pass (documented blind spot), larger fail
    val stripped = loaded.select(col("r"), col("b"), (col("c") + lit(0L)).as("c"))
    stripped.schema("c").metadata.contains("graft.cms.d") shouldBe false
    val big = CountMin.counters(stream, col("w"), d = 8, w = 1024)
      .select(col("r"), col("b"), (col("c") + lit(0L)).as("c"))
    val e = intercept[Exception] {
      CountMin.merge(Seq(stripped, big), d = 4, w = 64).count()
    }
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
      .toLowerCase should include("different (d, w)")
  }
}
