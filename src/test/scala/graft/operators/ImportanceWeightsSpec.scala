package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImportanceWeightsSpec extends SparkSpec {
  import spark.implicits._

  test("grams are non-distinct unigrams + word bigrams") {
    val g = Seq(("a b a"))
      .toDF("text")
      .select(ImportanceWeights.grams(col("text")).as("g"))
      .as[Seq[String]]
      .head()
    g shouldBe Seq("a", "b", "a", "a b", "b a")
  }

  test("single-token text has no bigrams; tokenization lowercases and trims") {
    val g = Seq(("  Word  "))
      .toDF("text")
      .select(ImportanceWeights.grams(col("text")).as("g"))
      .as[Seq[String]]
      .head()
    g shouldBe Seq("word")
  }

  test("bucket scores replay the HALF_UP fixed-point likelihood ratio exactly") {
    // target = doc 1 ("x x"), raw = both docs. Grams: doc1 -> x, x, "x x";
    // doc2 -> y, y, "y y". All grams of one doc may share or split buckets;
    // recompute the expected integer from the OBSERVED bucket counts.
    val docs = Seq((1L, "x x", true), (2L, "y y", false)).toDF("id", "text", "t")
    val scores = ImportanceWeights
      .bucketScores(docs, col("text"), col("t"), buckets = 256)
      .as[(String, Long)]
      .collect()
      .toMap
    // observed bucket counts straight from the definition
    val gramOf = Map("x" -> 2L, "x x" -> 1L, "y" -> 2L, "y y" -> 1L)
    val isT = Map("x" -> true, "x x" -> true, "y" -> false, "y y" -> false)
    def b(s: String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
    }
    val byBucket = gramOf.groupBy { case (g, _) => b(g) }
    val totT = 3L
    val totR = 6L
    scores.keySet shouldBe byBucket.keySet
    for ((bk, gs) <- byBucket) {
      val ct = gs.collect { case (g, n) if isT(g) => n }.sum
      val cr = gs.values.sum
      val num = BigInt(2) * BigInt(ct + 1) * BigInt(totR + 256) * BigInt(1000000) +
        BigInt(cr + 1) * BigInt(totT + 256)
      val den = BigInt(2) * BigInt(cr + 1) * BigInt(totT + 256)
      scores(bk) shouldBe (num / den).toLong
    }
  }

  test("document weights are exact integer sums and rank target-like docs first") {
    // Target vocabulary {alpha, beta}; off-domain {gamma, delta}. A raw
    // doc written in the target vocabulary must outscore one that isn't.
    val docs = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta beta alpha", true),
      (3L, "alpha beta alpha alpha", false), // target-like
      (4L, "gamma delta gamma delta", false) // off-domain
    ).toDF("id", "text", "t")
    val scores = ImportanceWeights.bucketScores(docs, col("text"), col("t"), buckets = 256)
    val w = ImportanceWeights
      .score(docs, col("id"), col("text"), scores)
      .select(col("id"), col("w_units").cast("string"))
      .as[(Long, String)]
      .collect()
      .toMap
      .map { case (k, v) => k -> BigInt(v) }
    w(3L) should be > w(4L)
    // per-doc weight = sum(cnt * units) exactly
    val su = scores.as[(String, Long)].collect().toMap
    def b(s: String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
    }
    val doc4Grams = Seq("gamma", "delta", "gamma", "delta", "gamma delta", "delta gamma", "gamma delta")
    val expected = doc4Grams.groupBy(b).map { case (bk, gs) => BigInt(gs.size) * BigInt(su(bk)) }.sum
    w(4L) shouldBe expected
  }

  test("fused fitScore is output-identical to the composed bucketScores -> score form") {
    val docs = (1L to 30L)
      .map(i => (i, s"alpha tok$i beta shared words here tok${i % 4}", i % 3 == 0))
      .toDF("id", "text", "t")
    val composed = ImportanceWeights
      .score(
        docs,
        col("id"),
        col("text"),
        ImportanceWeights.bucketScores(docs, col("text"), col("t"), buckets = 256))
      .select(col("id"), col("n_grams"), col("w_units").cast("string"))
      .as[(Long, Long, String)]
      .collect()
      .toSet
    val fused = ImportanceWeights
      .fitScore(docs, col("id"), col("text"), col("t"), buckets = 256)
      .select(col("id"), col("n_grams"), col("w_units").cast("string"))
      .as[(Long, Long, String)]
      .collect()
      .toSet
    fused shouldBe composed
  }

  test("weights are partitioning-invariant (integer sums, no float order dependence)") {
    val docs = (1L to 40L)
      .map(i => (i, s"tok$i common word ${"pad " * (i % 7).toInt}trail", i % 5 == 0))
      .toDF("id", "text", "t")
    val scores = ImportanceWeights.bucketScores(docs, col("text"), col("t"), buckets = 256)
    def run(parts: Int) =
      ImportanceWeights
        .score(docs.repartition(parts), col("id"), col("text"), scores)
        .select(col("id"), col("w_units").cast("string"))
        .as[(Long, String)]
        .collect()
        .toMap
    run(1) shouldBe run(7)
  }
}
