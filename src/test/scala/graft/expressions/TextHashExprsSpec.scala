package graft.expressions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.SparkSpec
import graft.operators.Dedup

/** The codegen'd kernels must compute EXACTLY the declarative values —
  * the oracle SQL was written against the declarative forms, so any
  * divergence silently breaks the correctness gate.
  */
class TextHashExprsSpec extends SparkSpec {
  import spark.implicits._

  private val wordGen: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val docGen: Gen[String] = Gen.listOf(wordGen).map(_.mkString(" "))

  test("kernel shingleSet == declarative shingles (property)") {
    val docsGen = Gen.listOfN(20, docGen)
    val prop = forAll(docsGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val both = df.select(
        TextHashExprs.shingleSet(Dedup.tokens(col("text")), 3).as("fast"),
        Dedup.shingles(Dedup.tokens(col("text")), 3).as("slow")
      )
      both.as[(Seq[String], Seq[String])].collect().forall { case (f, s) => f == s }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("kernel minhashSig == declarative baseHashes∘minhashSignature (property)") {
    val docsGen = Gen.listOfN(10, docGen.suchThat(_.split("\\s+").length >= 3))
    val prop = forAll(docsGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val staged = df
        .select(Dedup.shingles(Dedup.tokens(col("text")), 3).as("sh"))
        .filter(org.apache.spark.sql.functions.size(col("sh")) > 0)
      val both = staged
        .select(TextHashExprs.minhashSig(col("sh"), 8).as("fast"), Dedup.baseHashes(col("sh")).as("xs"))
        .select(col("fast"), Dedup.minhashSignature(col("xs"), 8).as("slow"))
      both.as[(Seq[Long], Seq[Long])].collect().forall { case (f, s) => f == s }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("kernel simhash16 == declarative simhash16 (property)") {
    val docsGen = Gen.listOfN(20, docGen)
    val prop = forAll(docsGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val both = df.select(
        TextHashExprs.simhash16(Dedup.tokens(col("text"))).as("fast"),
        Dedup.simhash16(Dedup.tokens(col("text"))).as("slow")
      )
      both.as[(Int, Int)].collect().forall { case (f, s) => f == s }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("simhash64: identical token streams agree, near-dups are close, disjoint docs differ") {
    val a = "the quick brown fox jumps over one lazy dog while two cats watch"
    val df = Seq(
      (1L, a),
      (2L, a), // identical
      (3L, a + " extra"), // near-dup: few bit flips
      (4L, "totally different material about spark shuffles and executors at scale")
    ).toDF("id", "text")
    val sims = df
      .select(col("id"), TextHashExprs.simhash64(Dedup.tokens(col("text"))).as("s"))
      .as[(Long, Long)]
      .collect()
      .toMap
    sims(1L) shouldBe sims(2L)
    java.lang.Long.bitCount(sims(1L) ^ sims(3L)) should be <= 16 // near-dup: small Hamming distance
    java.lang.Long.bitCount(sims(1L) ^ sims(4L)) should be > 16 // unrelated: far apart
    // SQL registration round-trips
    graft.GraftFunctions.register(spark)
    df.createOrReplaceTempView("sh64docs")
    spark
      .sql("SELECT simhash64(split(trim(lower(text)), '\\\\s+')) FROM sh64docs WHERE id = 1")
      .as[Long]
      .head() shouldBe sims(1L)
  }

  test("kernel winnow == declarative winnowFingerprints (property)") {
    val docsGen = Gen.listOfN(15, docGen)
    val prop = forAll(docsGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val both = df.select(
        TextHashExprs.winnow(Dedup.tokens(col("text")), 3, 4).as("fast"),
        Dedup.winnowFingerprints(Dedup.tokens(col("text")), 3, 4).as("slow")
      )
      both.as[(Seq[String], Seq[String])].collect().forall { case (f, s) => f == s }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("kernel langScores == declarative indicatorHits per language (property)") {
    import graft.operators.TextAnalysis
    val langWordGen = Gen.oneOf(TextAnalysis.indicators.flatMap(_._2))
    val mixedDocGen = Gen.listOf(Gen.oneOf(wordGen, langWordGen)).map(_.mkString(" "))
    val docsGen = Gen.listOfN(20, mixedDocGen)
    val prop = forAll(docsGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val slowCols = TextAnalysis.indicators.map { case (lang, words) =>
        TextAnalysis.indicatorHits(Dedup.tokens(col("text")), words)
      }
      val both = df.select(
        TextHashExprs.langScores(Dedup.tokens(col("text"))).as("fast"),
        array(slowCols: _*).as("slow")
      )
      both.as[(Seq[Int], Seq[Int])].collect().forall { case (f, s) => f == s }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("kernel rollingHash == declarative rollingHash (property)") {
    import graft.operators.TextAnalysis
    val docsGen = Gen.listOfN(15, docGen)
    val prop = forAll(docsGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val both = df.select(
        TextHashExprs.rollingHash(Dedup.tokens(col("text"))).as("fast"),
        TextAnalysis.rollingHash(Dedup.tokens(col("text"))).as("slow")
      )
      both.as[(Long, Long)].collect().forall { case (f, s) => f == s }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("md5Slice60 == conv(substr(md5, o+1, 15), 16, 10) at both bloom offsets (property)") {
    val prop = forAll(Gen.listOfN(30, wordGen)) { words =>
      val df = words.toDF("s")
      Seq(0, 15).forall { o =>
        df.select(
            TextHashExprs.md5Slice60(col("s"), o).as("fast"),
            expr(s"CAST(conv(substr(md5(s), ${o + 1}, 15), 16, 10) AS BIGINT)").as("slow")
          )
          .as[(Long, Long)]
          .collect()
          .forall { case (f, s) => f == s }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("baseHash matches conv(substr(md5, 1, 15), 16, 10) % P") {
    val df = Seq("hello world", "x", "").toDF("s")
    val both = df.select(
      expr(s"conv(substr(md5(s), 1, 15), 16, 10) % ${HashKernels.P}").cast("long").as("sql"),
      udf((s: String) => HashKernels.baseHash(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
        .apply(col("s"))
        .as("kernel")
    )
    both.as[(Long, Long)].collect().foreach { case (a, b) => a shouldBe b }
  }

  test("minhashSig of an empty shingle array is null, not an NPE") {
    // The text column is non-null, so the child is non-nullable; the
    // kernel still yields null for empty input and downstream size()
    // must see SQL null (round-1 advice: codegen marked the slot
    // non-null while holding a Java null).
    val df = spark
      .range(3)
      .select(when(col("id") === 1, lit("a b c d")).otherwise(lit("")).as("text"))
    val out = df
      .select(TextHashExprs.minhashSig(TextHashExprs.shingleSet(Dedup.tokens(col("text")), 3), 8).as("sig"))
      .select(col("sig").isNull.as("is_null"), org.apache.spark.sql.functions.size(col("sig")).as("sz"))
      .as[(Boolean, Option[Int])]
      .collect()
    out.count(_._1) shouldBe 2
    out.flatMap(_._2) shouldBe Array(8)
  }

  test("kernels survive whole-stage codegen (plan contains no fallback)") {
    // spark.range keeps the projection non-foldable so a real codegen
    // stage is produced (a local Seq would constant-fold away).
    val df = spark
      .range(5)
      .select(col("id"), concat(lit("alpha beta gamma delta "), col("id").cast("string")).as("text"))
    val out = df.select(
      TextHashExprs.simhash16(Dedup.tokens(col("text"))).as("sh"),
      TextHashExprs.minhashSig(TextHashExprs.shingleSet(Dedup.tokens(col("text")), 3), 8).as("sig")
    )
    out.collect().length shouldBe 5
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = out.queryExecution.executedPlan.toString
    plan should include("*(1) Project")
  }
}
