package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def langOf(text: String): String =
    Seq(text).toDF("text").select(TextAnalysis.langId(Dedup.tokens(col("text")))).as[String].head()

  test("language-ID picks the language with most indicator hits") {
    langOf("the cat is in the house and that is fine") shouldBe "en"
    langOf("der hund und die katze ist nicht da") shouldBe "de"
    langOf("le chat et la maison est une belle chose que") shouldBe "fr"
    langOf("el perro y la casa es un lugar que") shouldBe "es"
  }

  test("no indicators at all yields und") {
    langOf("zzz qqq xxx") shouldBe "und"
  }

  test("canonical fingerprint ignores whitespace and case differences") {
    val df = Seq("Hello   World", "hello world", "hello  WORLD ", "other text").toDF("text")
    val fps = df.select(TextAnalysis.canonicalFingerprint(col("text"))).as[String].collect()
    fps(0) shouldBe fps(1)
    fps(1) shouldBe fps(2)
    fps(3) should not be fps(0)
  }

  test("rolling hash is order-sensitive, unlike a bag-of-words hash") {
    def rh(s: String): Long =
      Seq(s).toDF("text").select(TextAnalysis.rollingHash(Dedup.tokens(col("text")))).as[Long].head()
    rh("alpha beta gamma") should not be rh("gamma beta alpha")
    rh("alpha beta gamma") shouldBe rh("alpha beta gamma")
    rh("alpha beta gamma") should be < 1073741789L
    rh("alpha beta gamma") should be >= 0L
  }

  test("BPE-ish token count splits words and punctuation runs") {
    def n(s: String): Int =
      Seq(s).toDF("text").select(TextAnalysis.tokenCountBpeIsh(col("text"))).as[Int].head()
    n("hello world") shouldBe 2
    n("hello, world!") shouldBe 4 // hello / , / world / !
    n("a1b2") shouldBe 1 // alnum run stays one token
    // Non-Latin scripts are word characters too — an ASCII-only class
    // would count any of these documents as ~1 token.
    n("привет мир") shouldBe 2 // Cyrillic words
    n("مرحبا بالعالم") shouldBe 2 // Arabic words
    n("你好世界") shouldBe 4 // Han: one token per ideograph
    n("hello 世界") shouldBe 3 // mixed Latin + Han
  }

  test("maxElementCount finds the most frequent array element's count") {
    def mc(xs: Seq[String]): Long =
      Seq(Tuple1(xs)).toDF("a").select(TextAnalysis.maxElementCount(col("a"))).as[Long].head()
    mc(Seq("x", "y", "x", "z", "x")) shouldBe 3L
    mc(Seq("x")) shouldBe 1L
    mc(Seq.empty) shouldBe 0L
    // runs must not bridge across distinct values after sorting
    mc(Seq("a", "b", "a", "b")) shouldBe 2L
  }

  test("gopher metrics and keep verdict on hand-computed documents") {
    val good = (Seq("the", "of") ++ (1 to 60).map(i => s"word$i")).mkString(" ")
    val short = "the of tiny doc" // word count < 50
    val nostop = (1 to 60).map(i => s"word$i").mkString(" ") // no stopwords
    val repeated = (Seq("the", "of") ++ Seq.fill(30)(Seq("spam", "ham")).flatten).mkString(" ")
    val rows = Seq(good, short, nostop, repeated).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val toks = split(trim(lower(col("text"))), "\\s+")
    val out = rows
      .select(col("doc_id") +: TextAnalysis.gopherMetrics(toks): _*)
      .withColumn("keep", TextAnalysis.gopherKeep())
      .orderBy("doc_id")
      .collect()
    out(0).getAs[Boolean]("keep") shouldBe true
    out(0).getAs[Int]("n_words") shouldBe 62
    out(1).getAs[Boolean]("keep") shouldBe false // too short
    out(2).getAs[Boolean]("keep") shouldBe false // no stopwords
    out(3).getAs[Boolean]("keep") shouldBe false // top bigram over the 18% cap
    // "spam ham" occurs 30 times of 62 tokens -> frac = 60/62
    out(3).getAs[Double]("top_bigram_frac") shouldBe (60.0 / 62) +- 1e-12
  }

  test("gopher symbol ratio and 3/4-gram caps on hand-computed documents") {
    val hashy = (Seq("the", "of") ++ (1 to 50).map(i => s"word$i") ++ (1 to 8).map(_ => "##")).mkString(" ")
    val dots = (Seq("the", "of") ++ (1 to 50).map(i => s"word$i")).mkString(" ") + " done..."
    val tripled = (Seq("the", "of") ++ Seq.fill(20)(Seq("a1", "b2", "c3")).flatten).mkString(" ")
    val rows = Seq(hashy, dots, tripled).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = rows
      .select(col("doc_id") +: TextAnalysis.gopherMetrics(split(trim(lower(col("text"))), "\\s+")): _*)
      .withColumn("keep", TextAnalysis.gopherKeep())
      .orderBy("doc_id")
      .collect()
    // 16 '#' chars over 60 words -> 0.2667 > 0.1 cap
    out(0).getAs[Double]("symbol_word_ratio") shouldBe (16.0 / 60) +- 1e-12
    out(0).getAs[Boolean]("keep") shouldBe false
    // one '...' run over 53 words -> well under the cap
    out(1).getAs[Double]("symbol_word_ratio") shouldBe (1.0 / 53) +- 1e-12
    out(1).getAs[Boolean]("keep") shouldBe true
    // "a1 b2 c3" repeats 20 times in 62 tokens: trigram count 20,
    // frac 60/62 — caught by the 3-gram cap (bigram "a1 b2" also 20
    // of 61 bigram positions but the trigram signal is the stronger)
    out(2).getAs[Double]("top_3gram_frac") shouldBe (60.0 / 62) +- 1e-12
    out(2).getAs[Boolean]("keep") shouldBe false
  }

  test("duplicate-line fraction counts every copy of a repeated line") {
    val dupheavy = Seq("alpha", "beta", "alpha", "gamma", "alpha", "beta").mkString("\n")
    val clean = Seq("one", "two", "three").mkString("\n")
    val rows = Seq(dupheavy, clean).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = rows
      .select(col("doc_id") +: TextAnalysis.gopherLineMetrics(col("text")): _*)
      .withColumn("keep", TextAnalysis.gopherLineKeep)
      .orderBy("doc_id")
      .collect()
    // alpha×3 + beta×2 = 5 duplicate lines of 6 (gamma is the singleton)
    out(0).getAs[Double]("dup_line_frac") shouldBe (5.0 / 6) +- 1e-12
    out(0).getAs[Boolean]("keep") shouldBe false
    out(1).getAs[Double]("dup_line_frac") shouldBe 0.0
    out(1).getAs[Boolean]("keep") shouldBe true
  }

  test("c4 metrics and keep on a hand-computed page") {
    val good = (1 to 6).map(i => s"this is sentence number $i.").mkString("\n")
    val noPunct = "a line with no terminal punctuation\nanother one here"
    val shortLines = "ok.\nno.\nyes."
    val jsPage = (1 to 6).map(i => s"sentence $i has javascript inside.").mkString("\n")
    val lorem = good + "\nlorem ipsum dolor sit amet."
    val brace = good + "\nif (x) { return; }"
    val blocked = good + "\nwin the casino jackpot now!"
    val rows = Seq(good, noPunct, shortLines, jsPage, lorem, brace, blocked).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = rows
      .select(col("doc_id") +: TextAnalysis.c4PageMetrics(col("text")): _*)
      .withColumn("keep", TextAnalysis.c4Keep())
      .orderBy("doc_id")
      .collect()
    out(0).getAs[Int]("n_kept_lines") shouldBe 6
    out(0).getAs[Int]("n_sentences") shouldBe 6
    out(0).getAs[Boolean]("keep") shouldBe true
    out(1).getAs[Int]("n_kept_lines") shouldBe 0 // no terminal punctuation
    out(1).getAs[Boolean]("keep") shouldBe false
    out(2).getAs[Int]("n_kept_lines") shouldBe 0 // all lines under 5 words
    out(3).getAs[Int]("n_kept_lines") shouldBe 0 // javascript lines dropped
    out(4).getAs[Boolean]("has_lorem") shouldBe true
    out(4).getAs[Boolean]("keep") shouldBe false
    out(5).getAs[Boolean]("has_brace") shouldBe true
    out(5).getAs[Boolean]("keep") shouldBe false
    out(6).getAs[Boolean]("has_blockword") shouldBe true
    out(6).getAs[Boolean]("keep") shouldBe false
  }

  test("gopher line metrics and keep on multi-line documents") {
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    val prose = "a normal paragraph\nand another one\n- one bullet is fine"
    val trailing = "first…\nsecond...\nthird stays"
    val single = "no newlines here at all"
    val rows = Seq(bullets, prose, trailing, single).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = rows
      .select(col("doc_id") +: TextAnalysis.gopherLineMetrics(col("text")): _*)
      .withColumn("keep", TextAnalysis.gopherLineKeep)
      .orderBy("doc_id")
      .collect()
    out(0).getAs[Double]("bullet_line_frac") shouldBe 1.0
    out(0).getAs[Boolean]("keep") shouldBe false // all-bullet doc dropped
    out(1).getAs[Double]("bullet_line_frac") shouldBe (1.0 / 3) +- 1e-12
    out(1).getAs[Boolean]("keep") shouldBe true
    out(2).getAs[Double]("ellipsis_line_frac") shouldBe (2.0 / 3) +- 1e-12
    out(2).getAs[Boolean]("keep") shouldBe false // ellipsis-heavy dropped
    out(3).getAs[Int]("n_lines") shouldBe 1 // single-line corpus degenerates sanely
    out(3).getAs[Boolean]("keep") shouldBe true
  }
}
