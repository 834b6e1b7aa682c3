package graft.rules

import graft.SparkSpec
import graft.rules.CorpusRules.GopherFilterRule

/** The ingest-time Gopher rule bundle: the filter must agree with the
  * q103 metric semantics, honor the minWords conf, surface metric
  * columns on survivors, and refuse clashing input columns.
  */
class GopherFilterRuleSpec extends SparkSpec {
  import spark.implicits._

  private val good = (Seq("the", "of") ++ (1 to 60).map(i => s"word$i")).mkString(" ")
  // 40 words: under the default 50-word floor, but passes every other
  // rule — including the n-gram repetition caps, which any very short
  // doc fails intrinsically (top-4-gram frac = 4/n needs n ≥ 29)
  private val short = (Seq("the", "of") ++ (1 to 38).map(i => s"word$i")).mkString(" ")
  private val nostop = (1 to 60).map(i => s"word$i").mkString(" ")
  private val repeated = (Seq("the", "of") ++ Seq.fill(30)(Seq("spam", "ham")).flatten).mkString(" ")

  private def corpus =
    Seq(good, short, nostop, repeated).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("keeps only documents passing every Gopher rule") {
    val out = GopherFilterRule(corpus)
    out.select("doc_id").as[Long].collect().toSeq shouldBe Seq(0L)
  }

  test("survivors carry the metric columns for threshold audits") {
    val row = GopherFilterRule(corpus).collect().head
    row.getAs[Int]("n_words") shouldBe 62
    row.getAs[Int]("n_stop_distinct") shouldBe 2
    row.getAs[Double]("alpha_ratio") shouldBe 1.0
  }

  test("minWords conf lowers the word-count floor") {
    spark.conf.set("spark.graft.gopher.minWords", "3")
    try {
      val kept = GopherFilterRule(corpus).select("doc_id").as[Long].collect().toSet
      kept should contain(1L) // the 40-word doc passes at floor 3
      kept should not contain 2L // still fails the stopword rule
    } finally spark.conf.unset("spark.graft.gopher.minWords")
  }

  test("clashing input columns are refused loudly") {
    val clashing = corpus.withColumn("n_words", org.apache.spark.sql.functions.lit(1))
    val e = intercept[IllegalArgumentException](GopherFilterRule(clashing))
    e.getMessage should include("n_words")
  }

  test("registered in the corpus rule catalog") {
    CorpusRules.all.map(_.name) should contain("gopherFilter")
  }
}
