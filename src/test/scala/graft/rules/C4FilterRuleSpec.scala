package graft.rules

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.rules.CorpusRules.C4FilterRule

class C4FilterRuleSpec extends SparkSpec {
  import spark.implicits._

  private val good = (1 to 6).map(i => s"this is sentence number $i.").mkString("\n")
  private val mixed = good + "\nno punct trailing line here\na shorter sentence right here."
  private val lorem = good + "\nlorem ipsum dolor sit amet."
  private val short2 = (1 to 2).map(i => s"only one sentence number $i.").mkString("\n")

  private val corpus = Seq(
    (0L, good), (1L, mixed), (2L, lorem), (3L, short2)
  ).toDF("doc_id", "text")

  test("keeps clean pages, drops lorem/short pages, and CLEANS surviving text") {
    val out = C4FilterRule(corpus)
    val kept = out.select("doc_id").as[Long].collect().toSet
    kept shouldBe Set(0L, 1L) // short2 is under the paper's 3-sentence floor
    // C4 is a transform: the unkeepable lines are gone from survivors
    val t1 = out.filter(col("doc_id") === 1L).select("text").as[String].head()
    t1 shouldBe good + "\na shorter sentence right here." // the punct-less line was removed
    // survivors carry audit metrics
    out.columns should contain allOf ("n_sentences", "has_lorem", "cleaned_len")
  }

  test("minSentences conf moves the sentence floor") {
    spark.conf.set("spark.graft.c4.minSentences", "2")
    try {
      val kept = C4FilterRule(corpus).select("doc_id").as[Long].collect().toSet
      kept should contain(3L) // the 2-sentence page passes at floor 2
      kept should not contain 2L // lorem still rejected
    } finally spark.conf.unset("spark.graft.c4.minSentences")
  }

  test("configured blocklist (inline and file fixture) rejects end-to-end") {
    // "jackpot" is absent from the placeholder default, so the page
    // survives the rule as shipped...
    val spam = good + "\nclaim your jackpot prize winnings today."
    val df = Seq((0L, good), (9L, spam)).toDF("doc_id", "text")
    C4FilterRule(df).select("doc_id").as[Long].collect().toSet shouldBe Set(0L, 9L)
    // ...an inline CSV list rejects it...
    spark.conf.set("spark.graft.c4.blocklist", "jackpot,sweepstakes")
    try {
      C4FilterRule(df).select("doc_id").as[Long].collect().toSet shouldBe Set(0L)
    } finally spark.conf.unset("spark.graft.c4.blocklist")
    // ...and so does the realistic fixture list shipped as a resource.
    val path = new java.io.File(getClass.getResource("/c4_blocklist.txt").toURI).getAbsolutePath
    spark.conf.set("spark.graft.c4.blocklist", s"file:$path")
    try {
      CorpusRules.C4FilterRule.blocklist(df).size should be >= 30
      C4FilterRule(df).select("doc_id").as[Long].collect().toSet shouldBe Set(0L)
    } finally spark.conf.unset("spark.graft.c4.blocklist")
  }

  test("clashing input columns are refused loudly") {
    val bad = corpus.withColumn("n_sentences", lit(1))
    val e = intercept[IllegalArgumentException](C4FilterRule(bad))
    e.getMessage should include("n_sentences")
  }

  test("registered in the corpus rule catalog") {
    CorpusRules.all.map(_.name) should contain("c4Filter")
  }
}
