package graft.rules

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.rules.CorpusRules.C4FilterRule

class C4FilterRuleSpec extends SparkSpec {
  import spark.implicits._

  private val good = (1 to 6).map(i => s"this is sentence number $i.").mkString("\n")
  private val mixed = good + "\nno punct trailing line here\na short sentence."
  private val lorem = good + "\nlorem ipsum dolor sit amet."
  private val short3 = (1 to 3).map(i => s"only sentence number $i.").mkString("\n")

  private val corpus = Seq(
    (0L, good), (1L, mixed), (2L, lorem), (3L, short3)
  ).toDF("doc_id", "text")

  test("keeps clean pages, drops lorem/short pages, and CLEANS surviving text") {
    val out = C4FilterRule(corpus)
    val kept = out.select("doc_id").as[Long].collect().toSet
    kept shouldBe Set(0L, 1L)
    // C4 is a transform: the unkeepable lines are gone from survivors
    val t1 = out.filter(col("doc_id") === 1L).select("text").as[String].head()
    t1 shouldBe good + "\na short sentence." // the punct-less line was removed
    // survivors carry audit metrics
    out.columns should contain allOf ("n_sentences", "has_lorem", "cleaned_len")
  }

  test("minSentences conf lowers the sentence floor") {
    spark.conf.set("spark.graft.c4.minSentences", "3")
    try {
      val kept = C4FilterRule(corpus).select("doc_id").as[Long].collect().toSet
      kept should contain(3L) // the 3-sentence page passes at floor 3
      kept should not contain 2L // lorem still rejected
    } finally spark.conf.unset("spark.graft.c4.minSentences")
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
