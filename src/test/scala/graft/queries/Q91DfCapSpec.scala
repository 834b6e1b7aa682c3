package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q91 stop-signature cap: grams occurring in more than `maxDf`
  * documents must not act as blocking keys. Without the cap a
  * boilerplate 5-gram shared by B distinct texts emits B² candidate
  * rows before aggregation (dedupFirst staging collapses duplicate
  * TEXTS, not a gram shared across distinct texts) — the one plan
  * shape in the catalog that was quadratic in corpus size.
  */
class Q91DfCapSpec extends SparkSpec {

  /** B distinct near-identical texts: a 22-token boilerplate prefix
    * (every shared 5-gram has df = B) plus a unique final token
    * (its grams have df = 1 — valid but pairing nothing).
    */
  private def boilerCorpus(b: Int): String = {
    val dir = Files.createTempDirectory("q91cap").toString
    val boiler =
      "all rights reserved no part of this publication may be " +
        "reproduced distributed or transmitted in any form or by any means x"
    import spark.implicits._
    (0 until b)
      .map(i => (i.toLong, s"$boiler w$i", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def q91(dir: String) =
    graft.SparkEntry.queries("q91_fuzzy_editdist")(spark, dir)

  test("grams over the df cap are not blocking keys (default cap drops the hot gram)") {
    val dir = boilerCorpus(60) // boilerplate df = 60 > default cap 50
    try q91(dir).count() shouldBe 0L
    finally spark.conf.unset("spark.graft.q91.maxDf")
  }

  test("the same corpus under a raised cap yields every blocked pair, verified") {
    val dir = boilerCorpus(60)
    try {
      spark.conf.set("spark.graft.q91.maxDf", "100")
      val rows = q91(dir).collect()
      rows.length shouldBe 60 * 59 / 2 // near-identical: all pairs verify
      // n_shared counts only under-cap SHARED grams: the 18 boilerplate
      // 5-grams (df=60 <= 100); the suffix-touching grams are unique
      // per doc (df=1) and pair nothing
      all(rows.map(_.getAs[Long]("n_shared"))) shouldBe 18L
      all(rows.map(_.getAs[Int]("dist"))) should be <= 8
    } finally spark.conf.unset("spark.graft.q91.maxDf")
  }

  test("1k+ distinct texts sharing one gram stay bounded (the 100 TB hazard shape)") {
    // Without the cap this corpus generates ~C(1200,2) ≈ 719k candidate
    // rows from a single gram; with it the gram is dropped and the
    // query degenerates to the df<=cap (here: empty) candidate set.
    val dir = boilerCorpus(1200)
    q91(dir).count() shouldBe 0L
  }
}
