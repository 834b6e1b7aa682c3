package graft

import graft.SparkSpec

/** The kernel expressions double as SQL functions (SURVEY §7.3's
  * optional Catalyst tier): registered via SparkSessionExtensions for
  * new sessions or GraftFunctions.register for running ones.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("kernel functions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val row = spark
      .sql(
        """SELECT
          |  simhash16(split('alpha beta gamma', ' ')) AS sh,
          |  size(shingle_set(split('a b c d', ' '), 3)) AS n_shingles,
          |  size(minhash_sig(shingle_set(split('a b c d', ' '), 3), 8)) AS sig_len,
          |  size(winnow_fingerprints(split('a b c d e f g h', ' '), 3, 4)) AS n_fp
          |""".stripMargin
      )
      .as[(Int, Int, Int, Int)]
      .head()
    row._2 shouldBe 2 // "a b c", "b c d"
    row._3 shouldBe 8
    row._4 should be >= 1
    row._1 should (be >= 0 and be <= 65535)
  }

  test("round-2 kernel functions are SQL-callable too") {
    GraftFunctions.register(spark)
    val row = spark
      .sql(
        """SELECT
          |  size(lang_scores(split('the la der pum', ' '))) AS n_langs,
          |  lang_scores(split('the of and', ' '))[1] AS en_hits,
          |  rolling_hash(split('a b c', ' ')) AS rh,
          |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp
          |""".stripMargin
      )
      .as[(Int, Int, Long, Double)]
      .head()
    row._1 shouldBe 5 // de, en, es, fr, zh
    row._2 shouldBe 3 // "the", "of", "and" are all English indicators
    row._3 should be >= 0L
    row._4 shouldBe 11.0
  }

  test("space_saving_topk works as a SQL aggregate") {
    GraftFunctions.register(spark)
    Seq("a", "a", "b").toDF("x").createOrReplaceTempView("ss_in")
    val out = spark
      .sql("SELECT space_saving_topk(x, 2, 8) AS hh FROM ss_in")
      .selectExpr("hh[0].item", "hh[0].cnt")
      .as[(String, Long)]
      .head()
    out shouldBe (("a", 2L))
  }

  test("SQL and Column forms agree") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql("SELECT simhash16(split('x y z', ' '))").as[Int].head()
    val viaCol = spark
      .range(1)
      .select(graft.expressions.TextHashExprs.simhash16(split(lit("x y z"), " ")))
      .as[Int]
      .head()
    viaSql shouldBe viaCol
  }
}
