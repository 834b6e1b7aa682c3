package graft.rules

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.ImportanceWeights
import graft.rules.CorpusRules.ImportanceFilterRule

/** The ingest-time DSIR importance filter: the map-side fold must
  * reproduce the operator's explode+groupBy weights exactly, the
  * integer keep rule must hold, and the conf contracts must fail
  * loudly.
  */
class ImportanceFilterRuleSpec extends SparkSpec {
  import spark.implicits._

  // target vocabulary {alpha beta}; background {gamma delta}
  private val fitCorpus = Seq(
    (1L, "alpha beta alpha beta", true),
    (2L, "beta alpha beta alpha", true),
    (3L, "gamma delta gamma delta", false),
    (4L, "delta gamma delta gamma", false)
  )

  private def withModel[A](minAvg: Option[Long] = None)(body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_impmodel").toString
    ImportanceWeights
      .bucketScores(fitCorpus.toDF("id", "text", "t"), col("text"), col("t"), buckets = 256)
      .write.mode("overwrite").parquet(dir)
    spark.conf.set("spark.graft.importance.model", dir)
    minAvg.foreach(m => spark.conf.set("spark.graft.importance.minAvgUnits", m.toString))
    try body
    finally {
      spark.conf.unset("spark.graft.importance.model")
      spark.conf.unset("spark.graft.importance.minAvgUnits")
    }
  }

  test("map-side fold reproduces the operator's explode+groupBy weights exactly") {
    withModel() {
      val docs = Seq((10L, "alpha beta gamma"), (11L, "gamma delta delta"), (12L, "alpha alpha")).toDF("id", "text")
      // threshold 0 keeps everything so we can compare the weights themselves
      spark.conf.set("spark.graft.importance.minAvgUnits", "-999999999")
      val ruleW = ImportanceFilterRule(docs)
        .select(col("id"), col("imp_units").cast("long"), col("imp_grams"))
        .as[(Long, Long, Long)]
        .collect()
        .map(r => r._1 -> ((r._2, r._3)))
        .toMap
      val scores = ImportanceWeights
        .bucketScores(fitCorpus.toDF("id", "text", "t"), col("text"), col("t"), buckets = 256)
      val opW = ImportanceWeights
        // the rule scores unseen-bucket grams at the neutral default —
        // mirror that here (docs contain bigrams the fit never saw)
        .score(docs, col("id"), col("text"), scores, defaultUnits = Some(1000000L))
        .select(col("id"), col("w_units").cast("long"), col("n_grams"))
        .as[(Long, Long, Long)]
        .collect()
        .map(r => r._1 -> ((r._2, r._3)))
        .toMap
      ruleW shouldBe opW
    }
  }

  test("keeps target-like docs and drops background-like ones at the neutral bar") {
    withModel() {
      val docs = Seq(
        (10L, "alpha beta alpha"), // target-like
        (11L, "gamma delta gamma") // background-like
      ).toDF("id", "text")
      val kept = ImportanceFilterRule(docs).select("id").as[Long].collect().toSet
      kept shouldBe Set(10L)
    }
  }

  test("keep rule is the integer inequality w_units >= minAvgUnits * n_grams") {
    withModel() {
      val docs = Seq((10L, "alpha beta alpha"), (11L, "gamma delta gamma")).toDF("id", "text")
      spark.conf.set("spark.graft.importance.minAvgUnits", "-999999999")
      val w = ImportanceFilterRule(docs)
        .select(col("id"), col("imp_units").cast("long"), col("imp_grams"))
        .as[(Long, Long, Long)]
        .collect()
      // replay the filter at the default bar by hand
      val expect = w.filter { case (_, u, n) => u >= 1000000L * n }.map(_._1).toSet
      spark.conf.set("spark.graft.importance.minAvgUnits", "1000000")
      ImportanceFilterRule(docs).select("id").as[Long].collect().toSet shouldBe expect
    }
  }

  test("streams in append mode with no aggregation state") {
    withModel() {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[(Long, String)]
      in.addData((10L, "alpha beta alpha"), (11L, "gamma delta gamma"))
      val q = ImportanceFilterRule
        .applyStreaming(in.toDF().toDF("id", "text"))
        .writeStream
        .format("memory")
        .queryName("imp_filter_out")
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable()
        val kept = spark.table("imp_filter_out").select("id").as[Long].collect().toSet
        kept shouldBe Set(10L)
      } finally q.stop()
    }
  }

  test("unit sums beyond Long range accumulate in decimal without wrapping") {
    withModel() {
      // every gram lands on the default (unseen buckets): with
      // defaultUnits near Long.MaxValue/2, four grams overflow a Long
      // accumulator — the decimal path must carry the true sum and
      // the keep decision must not flip on a wrapped negative
      spark.conf.set("spark.graft.importance.defaultUnits", "5000000000000000000")
      spark.conf.set("spark.graft.importance.minAvgUnits", "1000000")
      try {
        val docs = Seq((20L, "zeta eta theta iota kappa")).toDF("id", "text")
        val r = ImportanceFilterRule(docs)
          .select(col("id"), col("imp_units"), col("imp_grams"))
          .collect()
        r.length shouldBe 1
        val units = BigDecimal(r(0).getDecimal(1))
        val grams = r(0).getLong(2)
        units shouldBe BigDecimal("5000000000000000000") * grams
        assert(units > BigDecimal(Long.MaxValue), "test must actually exceed Long range")
      } finally {
        spark.conf.unset("spark.graft.importance.defaultUnits")
      }
    }
  }

  test("missing model conf fails loudly") {
    val e = intercept[IllegalArgumentException] {
      ImportanceFilterRule(Seq((1L, "x")).toDF("id", "text"))
    }
    e.getMessage should include("spark.graft.importance.model")
  }
}
