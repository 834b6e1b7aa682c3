package graft.rules

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.QualityClassifier
import graft.rules.CorpusRules.QualityClassifierRule

/** The ingest-time trained quality filter: fit offline on the train
  * split, filter the held-out docs against the frozen snapshot — and
  * the decisions must replay the batch query (q133) BIT-identically:
  * same kept set, same scores, because rule and query compose the same
  * QualityClassifier expressions (exact BIGINT weight sums + the same
  * two IEEE divisions). Plus the sibling-rule contracts: threshold
  * override, append-mode streaming with zero state, loud conf failure.
  */
class QualityClassifierRuleSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private def withModel[A](body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_qcmodel").toString
    QualityClassifier.fit(
      docs.filter(col("doc_id") % 5 =!= 0), col("doc_id"), col("text"), dir)
    graft.operators.Pinned.release(spark, blocking = true)
    spark.conf.set("spark.graft.quality.model", dir)
    try body
    finally {
      spark.conf.unset("spark.graft.quality.model")
      spark.conf.unset("spark.graft.quality.minScore")
    }
  }

  test("rule decisions and scores replay the batch query bit-identically") {
    withModel {
      val batch =
        try graft.SparkEntry.queries("q133_quality_classifier")(spark, sfDir).collect()
          .map(r => (r.getLong(0), r.getDouble(3), r.getBoolean(4)))
        finally graft.operators.Pinned.release(spark, blocking = true)
      val expectKept = batch.filter(_._3).map(t => t._1 -> t._2).toMap
      assert(expectKept.nonEmpty && expectKept.size < batch.length,
        "degenerate fixture: batch predictions are all one class")
      val ruleKept = QualityClassifierRule(docs.filter(col("doc_id") % 5 === 0))
        .select(col("doc_id"), col("qc_score"))
        .as[(Long, Double)]
        .collect()
        .toMap
      ruleKept.keySet shouldBe expectKept.keySet
      ruleKept.foreach { case (id, s) =>
        assert(s == expectKept(id), s"doc $id: rule score $s != batch score ${expectKept(id)}")
      }
    }
  }

  test("minScore override replaces the calibrated operating point") {
    withModel {
      spark.conf.set("spark.graft.quality.minScore", "-1.0")
      val all = QualityClassifierRule(docs.filter(col("doc_id") % 5 === 0))
        .select(col("doc_id"), col("qc_score"))
        .as[(Long, Double)]
        .collect()
      // bar -1 keeps every doc (zero-hit docs score the 0.5 prior)
      all.length shouldBe docs.filter(col("doc_id") % 5 === 0).count()
      val bar = 0.595
      spark.conf.set("spark.graft.quality.minScore", bar.toString)
      val kept = QualityClassifierRule(docs.filter(col("doc_id") % 5 === 0))
        .select("doc_id").as[Long].collect().toSet
      kept shouldBe all.filter(_._2 >= bar).map(_._1).toSet
    }
  }

  test("streams in append mode with no aggregation state") {
    withModel {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val rows = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      val expect = QualityClassifierRule(docs.filter(col("doc_id") % 5 === 0))
        .select("doc_id").as[Long].collect().toSet
      val in = MemoryStream[(Long, String)]
      in.addData(rows.toSeq: _*)
      val q = QualityClassifierRule
        .applyStreaming(in.toDF().toDF("doc_id", "text"))
        .writeStream
        .format("memory")
        .queryName("qc_filter_out")
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable()
        spark.table("qc_filter_out").select("doc_id").as[Long].collect().toSet shouldBe expect
      } finally q.stop()
    }
  }

  test("token-less docs never pass, even with a bar below the 0.5 prior") {
    withModel {
      // tau below 0.5 would keep a no-evidence doc on its prior alone —
      // but empty/whitespace/null text is OUTSIDE the model's
      // population (the batch twin excludes it before scoring), so the
      // rule must drop it regardless of the operating point
      spark.conf.set("spark.graft.quality.minScore", "-1.0")
      val in = Seq(
        (1L, "the quick brown fox jumps over a lazy dog of june and to in is"),
        (2L, ""), (3L, "   "), (4L, null.asInstanceOf[String])
      ).toDF("doc_id", "text")
      QualityClassifierRule(in).select("doc_id").as[Long].collect().toSet shouldBe Set(1L)
    }
  }

  test("missing model conf fails loudly") {
    val e = intercept[IllegalArgumentException] {
      QualityClassifierRule(Seq((1L, "x")).toDF("doc_id", "text"))
    }
    e.getMessage should include("spark.graft.quality.model")
  }
}
