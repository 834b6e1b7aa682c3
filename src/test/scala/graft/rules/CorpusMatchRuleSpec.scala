package graft.rules

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.rules.CorpusRules.CorpusMatchRule

/** The ingest-time corpus-match (decontamination) rule: batch and
  * streaming must flag the same (input text, corpus doc) pairs, and the
  * threshold/required-conf contracts must hold.
  */
class CorpusMatchRuleSpec extends SparkSpec {
  import spark.implicits._

  private val corpusTexts = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "pack my box with five dozen liquor jugs exactly today"),
    (102L, "the quick brown fox jumps over the lazy dog") // dup text — one corpus id
  )

  private val incoming = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"), // exact corpus match
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 100
    (3L, "completely unrelated words that match nothing in the corpus"),
    (4L, "the quick brown fox jumps over the lazy dog") // same text as 1 — same alert
  )

  private def withCorpus[A](threshold: Option[Double])(body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_corpusmatch").toString
    corpusTexts.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    spark.conf.set("spark.graft.corpusMatch.corpus", dir)
    threshold.foreach(t => spark.conf.set("spark.graft.corpusMatch.threshold", t.toString))
    try body
    finally {
      spark.conf.unset("spark.graft.corpusMatch.corpus")
      spark.conf.unset("spark.graft.corpusMatch.threshold")
    }
  }

  test("batch: near-dups of the corpus are flagged once per (text, corpus doc)") {
    withCorpus(Some(0.5)) {
      val out = CorpusMatchRule(incoming.toDF("doc_id", "text"))
        .select("doc_id", "corpus_match_id", "jaccard")
        .collect()
      val byDoc = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
      // exact match scores 1.0; doc 4 (same text as 1) collapses into one
      // alert pair, surviving with the minimum doc_id
      byDoc.keySet shouldBe Set(1L, 2L)
      byDoc(1L) shouldBe 1.0
      byDoc(2L) should (be >= 0.5 and be < 1.0)
      out.map(_.getString(1)).distinct.length shouldBe 1 // both match corpus text 100/102
    }
  }

  test("batch: threshold 1.0 keeps only exact matches; clean docs never appear") {
    withCorpus(Some(1.0)) {
      val out = CorpusMatchRule(incoming.toDF("doc_id", "text"))
      out.select("doc_id").as[Long].collect().toSeq shouldBe Seq(1L)
    }
  }

  test("streaming: stream-static join flags the same pairs as batch") {
    withCorpus(Some(0.5)) {
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
      mem.addData(incoming: _*)
      val q = CorpusMatchRule
        .applyStreaming(mem.toDF.toDF("doc_id", "text"))
        .writeStream
        .format("memory")
        .queryName("corpusMatchStream")
        .outputMode("append")
        .start()
      q.processAllAvailable()
      q.stop()
      val rows = spark
        .table("corpusMatchStream")
        .select("doc_id", "corpus_match_id")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)))
      // one alert per distinct (text, corpus doc): docs 1 and 4 share a
      // text, so exactly one of them is flagged (first arrival)
      rows.length shouldBe 2
      rows.map(_._1).toSet.intersect(Set(1L, 4L)).size shouldBe 1
      rows.map(_._1) should contain(2L)
    }
  }

  test("streaming: declared event time bounds the alert-dedup state by watermark") {
    withCorpus(Some(0.5)) {
      spark.conf.set("spark.graft.stream.eventTimeCol", "ts")
      try {
        val mem =
          org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, java.sql.Timestamp)](spark)
        val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
        mem.addData(incoming.map { case (id, txt) => (id, txt, t0) }: _*)
        val out = CorpusMatchRule.applyStreaming(mem.toDF.toDF("doc_id", "text", "ts"))
        // the plan carries the watermark-BOUNDED dedup, not the
        // unbounded dropDuplicates whose state grows forever
        val plan = out.queryExecution.analyzed.toString
        plan should include("DeduplicateWithinWatermark")
        plan should include("EventTimeWatermark")
        val q = out.writeStream
          .format("memory")
          .queryName("corpusMatchWm")
          .outputMode("append")
          .start()
        q.processAllAvailable()
        q.stop()
        // same alerts as the unwatermarked form on in-horizon data:
        // docs 1 and 4 share a text → one alert; doc 2 is a near-dup
        val ids = spark.table("corpusMatchWm").select("doc_id").as[Long].collect().toSet
        ids should have size 2
        ids should contain(2L)
      } finally spark.conf.unset("spark.graft.stream.eventTimeCol")
    }
  }

  test("a NULL event time fails the stream instead of silently vanishing in the watermark") {
    // The watermark operator DROPS null-event-time rows; the conf-off
    // dropDuplicates path keeps them — a data-dependent divergence.
    // The guard turns it into a loud error at the offending row.
    spark.conf.set("spark.graft.stream.eventTimeCol", "ts")
    try {
      val mem =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Option[java.sql.Timestamp])](spark)
      mem.addData((1L, "a", Some(java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))), (2L, "b", None))
      val out = CorpusRules.streamDedupFirstArrival(mem.toDF.toDF("doc_id", "text", "ts"), Seq("text"))
      val q = out.writeStream.format("noop").outputMode("append").start()
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      q.stop()
      e.getMessage should include("null ts in stream")
    } finally spark.conf.unset("spark.graft.stream.eventTimeCol")
  }

  test("a declared event-time column missing from the stream fails loudly") {
    spark.conf.set("spark.graft.stream.eventTimeCol", "no_such_col")
    try {
      val e = intercept[IllegalArgumentException] {
        CorpusRules.streamDedupFirstArrival(incoming.toDF("doc_id", "text"), Seq("text"))
      }
      e.getMessage should include("no_such_col")
    } finally spark.conf.unset("spark.graft.stream.eventTimeCol")
  }

  test("LSH parameters ride the conf; a non-dividing band count fails loudly") {
    withCorpus(Some(0.5)) {
      // wider signature, finer bands — same matches on this corpus
      spark.conf.set("spark.graft.corpusMatch.numHashes", "16")
      spark.conf.set("spark.graft.corpusMatch.bands", "8")
      try {
        CorpusMatchRule(incoming.toDF("doc_id", "text"))
          .select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 2L)
        spark.conf.set("spark.graft.corpusMatch.bands", "5")
        val e = intercept[IllegalArgumentException] {
          CorpusMatchRule(incoming.toDF("doc_id", "text"))
        }
        e.getMessage should include("must divide")
      } finally {
        spark.conf.unset("spark.graft.corpusMatch.numHashes")
        spark.conf.unset("spark.graft.corpusMatch.bands")
      }
    }
  }

  test("missing corpus conf fails with the conf key named") {
    val e = intercept[IllegalArgumentException] {
      CorpusMatchRule(incoming.toDF("doc_id", "text")).collect()
    }
    e.getMessage should include("spark.graft.corpusMatch.corpus")
  }

  test("input columns colliding with the rule's contract are rejected by name") {
    withCorpus(None) {
      val e = intercept[IllegalArgumentException] {
        CorpusMatchRule(incoming.toDF("doc_id", "jaccard"))
      }
      e.getMessage should include("jaccard")
    }
  }

  test("the rule is registered as a builtin pipeline plugin") {
    graft.pipeline.PipelineCompiler.builtinRules.keySet should contain("corpusMatch")
  }

  test("the rule rides the pipeline DSL end-to-end (source → corpusMatch → sink)") {
    withCorpus(Some(0.5)) {
      val dir = java.nio.file.Files.createTempDirectory("graft_corpusmatch_dsl").toString
      incoming.toDF("doc_id", "text").write.parquet(s"$dir/input")
      val config =
        s"""{
           |  "eventFolder": "builtin",
           |  "rules": {
           |    "quarantine": {"source": "docs", "plugin": "corpusMatch", "sink": "memQuarantine"}
           |  },
           |  "states": {},
           |  "sources": {"docs": {"type": "File", "path": "$dir/input", "format": "parquet"}},
           |  "sinks": {"memQuarantine": {"type": "Memory"}}
           |}""".stripMargin
      val compiled = graft.pipeline.PipelineCompiler.compile(spark, config).toOption.get
      graft.pipeline.PipelineCompiler.runBatch(compiled)
      val flagged = spark.table("memQuarantine").select("doc_id").as[Long].collect().toSet
      flagged shouldBe Set(1L, 2L) // the corpus near-dups, nothing clean
    }
  }
}
