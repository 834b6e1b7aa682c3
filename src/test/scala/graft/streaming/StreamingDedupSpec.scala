package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** Streaming near-dup ingest: corpus memory via the staging tables,
  * batch-over-batch equality with the batch-mode staged form, and
  * replay idempotence (the exactly-once claim).
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val day0 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs today"),
    (3L, "the quick brown fox jumps over the lazy dog")
  )
  private val day1 = Seq(
    (10L, "the quick brown fox jumps over the lazy cat"),
    (11L, "entirely novel words matching nothing else at all")
  )

  private def pairSet(dir: String): Set[(Long, Long, Boolean, Boolean, Double)] =
    spark.read
      .option("basePath", dir)
      .parquet(dir)
      .select("id1", "id2", "new1", "new2", "jaccard")
      .as[(Long, Long, Boolean, Boolean, Double)]
      .collect()
      .toSet

  test("streaming ingest pairs each batch against everything before it") {
    val root = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    val q = StreamingDedup
      .nearDupIngest(mem.toDF.toDF("doc_id", "text"), "doc_id", "text",
        s"$root/staging", s"$root/pairs", k = 3, numHashes = 8, bands = 4)
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    mem.addData(day0: _*)
    q.processAllAvailable()
    mem.addData(day1: _*)
    q.processAllAvailable()
    q.stop()

    // expected: batch 0 within-batch pairs, then batch 1 vs day0
    val d0 = day0.toDF("doc_id", "text")
    val d1 = day1.toDF("doc_id", "text")
    val exp0 = Dedup
      .incrementalNearDups(d0, "doc_id", "text", lit(true), 3, 8, 4)
      .as[(Long, Long, Boolean, Boolean, Double)]
      .collect()
      .toSet
    val exp1 = Dedup
      .incrementalNearDups(d0.unionByName(d1), "doc_id", "text",
        col("doc_id") >= 10L, 3, 8, 4)
      .as[(Long, Long, Boolean, Boolean, Double)]
      .collect()
      .toSet
    pairSet(s"$root/pairs") shouldBe (exp0 ++ exp1)
    // the cross-batch near-dup was found (cat vs dog text from day 0)
    assert(exp1.exists { case (a, b, _, _, _) => Set(a, b) == Set(1L, 10L) })
    // staging now carries both batches' rows for the next ingest
    spark.read.option("basePath", s"$root/staging/shingles")
      .parquet(s"$root/staging/shingles")
      .select("doc_id").distinct().count() shouldBe 5L
  }

  test("replaying a batch (same batchId) is idempotent and ignores its own debris") {
    val root = java.nio.file.Files.createTempDirectory("graft_sdedup_replay").toString
    val d0 = day0.toDF("doc_id", "text")
    val d1 = day1.toDF("doc_id", "text")
    StreamingDedup.nearDupIngestBatch(d0, 0L, "doc_id", "text",
      s"$root/staging", s"$root/pairs", k = 3, numHashes = 8, bands = 4)
    StreamingDedup.nearDupIngestBatch(d1, 1L, "doc_id", "text",
      s"$root/staging", s"$root/pairs", k = 3, numHashes = 8, bands = 4)
    val once = pairSet(s"$root/pairs")
    // crash-replay of batch 1: its own (possibly partial) staging and
    // pairs partitions already exist — the replay must exclude them
    // from the staged read and overwrite them, changing nothing
    StreamingDedup.nearDupIngestBatch(d1, 1L, "doc_id", "text",
      s"$root/staging", s"$root/pairs", k = 3, numHashes = 8, bands = 4)
    pairSet(s"$root/pairs") shouldBe once
    // no duplicated staging rows either
    spark.read.option("basePath", s"$root/staging/bands")
      .parquet(s"$root/staging/bands")
      .groupBy("doc_id", "band").count().filter(col("count") > 1).count() shouldBe 0L
  }

  test("a fresh-checkpoint restart against existing staging fails fast, not clobbers") {
    val root = java.nio.file.Files.createTempDirectory("graft_sdedup_guard").toString
    val d0 = day0.toDF("doc_id", "text")
    val d1 = day1.toDF("doc_id", "text")
    StreamingDedup.nearDupIngestBatch(d0, 0L, "doc_id", "text",
      s"$root/staging", s"$root/pairs", k = 3, numHashes = 8, bands = 4)
    StreamingDedup.nearDupIngestBatch(d1, 1L, "doc_id", "text",
      s"$root/staging", s"$root/pairs", k = 3, numHashes = 8, bands = 4)
    val before = pairSet(s"$root/pairs")
    // checkpoint lost → batchId resets to 0 while batch_id=1 exists:
    // this must throw BEFORE any overwrite destroys corpus memory
    val e = intercept[IllegalStateException] {
      StreamingDedup.nearDupIngestBatch(d0, 0L, "doc_id", "text",
        s"$root/staging", s"$root/pairs", k = 3, numHashes = 8, bands = 4)
    }
    e.getMessage should include("fresh checkpoint")
    pairSet(s"$root/pairs") shouldBe before // nothing was clobbered
  }

  test("compaction folds final batches into one partition without changing reads or replay") {
    val root = java.nio.file.Files.createTempDirectory("graft_sdedup_compact").toString
    val batches = Seq(
      Seq((1L, "the quick brown fox jumps over the lazy dog")),
      Seq((2L, "pack my box with five dozen liquor jugs today")),
      Seq((3L, "the quick brown fox jumps over the lazy cat")),
      Seq((4L, "the quick brown fox leaps over the lazy dog"))
    )
    batches.zipWithIndex.foreach { case (rows, i) =>
      StreamingDedup.nearDupIngestBatch(rows.toDF("doc_id", "text"), i.toLong, "doc_id", "text",
        s"$root/staging", s"$root/pairs", k = 3, numHashes = 8, bands = 4)
    }
    val before = pairSet(s"$root/pairs")
    def staged(sub: String) = spark.read
      .option("basePath", s"$root/staging/$sub").parquet(s"$root/staging/$sub")
    val bandRows = staged("bands").drop("batch_id").collect().toSet

    Seq("bands", "shingles").foreach(s => StreamingDedup.compactStaged(spark, s"$root/staging/$s"))

    // partitions folded: finals {0,1,2} became one batch_id=2; latest kept
    def ids(sub: String) = new java.io.File(s"$root/staging/$sub").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).map(_.stripPrefix("batch_id=").toLong).toSet
    ids("bands") shouldBe Set(2L, 3L)
    staged("bands").drop("batch_id").collect().toSet shouldBe bandRows // no row lost or duplicated
    // the stream continues correctly after compaction: batch 4 still
    // pairs against ALL prior docs (compacted ids 2 < 4 stay visible)
    StreamingDedup.nearDupIngestBatch(
      Seq((10L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text"),
      4L, "doc_id", "text", s"$root/staging", s"$root/pairs", k = 3, numHashes = 8, bands = 4)
    val after = pairSet(s"$root/pairs")
    before.subsetOf(after) shouldBe true
    // 10 is a near-dup of 1 (batch 0, inside the compacted partition), 3 and 4
    Set(1L, 3L, 4L).foreach { old =>
      assert(after.exists { case (a, b, _, _, _) => Set(a, b) == Set(old, 10L) },
        s"pair ($old, 10) missing after compaction")
    }
  }

  test("compactEvery keeps partition counts bounded across 3N batches, output unchanged") {
    val rootA = java.nio.file.Files.createTempDirectory("graft_sdedup_cadA").toString
    val rootB = java.nio.file.Files.createTempDirectory("graft_sdedup_cadB").toString
    def ids(root: String, sub: String): Set[Long] = {
      val f = new java.io.File(s"$root/$sub")
      if (!f.exists()) Set.empty
      else
        f.listFiles()
          .map(_.getName)
          .filter(_.startsWith("batch_id="))
          .map(_.stripPrefix("batch_id=").toLong)
          .toSet
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs today",
      "the quick brown fox jumps over the lazy cat",
      "sphinx of black quartz judge my vow tonight",
      "the quick brown fox leaps over the lazy dog",
      "entirely novel words matching nothing else at all",
      "the quick brown fox jumps over the lazy dog again",
      "jackdaws love my big sphinx of quartz daily",
      "pack my box with five dozen liquor jugs tomorrow"
    )
    texts.zipWithIndex.foreach { case (t, i) =>
      val df = Seq((i.toLong, t)).toDF("doc_id", "text")
      // cadence run: compact every 3 batches
      StreamingDedup.nearDupIngestBatch(df, i.toLong, "doc_id", "text",
        s"$rootA/staging", s"$rootA/pairs", k = 3, numHashes = 8, bands = 4, compactEvery = 3)
      // control run: never compacted
      StreamingDedup.nearDupIngestBatch(df, i.toLong, "doc_id", "text",
        s"$rootB/staging", s"$rootB/pairs", k = 3, numHashes = 8, bands = 4)
      // staging bounded at every step: never more than compactEvery + 2 dirs
      Seq("staging/bands", "staging/shingles").foreach { sub =>
        assert(ids(rootA, sub).size <= 5, s"$sub has ${ids(rootA, sub)} after batch $i")
      }
    }
    // after the batch-8 compaction: two dirs (final fold + latest) vs 9 uncompacted
    ids(rootA, "staging/bands").size shouldBe 2
    ids(rootB, "staging/bands").size shouldBe 9
    // pairs is NEVER auto-compacted: batch_id = "arrived in that batch"
    // attribution survives the cadence, one partition per batch
    ids(rootA, "pairs") shouldBe (0L to 8L).toSet
    // identical pair output
    pairSet(s"$rootA/pairs") shouldBe pairSet(s"$rootB/pairs")
    // identical staged content for any future batch
    spark.read.option("basePath", s"$rootA/staging/shingles").parquet(s"$rootA/staging/shingles")
      .drop("batch_id").collect().toSet shouldBe
      spark.read.option("basePath", s"$rootB/staging/shingles").parquet(s"$rootB/staging/shingles")
        .drop("batch_id").collect().toSet
  }

  test("an interrupted compaction swap completes on the next call") {
    val root = java.nio.file.Files.createTempDirectory("graft_sdedup_swapfix").toString
    val dir = s"$root/staging/bands"
    (0 to 3).foreach { i =>
      StreamingDedup.nearDupIngestBatch(
        Seq((i.toLong, s"totally distinct text number $i with unique words $i")).toDF("doc_id", "text"),
        i.toLong, "doc_id", "text", s"$root/staging", s"$root/pairs", k = 3, numHashes = 8, bands = 4)
    }
    val rows = spark.read.option("basePath", dir).parquet(dir).drop("batch_id").collect().toSet
    // simulate a crash AFTER the tmp write, BEFORE the swap: build the
    // tmp exactly as compactStaged would, then leave it orphaned
    spark.read.option("basePath", dir).parquet(dir)
      .filter(col("batch_id") <= 2).drop("batch_id")
      .write.mode("overwrite").parquet(s"$dir/_compact_tmp_2")
    // next maintenance call finds the completed tmp and finishes the swap
    StreamingDedup.compactStaged(spark, dir)
    val ids = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).map(_.stripPrefix("batch_id=").toLong).toSet
    ids shouldBe Set(2L, 3L)
    spark.read.option("basePath", dir).parquet(dir).drop("batch_id").collect().toSet shouldBe rows
  }
}
