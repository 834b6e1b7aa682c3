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
}
