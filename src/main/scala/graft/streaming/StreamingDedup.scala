package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming near-duplicate ingestion with CORPUS MEMORY — the
  * streaming form of [[Dedup.incrementalNearDupsStaged]].
  *
  * [[graft.rules.CorpusRules.NearDupRule]]'s streaming mode can only
  * dedup near-exact (first arrival per SimHash signature): true
  * near-dup needs each document compared against everything ingested
  * BEFORE it, which is unbounded state no watermark can hold. The
  * staging tables make it a micro-batch pattern instead: every batch
  *
  *   1. pairs against the staging tables (band rows + shingle sets of
  *      all prior batches — `Dedup.stageNearDup` schema) without
  *      recomputing any prior text,
  *   2. writes its near-dup pairs, and
  *   3. appends its own staging rows, becoming "old" for the next
  *      batch.
  *
  * Exactly-once without a transactional sink: every write lands under
  * a `batch_id=N` partition directory in OVERWRITE mode, and the
  * staged read excludes partitions ≥ the current batch id — so a
  * batch replayed after a crash overwrites exactly its own output and
  * pairs against exactly the state it saw the first time. (The
  * old×old restriction additionally guarantees a replay can never
  * re-pair prior batches with each other.)
  *
  * Pairs output schema: (id1, id2, new1, new2, jaccard) + batch_id —
  * `new` = arrived in that batch. Ids must be unique across the whole
  * stream (exact-dedup upstream if the source can re-deliver).
  */
object StreamingDedup {

  /** One micro-batch of the ingest — the `foreachBatch` body, exposed
    * for batch-mode reuse and direct testing.
    */
  def nearDupIngestBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      stagingDir: String,
      pairsDir: String,
      k: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.0,
      maxBucketSize: Int = Int.MaxValue
  ): Unit = {
    val spark = batch.sparkSession
    val (batchBands, batchSh) = Dedup.stageNearDup(batch, idCol, textCol, k, numHashes, bands)
    val stagedBands =
      readStaged(spark, s"$stagingDir/bands", batchId, batchBands)
    val stagedSh =
      readStaged(spark, s"$stagingDir/shingles", batchId, batchSh)
    val (pairs, _) = Dedup.incrementalNearDupsStaged(
      stagedBands, stagedSh, batch, idCol, textCol, k, numHashes, bands, threshold, maxBucketSize)
    // Pairs first: if we crash between the two writes, the replay
    // recomputes pairs against the same staged state (its own staging
    // partition is excluded from the read) and overwrites both.
    pairs.write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
    batchBands.write.mode("overwrite").parquet(s"$stagingDir/bands/batch_id=$batchId")
    batchSh.write.mode("overwrite").parquet(s"$stagingDir/shingles/batch_id=$batchId")
  }

  /** The staged relation accumulated by batches STRICTLY BEFORE
    * `batchId` — partitions ≥ batchId are a crashed attempt's debris
    * and must not feed their own replay. Empty-with-schema before the
    * first batch.
    */
  private def readStaged(
      spark: SparkSession,
      dir: String,
      batchId: Long,
      schemaFrom: DataFrame
  ): DataFrame = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      spark.read
        .option("basePath", dir)
        .parquet(dir)
        .filter(col("batch_id") < batchId)
        .drop("batch_id")
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemaFrom.schema)
  }

  /** Wire a streaming source into the ingest. Caller sets the trigger
    * and checkpoint and starts it:
    *
    * {{{
    * StreamingDedup.nearDupIngest(stream, "doc_id", "text", staging, pairs)
    *   .option("checkpointLocation", ckpt)
    *   .start()
    * }}}
    */
  def nearDupIngest(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      stagingDir: String,
      pairsDir: String,
      k: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.0,
      maxBucketSize: Int = Int.MaxValue
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      nearDupIngestBatch(
        batch, batchId, idCol, textCol, stagingDir, pairsDir,
        k, numHashes, bands, threshold, maxBucketSize)
      ()
    }
}
