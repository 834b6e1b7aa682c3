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
      maxBucketSize: Int = Int.MaxValue,
      compactEvery: Int = 0
  ): Unit = {
    val spark = batch.sparkSession
    val tables = Seq(s"$stagingDir/bands", s"$stagingDir/shingles", pairsDir)
    // A compaction interrupted between its partition deletes and the
    // tmp rename would leave the staged table incomplete for THIS
    // batch's read — finish any such swap before touching state. (The
    // tmp dir is underscore-hidden, so an incomplete one is inert.)
    tables.foreach { dir =>
      val p = new HPath(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) recoverSwaps(fs, p)
    }
    // Exactly-once holds only for same-checkpoint replay: a restart
    // with a fresh/deleted checkpoint resets batchId to 0, and the
    // overwrite-mode writes below would then silently clobber prior
    // batches' partitions while readStaged(batch_id < 0) pairs against
    // nothing — corpus memory destroyed without an error. Legit
    // crash-replay only ever sees existing partitions <= its own
    // batchId (batch N+1 starts only after N's checkpoint commit), so
    // any partition id ABOVE the current batch is proof of checkpoint
    // loss — fail fast before touching state.
    tables.foreach { dir =>
      maxBatchId(spark, dir).filter(_ > batchId).foreach { seen =>
        throw new IllegalStateException(
          s"$dir already holds batch_id=$seen > current batch $batchId: the stream " +
            "restarted with a fresh checkpoint against existing staging/pairs tables. " +
            "Resume from the original checkpoint, or point the new run at empty dirs.")
      }
    }
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
    // Auto-compaction cadence: fold the STAGING tables' final
    // partitions every `compactEvery` batches so a long-lived stream
    // holds O(1) staging partition dirs instead of one per micro-batch
    // forever. Running here — after this batch's writes, before the
    // checkpoint commit — is the "between micro-batches" window
    // compactStaged requires, and a crash mid-compaction is healed by
    // the recovery pass above. pairsDir is deliberately NOT
    // auto-compacted: its batch_id partition IS the documented
    // "arrived in that batch" attribution, which downstream consumers
    // read incrementally by partition — folding it would silently
    // rewrite history under one batch_id. Callers that don't need the
    // attribution can run compactStaged(pairsDir) themselves.
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      Seq(s"$stagingDir/bands", s"$stagingDir/shingles")
        .foreach(dir => compactStaged(spark, dir))
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

  /** Highest `batch_id=N` partition under `dir`, if any. */
  private def maxBatchId(spark: SparkSession, dir: String): Option[Long] = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else
      fs.listStatus(p)
        .iterator
        .map(_.getPath.getName)
        .collect { case s if s.startsWith("batch_id=") => s.stripPrefix("batch_id=").toLong }
        .maxOption
  }

  /** Fold all FINAL batch partitions of one staging/pairs table into a
    * single partition — the maintenance pass that keeps "one partition
    * directory per micro-batch forever" from degrading file listing and
    * scan planning on a long-lived stream.
    *
    * Only batches strictly below the LATEST partition are compacted:
    * the latest batch may still be replayed after a crash (its replay
    * overwrites exactly its own partition), but once any higher
    * partition exists a batch has committed and its partition is
    * final — merging finals into the highest final id (`target`)
    * preserves both replay invariants (`batch_id < current` reads all
    * of them; a replay never writes a final id).
    *
    * Crash-safe via the QueueSink idiom: the compacted rows land in a
    * hidden `_compact_tmp_<target>` dir first (underscore dirs are
    * invisible to parquet listing), and the swap — delete absorbed
    * partitions, rename tmp into place — completes on the next call if
    * interrupted. NOT concurrency-safe against a live stream reading
    * the same table mid-swap: run it between micro-batches or while
    * the stream is stopped, like any table-maintenance job.
    */
  def compactStaged(spark: SparkSession, dir: String): Unit = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    recoverSwaps(fs, p)
    val ids = fs
      .listStatus(p)
      .iterator
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("batch_id=") => s.stripPrefix("batch_id=").toLong }
      .toSeq
      .sorted
    if (ids.size < 3) return // latest + at most one final: nothing to fold
    val target = ids.init.max
    val tmp = new HPath(p, s"_compact_tmp_$target")
    spark.read
      .option("basePath", dir)
      .parquet(dir)
      .filter(col("batch_id") <= target)
      .drop("batch_id")
      .write
      .mode("overwrite")
      .parquet(tmp.toString)
    finishSwap(fs, p, tmp, target)
  }

  /** Complete an interrupted compaction swap (tmp fully written →
    * finish it; partial tmp → plain debris, delete it).
    */
  private def recoverSwaps(fs: org.apache.hadoop.fs.FileSystem, p: HPath): Unit =
    fs.listStatus(p)
      .map(_.getPath)
      .filter(_.getName.startsWith("_compact_tmp_"))
      .foreach { tmp =>
        val target = tmp.getName.stripPrefix("_compact_tmp_").toLong
        if (fs.exists(new HPath(tmp, "_SUCCESS"))) finishSwap(fs, p, tmp, target)
        else fs.delete(tmp, true) // incomplete write: plain debris
      }

  private def finishSwap(
      fs: org.apache.hadoop.fs.FileSystem,
      root: HPath,
      tmp: HPath,
      target: Long
  ): Unit = {
    fs.listStatus(root)
      .map(_.getPath)
      .filter { q =>
        q.getName.startsWith("batch_id=") &&
        q.getName.stripPrefix("batch_id=").toLong <= target
      }
      .foreach(fs.delete(_, true))
    fs.rename(tmp, new HPath(root, s"batch_id=$target"))
    ()
  }

  /** Wire a streaming source into the ingest. Caller sets the trigger
    * and checkpoint and starts it:
    *
    * {{{
    * StreamingDedup.nearDupIngest(stream, "doc_id", "text", staging, pairs)
    *   .option("checkpointLocation", ckpt)
    *   .start()
    * }}}
    *
    * `compactEvery = N` folds the STAGING tables' final batch
    * partitions into one every N micro-batches (default 16), keeping a
    * long-running stream at O(1) staging partition directories instead
    * of one per batch forever; 0 disables (caller runs
    * [[compactStaged]] itself). The pairs table is never
    * auto-compacted: its `batch_id` partitioning is the "arrived in
    * that batch" attribution consumers rely on for incremental
    * partition reads.
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
      maxBucketSize: Int = Int.MaxValue,
      compactEvery: Int = 16
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      nearDupIngestBatch(
        batch, batchId, idCol, textCol, stagingDir, pairsDir,
        k, numHashes, bands, threshold, maxBucketSize, compactEvery)
      ()
    }
}
