package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Ivfadc

/** Streaming ingest into a SAVED IVFADC index — the serving-side
  * maintenance loop ([[Ivfadc.append]] + [[Ivfadc.driftCheck]]) as a
  * micro-batch pattern over the index's own directory, the
  * [[StreamingDedup]] staging discipline applied to ANN:
  *
  *   1. each batch is encoded under the FROZEN model
  *      ([[Ivfadc.encodeBatch]] — the quantizer never moves between
  *      refits, so appended codes are exactly what a refit-free
  *      [[Ivfadc.append]] would hold in memory),
  *   2. the encoded halves land as `batch_id=N` delta partitions next
  *      to the staged index (`$dir/delta/{cells,enc}/batch_id=N`,
  *      OVERWRITE mode — a batch replayed after a crash overwrites
  *      exactly its own output, so ingest is replay-idempotent without
  *      a transactional sink) and become VISIBLE only when the batch's
  *      commit marker lands (created last, dropped first on replay —
  *      a crash or concurrent read mid-write can never observe a
  *      half-written batch),
  *   3. the batch is drift-checked against the index's staged
  *      fit-time baseline (when one exists) and the per-cell decision
  *      report lands under `$dir/delta/drift/batch_id=N` — drifted
  *      batches still ingest (the q127 posture: drift flags schedule a
  *      REFIT, they do not block writes; a gap in the index is worse
  *      than a slightly stale quantization).
  *
  * [[loadWithDeltas]] serves the union (base + all deltas) through
  * the same probed search path; [[foldDeltas]] is the compaction
  * cadence — rewrite base+deltas as a fresh index dir (index dirs are
  * versioned, the caller swaps serving to the new version and drops
  * the old; in-place swap would need [[StreamingDedup]]'s
  * swap-recovery machinery for no serving benefit).
  *
  * Ids must be unique across the whole stream (exact-dedup upstream),
  * the [[Ivfadc.append]] contract.
  */
object StreamingIndex {

  /** One micro-batch of the ingest — the `foreachBatch` body, exposed
    * for batch-mode reuse and direct testing.
    */
  def ingestBatch(
      batch: DataFrame,
      batchId: Long,
      dir: String,
      idCol: String,
      embCol: String,
      ratioThreshold: Double = 2.0
  ): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val index = Ivfadc.load(spark, dir)
    val (cells, enc) = Ivfadc.encodeBatch(index, batch, idCol, embCol)
    // Commit protocol: the batch is visible IFF its marker file exists.
    // The marker is dropped first (a replay makes the batch invisible
    // for its duration instead of serving a half-overwritten mix),
    // re-created last with an atomic create — so a crash or a
    // concurrent read at ANY point between sees either the complete
    // previous version of the batch (marker still absent: nothing) or
    // the complete new one, never partial part-file listings.
    val fs = fileSystem(spark, dir)
    val marker = new HPath(commitMarker(dir, batchId))
    if (fs.exists(marker)) fs.delete(marker, false)
    enc.write.mode("overwrite").parquet(s"$dir/delta/enc/batch_id=$batchId")
    cells.write.mode("overwrite").parquet(s"$dir/delta/cells/batch_id=$batchId")
    if (exists(spark, s"$dir/staleness")) {
      Ivfadc
        .driftCheck(index, dir, batch, idCol, embCol, ratioThreshold)
        .write.mode("overwrite").parquet(s"$dir/delta/drift/batch_id=$batchId")
    }
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
  }

  private def commitMarker(dir: String, batchId: Long): String =
    s"$dir/delta/commits/batch_$batchId"

  /** Batch ids whose commit marker exists — the only batches the
    * served view admits.
    */
  private def committedIds(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new HPath(s"$dir/delta/commits")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p).toSeq
        .map(_.getPath.getName)
        .collect { case s if s.startsWith("batch_") => s.stripPrefix("batch_").toLong }
  }

  /** Start the streaming ingest: (idCol, embCol) rows → the index
    * dir's delta partitions, exactly-once per micro-batch.
    */
  def ingest(
      stream: DataFrame,
      dir: String,
      idCol: String,
      embCol: String,
      checkpoint: String,
      ratioThreshold: Double = 2.0
  ): StreamingQuery =
    stream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        ingestBatch(b, id, dir, idCol, embCol, ratioThreshold)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** The served view: base index + every ingested delta, probed-search
    * ready (both halves keep their cell columns, so the partition-
    * pruning contract of a loaded index holds for the base scan; delta
    * scans are batch-sized).
    */
  def loadWithDeltas(spark: SparkSession, dir: String): Ivfadc.Index = {
    val base = Ivfadc.load(spark, dir)
    val committed = committedIds(spark, dir)
    if (committed.isEmpty) base
    else {
      // only marker-committed batches are served (ingestBatch's commit
      // protocol), on BOTH halves — a crashed or in-replay batch is
      // wholly invisible, never a complete enc against partial cells
      val ok = col("batch_id").cast("long").isin(committed: _*)
      val cellsD = spark.read.parquet(s"$dir/delta/cells").filter(ok)
      val encD = spark.read.parquet(s"$dir/delta/enc").filter(ok)
      base.copy(
        cells = base.cells.unionByName(cellsD.select(col("id"), col("cell").cast("int"))),
        enc = base.enc.unionByName(
          encD.select(col("id"), col("sub"), col("code"), col("cell").cast("int"))))
    }
  }

  /** All drift reports ingested so far, batch-stamped — the refit
    * scheduler's queue. Empty frame when no batch was drift-checked.
    */
  def driftLog(spark: SparkSession, dir: String): Option[DataFrame] =
    if (exists(spark, s"$dir/delta/drift")) Some(spark.read.parquet(s"$dir/delta/drift"))
    else None

  /** Compaction: rewrite base + deltas as a fresh index dir (model
    * unchanged — the stamp carries over, so the staged fit-time
    * baseline stays valid and is copied along with it).
    */
  def foldDeltas(spark: SparkSession, dir: String, outDir: String): Unit = {
    Ivfadc.save(loadWithDeltas(spark, dir), outDir)
    if (exists(spark, s"$dir/staleness"))
      spark.read.parquet(s"$dir/staleness").write.mode("overwrite").parquet(s"$outDir/staleness")
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new HPath(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def fileSystem(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
}
