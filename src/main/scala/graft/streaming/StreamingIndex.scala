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
  *      [[Ivfadc.append]] would hold in memory); [[ingest]] loads the
  *      model ONCE per query and fails loudly if the on-disk model is
  *      swapped under a running ingest (a silent mid-stream swap would
  *      mix encodings from two quantizers inside one delta tree),
  *   2. the encoded halves land as `batch_id=N` delta partitions next
  *      to the staged index (`$dir/delta/{cells,enc}/batch_id=N`,
  *      OVERWRITE mode — a batch replayed after a crash overwrites
  *      exactly its own output, so ingest is replay-idempotent without
  *      a transactional sink) and become VISIBLE only when the batch's
  *      commit marker lands (created last, dropped first on replay —
  *      readers that go through [[loadWithDeltas]] list only committed
  *      batch directories, so a crashed or in-replay batch is wholly
  *      invisible to them),
  *   3. the batch is drift-checked against the index's staged
  *      fit-time baseline (when one exists) and the per-cell decision
  *      report lands under `$dir/delta/drift/batch_id=N` — drifted
  *      batches still ingest (the q127 posture: drift flags schedule a
  *      REFIT, they do not block writes; a gap in the index is worse
  *      than a slightly stale quantization).
  *
  * [[loadWithDeltas]] serves the union (base + committed deltas)
  * through the same probed search path; [[foldDeltas]] is the
  * compaction cadence — it snapshots the committed-batch set ONCE,
  * rewrites base + exactly that snapshot as a fresh index dir, and
  * records the snapshot under `$outDir/folded_batches` so batches
  * committed after the snapshot are detectable (diff against
  * [[foldedBatches]]) and replayable into the new version. Index dirs
  * are versioned: the caller swaps serving to the new version and
  * drops the old; folding INTO an existing dir (or into the ingest
  * dir itself) is refused loudly — an in-place rewrite would race the
  * old version's readers and ingest for no serving benefit.
  *
  * Ids must be unique across the whole stream (exact-dedup upstream),
  * the [[Ivfadc.append]] contract.
  */
object StreamingIndex {

  /** One micro-batch of the ingest, batch-mode / test entry point:
    * loads the model itself. The streaming path ([[ingest]]) uses the
    * caller-held-model overload so the model parquet/JSON reads and
    * plan construction happen once per query, not once per trigger.
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
    ingestBatch(batch, batchId, dir, idCol, embCol, ratioThreshold,
      Ivfadc.load(batch.sparkSession, dir))
  }

  /** The `foreachBatch` body with a caller-held frozen model. */
  def ingestBatch(
      batch: DataFrame,
      batchId: Long,
      dir: String,
      idCol: String,
      embCol: String,
      ratioThreshold: Double,
      index: Ivfadc.Index
  ): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // The residual-assignment prefix (nearest-cell + residual, the
    // expensive map-side stage) is shared by all three consumers below
    // — the enc write, the cells write, and driftCheck's staleness
    // encode. Persist it for the batch's duration so the lineage runs
    // once, not three times (the CacheManager substitutes the cached
    // plan into each consumer's identical residual sub-plan).
    val res = Ivfadc.residuals(index, batch, idCol, embCol)
    res.persist()
    try {
      val (cells, enc) = Ivfadc.encodeBatch(index, batch, idCol, embCol)
      // Commit protocol: the batch is visible IFF its marker file
      // exists. The marker is dropped first (a replay makes the batch
      // invisible for its duration instead of serving a half-
      // overwritten mix), re-created last — so readers that resolve
      // visibility through the markers ([[committedIds]] /
      // [[loadWithDeltas]], which list and read ONLY committed batch
      // directories) see either the complete previous version of the
      // batch or the complete new one, never a half-written mix. A
      // reader that lists the delta tree directly, outside that
      // protocol, gets no such isolation.
      DeltaCommits.commit(spark, dir, batchId) {
        enc.write.mode("overwrite").parquet(s"$dir/delta/enc/batch_id=$batchId")
        cells.write.mode("overwrite").parquet(s"$dir/delta/cells/batch_id=$batchId")
        if (exists(spark, s"$dir/staleness")) {
          Ivfadc
            .driftCheck(index, dir, batch, idCol, embCol, ratioThreshold)
            .write.mode("overwrite").parquet(s"$dir/delta/drift/batch_id=$batchId")
        }
      }
    } finally res.unpersist(blocking = false)
  }

  /** Batch ids whose commit marker exists — the only batches the
    * served view admits ([[DeltaCommits.committedIds]]).
    */
  private def committedIds(spark: SparkSession, dir: String): Seq[Long] =
    DeltaCommits.committedIds(spark, dir)

  /** Byte fingerprint of the staged model files — the mid-stream
    * model-swap guard. Pure filesystem reads (the model JSON is one
    * small file), no Spark job, so checking it per trigger is cheap.
    * A byte-identical rewrite fingerprints the same (same model, no
    * false alarm); any refit changes the serialized doubles.
    */
  private def modelFingerprint(spark: SparkSession, dir: String): String = {
    val p = new HPath(s"$dir/model")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md = java.security.MessageDigest.getInstance("MD5")
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
      .foreach { s =>
        val in = fs.open(s.getPath)
        try {
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { md.update(buf, 0, n); n = in.read(buf) }
        } finally in.close()
      }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Start the streaming ingest: (idCol, embCol) rows → the index
    * dir's delta partitions, exactly-once per micro-batch. The model
    * is loaded ONCE here (frozen-model contract — between refits the
    * quantizer never moves, so reloading per trigger is pure overhead)
    * and its on-disk fingerprint is re-checked each trigger: a model
    * swapped under a running ingest fails the query loudly instead of
    * silently re-encoding later batches under a different quantizer.
    */
  def ingest(
      stream: DataFrame,
      dir: String,
      idCol: String,
      embCol: String,
      checkpoint: String,
      ratioThreshold: Double = 2.0
  ): StreamingQuery = {
    val spark = stream.sparkSession
    // fingerprint BEFORE load: if a refit lands between the two, the
    // first trigger's re-check reads the new bytes against the old
    // fingerprint and fails loudly — the reverse order would hold a
    // stale in-memory model behind a matching fingerprint, silently
    val frozen = modelFingerprint(spark, dir)
    val index = Ivfadc.load(spark, dir)
    stream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val now = modelFingerprint(b.sparkSession, dir)
        if (now != frozen)
          throw new IllegalStateException(
            s"IVFADC model at $dir/model changed under a running ingest " +
              s"(fingerprint $frozen at start, $now now) — the frozen-model contract " +
              "forbids mid-stream refits: stop the ingest, refit + re-save (or fold into " +
              "a fresh versioned dir), and restart the ingest against the new version")
        ingestBatch(b, id, dir, idCol, embCol, ratioThreshold, index)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The served view: base index + every committed delta, probed-
    * search ready (both halves keep their cell columns, so the
    * partition-pruning contract of a loaded index holds for the base
    * scan; delta scans are batch-sized).
    */
  def loadWithDeltas(spark: SparkSession, dir: String): Ivfadc.Index =
    loadWithDeltas(spark, dir, committedIds(spark, dir))

  /** The served view over an explicit committed-batch snapshot —
    * [[foldDeltas]] pins its snapshot through this. Only the named
    * batch directories are listed and footer-read (explicit paths +
    * basePath, never a whole-tree listing), so an uncommitted or
    * in-replay batch directory is never touched by the read at all —
    * no transient FileNotFound from a concurrent overwrite.
    */
  private def loadWithDeltas(
      spark: SparkSession, dir: String, committed: Seq[Long]): Ivfadc.Index = {
    val base = Ivfadc.load(spark, dir)
    if (committed.isEmpty) base
    else {
      def half(name: String): DataFrame =
        spark.read
          .option("basePath", s"$dir/delta/$name")
          .parquet(committed.map(id => s"$dir/delta/$name/batch_id=$id"): _*)
      base.copy(
        cells = base.cells.unionByName(
          half("cells").select(col("id"), col("cell").cast("int"))),
        enc = base.enc.unionByName(
          half("enc").select(col("id"), col("sub"), col("code"), col("cell").cast("int"))))
    }
  }

  /** All drift reports ingested so far, batch-stamped — the refit
    * scheduler's queue. Empty frame when no batch was drift-checked.
    */
  def driftLog(spark: SparkSession, dir: String): Option[DataFrame] =
    if (exists(spark, s"$dir/delta/drift")) Some(spark.read.parquet(s"$dir/delta/drift"))
    else None

  /** Compaction: rewrite base + committed deltas as a fresh index dir
    * (model unchanged — the stamp carries over, so the staged fit-time
    * baseline stays valid and is copied along with it).
    *
    * Fold-under-ingest safety: the committed-batch set is snapshotted
    * ONCE and the rewrite reads exactly that snapshot (explicit batch
    * paths — a batch committing concurrently is neither listed nor
    * half-read), and the snapshot is recorded under
    * `$outDir/folded_batches` BEFORE the index write: a fold that
    * crashes mid-way leaves a dir whose [[foldedBatches]] is complete
    * but whose model is absent, so `Ivfadc.load` fails loudly — the
    * reverse order would leave a loadable index with an EMPTY
    * snapshot, silently reporting every committed batch as unfolded
    * and inviting a duplicate-id replay. After the rewrite the
    * snapshot's commit markers are re-verified: a crash-replay of an
    * already-snapshotted batch drops its marker and overwrites its
    * part files WHILE the fold reads them, so a vanished marker means
    * the fold may hold a half-overwritten read — the partial target is
    * deleted and the fold fails loudly (re-run it once the replay has
    * re-committed). A caller swapping serving to the new dir uses
    * [[unfoldedBatches]] to find batches that landed after the
    * snapshot and replays them into the new version (or carries them
    * with [[carryUnfolded]]). The target must be a FRESH dir: folding
    * into an existing dir — above all the ingest dir itself — is
    * refused, because rewriting a live dir would race its readers and
    * its ingest (the caller-swaps versioning contract, now enforced).
    */
  def foldDeltas(spark: SparkSession, dir: String, outDir: String): Unit = {
    DeltaCommits.requireFreshTarget(spark, dir, outDir, "foldDeltas")
    val committed = committedIds(spark, dir).sorted
    DeltaCommits.writeSnapshot(spark, outDir, committed)
    Ivfadc.save(loadWithDeltas(spark, dir, committed), outDir)
    if (exists(spark, s"$dir/staleness"))
      spark.read.parquet(s"$dir/staleness").write.mode("overwrite").parquet(s"$outDir/staleness")
    DeltaCommits.verifySnapshotStillCommitted(spark, dir, committed, outDir)
  }

  /** The committed-batch snapshot a [[foldDeltas]] run folded — diff
    * the source dir's live commit set against this to find batches
    * that landed after the snapshot (they need a replay into the new
    * version before the old dir is dropped). Empty for a dir that was
    * never produced by foldDeltas.
    */
  def foldedBatches(spark: SparkSession, dir: String): Seq[Long] =
    DeltaCommits.foldedBatches(spark, dir)

  /** Batches committed in `dir` but present in `newDir` neither via
    * its folded snapshot nor as its own committed deltas — the replay
    * set a caller must close out (re-ingest or [[carryUnfolded]]) into
    * `newDir` before dropping `dir`. Empty means the close-out is
    * done, so replay/carry loops driven by this are idempotent.
    */
  def unfoldedBatches(spark: SparkSession, dir: String, newDir: String): Seq[Long] =
    DeltaCommits.unfoldedBatches(spark, dir, newDir)

  /** Close out a fold WITHOUT raw data: copy each [[unfoldedBatches]]
    * batch's committed, already-encoded delta partitions (and its
    * drift report, when one exists) from the old dir into the new
    * version, marker last — fold never changes the model (the stamp
    * carries over), so the old dir's encodings are valid verbatim in
    * the new one. This is the mechanical alternative to re-ingesting
    * the raw vectors, for streams that no longer retain them. Both
    * dirs' models are verified identical (by [[Ivfadc.modelId]], the
    * semantic identity — not file bytes) before anything is copied:
    * carrying encodings into a REFIT index would serve codes from the
    * wrong quantizer. Per-batch the copy follows the ingest commit
    * protocol (marker dropped first, re-created last), so a crash
    * mid-carry leaves the batch invisible in the new dir and a re-run
    * completes it. Returns the batch ids carried.
    */
  def carryUnfolded(spark: SparkSession, dir: String, newDir: String): Seq[Long] = {
    val todo = unfoldedBatches(spark, dir, newDir)
    if (todo.isEmpty) return todo
    val oldId = Ivfadc.modelId(Ivfadc.load(spark, dir))
    val newId = Ivfadc.modelId(Ivfadc.load(spark, newDir))
    require(oldId == newId,
      s"carryUnfolded: $newDir holds a DIFFERENT model than $dir ($newId vs $oldId) — " +
        "delta encodings are only valid under the quantizer that produced them; a refit " +
        "index needs the raw vectors re-ingested, not a carry")
    DeltaCommits.carry(spark, dir, newDir, Seq("enc", "cells", "drift"), todo)
  }

  private def exists(spark: SparkSession, path: String): Boolean =
    DeltaCommits.exists(spark, path)
}
