package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** The delta-commit substrate shared by the streaming index
  * maintainers ([[StreamingIndex]] dense, [[StreamingPostings]]
  * sparse): per-batch partition dirs made visible by a commit MARKER
  * (created last, dropped first on replay — so readers that resolve
  * visibility through [[committedIds]] see each batch either whole,
  * in its previous complete version, or not at all), a fold snapshot
  * recorded BEFORE the compacted artifact (a fold that crashes midway
  * leaves an unloadable dir with a complete snapshot — loud — never a
  * loadable one with an empty snapshot silently over-reporting the
  * replay set), and a marker-verified carry that moves committed
  * batch partitions between versioned dirs without the raw data.
  *
  * Layout under an index dir: `$dir/delta/<half>/batch_id=N` for each
  * data half, `$dir/delta/commits/batch_N` markers,
  * `$dir/folded_batches` the fold snapshot.
  */
private[streaming] object DeltaCommits {

  def fileSystem(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fileSystem(spark, path).exists(new HPath(path))

  def commitMarker(dir: String, batchId: Long): String =
    s"$dir/delta/commits/batch_$batchId"

  /** Batch ids whose commit marker exists — the only batches a served
    * view admits.
    */
  def committedIds(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new HPath(s"$dir/delta/commits")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p).toSeq
        .map(_.getPath.getName)
        .collect { case s if s.startsWith("batch_") => s.stripPrefix("batch_").toLong }
  }

  /** Run `writes` (the batch's partition overwrites) under the commit
    * protocol: marker dropped first — a replay makes the batch
    * invisible for its duration instead of serving a half-overwritten
    * mix — and re-created last, so the batch becomes visible only
    * complete.
    */
  def commit(spark: SparkSession, dir: String, batchId: Long)(writes: => Unit): Unit = {
    val fs = fileSystem(spark, dir)
    val marker = new HPath(commitMarker(dir, batchId))
    if (fs.exists(marker)) fs.delete(marker, false)
    writes
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
  }

  /** Record a fold's committed-batch snapshot under
    * `$outDir/folded_batches`. Called BEFORE the compacted artifact is
    * written (see the object scaladoc for the crash-ordering argument);
    * errorifexists because a fold target must be fresh.
    */
  def writeSnapshot(spark: SparkSession, outDir: String, committed: Seq[Long]): Unit = {
    import spark.implicits._
    committed.toDF("batch_id").coalesce(1)
      .write.mode("errorifexists").parquet(s"$outDir/folded_batches")
  }

  /** The committed-batch snapshot a fold recorded — empty for a dir
    * that was never produced by a fold.
    */
  def foldedBatches(spark: SparkSession, dir: String): Seq[Long] =
    if (!exists(spark, s"$dir/folded_batches")) Seq.empty
    else
      spark.read.parquet(s"$dir/folded_batches")
        .collect().map(_.getLong(0)).toSeq.sorted

  /** Batches committed in `dir` but present in `newDir` neither via
    * its folded snapshot nor as its own committed deltas — the replay
    * set a caller must close out (re-ingest or carry) into `newDir`
    * before dropping `dir`. Empty means the close-out is done, so
    * replay/carry loops driven by this are idempotent.
    */
  def unfoldedBatches(spark: SparkSession, dir: String, newDir: String): Seq[Long] =
    (committedIds(spark, dir).toSet --
      foldedBatches(spark, newDir).toSet --
      committedIds(spark, newDir).toSet).toSeq.sorted

  /** Post-fold marker re-verify (the crash-replay race): every batch
    * in the fold's snapshot must still be committed AFTER the rewrite
    * finished reading it — a marker dropped mid-fold means an ingest
    * replay overwrote that batch's part files under the read. Deletes
    * the partial target and fails loudly when any vanished.
    */
  def verifySnapshotStillCommitted(
      spark: SparkSession, dir: String, snapshot: Seq[Long], outDir: String): Unit = {
    val vanished = snapshot.toSet -- committedIds(spark, dir).toSet
    if (vanished.nonEmpty) {
      fileSystem(spark, outDir).delete(new HPath(outDir), true)
      throw new IllegalStateException(
        s"fold: batches ${vanished.toSeq.sorted.mkString(", ")} lost their commit markers " +
          s"while the fold read them (an ingest replay of already-committed batches ran " +
          s"concurrently) — the partial target $outDir was deleted; re-run the fold once " +
          "the replay has re-committed")
    }
  }

  /** Copy each `todo` batch's committed delta partitions (the named
    * `halves`, skipping absent ones) from `dir` into `newDir`, marker
    * last — the raw-data-free fold close-out. Per-batch the copy
    * follows the ingest commit protocol, so a crash mid-carry leaves
    * the batch invisible in the new dir and a re-run completes it.
    */
  def carry(
      spark: SparkSession, dir: String, newDir: String,
      halves: Seq[String], todo: Seq[Long]): Seq[Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcFs = fileSystem(spark, dir)
    val dstFs = fileSystem(spark, newDir)
    todo.foreach { id =>
      val marker = new HPath(commitMarker(newDir, id))
      if (dstFs.exists(marker)) dstFs.delete(marker, false)
      halves.foreach { half =>
        val src = new HPath(s"$dir/delta/$half/batch_id=$id")
        if (srcFs.exists(src)) {
          val dst = new HPath(s"$newDir/delta/$half/batch_id=$id")
          if (dstFs.exists(dst)) dstFs.delete(dst, true)
          dstFs.mkdirs(dst.getParent)
          org.apache.hadoop.fs.FileUtil.copy(srcFs, src, dstFs, dst, false, conf)
        }
      }
      dstFs.mkdirs(marker.getParent)
      dstFs.create(marker, true).close()
    }
    todo
  }

  /** The fold-target freshness contract shared by the folds: a FRESH
    * dir, never the source itself.
    */
  def requireFreshTarget(spark: SparkSession, dir: String, outDir: String, op: String): Unit = {
    val fs = fileSystem(spark, outDir)
    val out = fs.makeQualified(new HPath(outDir))
    val in = fileSystem(spark, dir).makeQualified(new HPath(dir))
    require(out != in,
      s"$op target equals the source dir ($in) — compaction writes a FRESH versioned dir " +
        "and the caller swaps serving to it; an in-place rewrite would race the dir's own " +
        "readers and ingest")
    require(!fs.exists(out),
      s"$op target $out already exists — refusing to compact into a live dir " +
        "(fold writes a fresh version; swap serving to it, then drop the old)")
  }
}
