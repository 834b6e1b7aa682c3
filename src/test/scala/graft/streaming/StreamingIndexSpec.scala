package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Ivfadc

/** Streaming index ingest: delta exactly-once (replay overwrites its
  * own partitions), served-view equality with the in-memory append
  * path, crash invisibility (per-batch commit marker: created last,
  * dropped first), drift logging, compaction with the fold-under-
  * ingest fence + snapshot record, the frozen-model swap guard, and
  * the foreachBatch wrapper end-to-end.
  */
class StreamingIndexSpec extends SparkSpec {

  private val dir0 = "/root/testdata/sf0.001"

  private def emb: DataFrame =
    graft.tables.Tables.embeddings(spark, dir0).selectExpr(
      "vec_id as id", "transform(embedding, x -> cast(x as double)) as e")

  private def freshIndexDir(): (String, Ivfadc.Index) = {
    val dir = Files.createTempDirectory("graft_sidx").toString + "/idx"
    val base = emb.filter(col("id") < 40)
    val idx = Ivfadc.fit(base, "id", "e", coarseK = 8, coarseIters = 2, m = 4, pqK = 4, pqIters = 1)
    Ivfadc.save(idx, dir, Some(base))
    (dir, Ivfadc.load(spark, dir))
  }

  private def counts(i: Ivfadc.Index): (Long, Long) = (i.cells.count(), i.enc.count())

  test("deltas serve exactly the in-memory append result; replay is idempotent") {
    val (dir, loaded) = freshIndexDir()
    val b1 = emb.filter(col("id") >= 40 && col("id") < 50)
    val b2 = emb.filter(col("id") >= 50 && col("id") < 60)
    StreamingIndex.ingestBatch(b1, 0L, dir, "id", "e")
    StreamingIndex.ingestBatch(b2, 1L, dir, "id", "e")

    val merged = StreamingIndex.loadWithDeltas(spark, dir)
    val inMem = Ivfadc.append(Ivfadc.append(loaded, b1, "id", "e"), b2, "id", "e")
    def cellRows(i: Ivfadc.Index) =
      i.cells.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    def encRows(i: Ivfadc.Index) =
      i.enc.select("id", "sub", "code").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(cellRows(merged) == cellRows(inMem))
    assert(encRows(merged) == encRows(inMem))

    // the served view answers probed searches: an appended vector finds
    // itself (all cells probed, self kept)
    val q = emb.filter(col("id") === 55).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    val hit = Ivfadc.search(merged, q, nprobe = 8, k = 1, excludeSelf = false)
      .select("nid").collect().map(_.getLong(0))
    assert(hit.sameElements(Array(55L)), s"appended vector not served: ${hit.toSeq}")

    // replay b1 under the same batch id: overwrite, not duplicate (the
    // overwrite rewrites part files, so the served view is re-LOADED —
    // a frame from before the replay holds the old file listing by
    // design: loaders pick up deltas at load time, like any parquet)
    StreamingIndex.ingestBatch(b1, 0L, dir, "id", "e")
    assert(counts(StreamingIndex.loadWithDeltas(spark, dir)) == counts(inMem))
  }

  test("an uncommitted batch (crash before the marker) is invisible; replay completes it") {
    val (dir, loaded) = freshIndexDir()
    val b = emb.filter(col("id") >= 40 && col("id") < 45)
    // simulate the worst crash: BOTH delta halves fully written, the
    // commit marker (created last) missing
    val (cells, enc) = Ivfadc.encodeBatch(loaded, b, "id", "e")
    enc.write.mode("overwrite").parquet(s"$dir/delta/enc/batch_id=9")
    cells.write.mode("overwrite").parquet(s"$dir/delta/cells/batch_id=9")
    val (c0, e0) = counts(Ivfadc.load(spark, dir))
    assert(counts(StreamingIndex.loadWithDeltas(spark, dir)) == ((c0, e0)),
      "uncommitted batch must not be served")
    StreamingIndex.ingestBatch(b, 9L, dir, "id", "e")
    assert(counts(StreamingIndex.loadWithDeltas(spark, dir)) == ((c0 + 5, e0 + 5 * 4)))
  }

  test("drifted batches ingest AND log; clean batches log undrifted") {
    val (dir, _) = freshIndexDir()
    val clean = emb.filter(col("id") >= 40 && col("id") < 50)
    val drifted = emb.filter(col("id") >= 50 && col("id") < 60)
      .select(col("id"), transform(col("e"), x => x + lit(0.25)).as("e"))
    StreamingIndex.ingestBatch(clean, 0L, dir, "id", "e")
    StreamingIndex.ingestBatch(drifted, 1L, dir, "id", "e")
    val log = StreamingIndex.driftLog(spark, dir).get
    val byBatch = log.groupBy(col("batch_id").cast("long").as("batch_id"))
      .agg(sum(when(col("drifted"), 1).otherwise(0)).as("n_drifted"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byBatch(1L) > 0, s"drifted batch not flagged: $byBatch")
    // both batches are in the served view regardless of the verdict
    assert(counts(StreamingIndex.loadWithDeltas(spark, dir))._1 == 40 + 20)
  }

  test("foldDeltas rewrites a fresh equivalent index; the baseline survives with its stamp") {
    val (dir, _) = freshIndexDir()
    val b = emb.filter(col("id") >= 40 && col("id") < 50)
    StreamingIndex.ingestBatch(b, 0L, dir, "id", "e")
    val out = Files.createTempDirectory("graft_sidx_fold").toString + "/idx2"
    StreamingIndex.foldDeltas(spark, dir, out)
    val folded = Ivfadc.load(spark, out)
    assert(counts(folded) == counts(StreamingIndex.loadWithDeltas(spark, dir)))
    // driftCheck against the folded dir verifies the copied stamp
    val report = Ivfadc.driftCheck(folded, out, b, "id", "e")
    assert(report.count() > 0)
  }

  test("foldDeltas refuses the source dir and any existing dir as target") {
    val (dir, _) = freshIndexDir()
    StreamingIndex.ingestBatch(emb.filter(col("id") >= 40 && col("id") < 45), 0L, dir, "id", "e")
    val selfErr = intercept[IllegalArgumentException] {
      StreamingIndex.foldDeltas(spark, dir, dir)
    }
    assert(selfErr.getMessage.contains("FRESH"), selfErr.getMessage)
    val existing = Files.createTempDirectory("graft_sidx_live").toString
    val liveErr = intercept[IllegalArgumentException] {
      StreamingIndex.foldDeltas(spark, dir, existing)
    }
    assert(liveErr.getMessage.contains("already exists"), liveErr.getMessage)
  }

  test("fold under ingest: snapshot folds only committed batches, records them, replay closes the gap") {
    val (dir, loaded) = freshIndexDir()
    val b1 = emb.filter(col("id") >= 40 && col("id") < 45)
    val b2 = emb.filter(col("id") >= 45 && col("id") < 50)
    val b3 = emb.filter(col("id") >= 50 && col("id") < 55)
    StreamingIndex.ingestBatch(b1, 0L, dir, "id", "e")
    StreamingIndex.ingestBatch(b2, 1L, dir, "id", "e")
    // batch 2 is mid-write when the fold starts: both halves landed,
    // marker (created last) not yet — the fold's snapshot must neither
    // list nor read it
    val (cells3, enc3) = Ivfadc.encodeBatch(loaded, b3, "id", "e")
    enc3.write.mode("overwrite").parquet(s"$dir/delta/enc/batch_id=2")
    cells3.write.mode("overwrite").parquet(s"$dir/delta/cells/batch_id=2")
    val out = Files.createTempDirectory("graft_sidx_fence").toString + "/idx2"
    StreamingIndex.foldDeltas(spark, dir, out)
    assert(counts(Ivfadc.load(spark, out)) == ((40L + 10, (40L + 10) * 4)),
      "fold must contain base + exactly the committed snapshot")
    assert(StreamingIndex.foldedBatches(spark, out) == Seq(0L, 1L))
    // the in-flight batch commits in the old dir after the snapshot;
    // the recorded snapshot makes it detectable and replayable
    StreamingIndex.ingestBatch(b3, 2L, dir, "id", "e")
    assert(StreamingIndex.unfoldedBatches(spark, dir, out) == Seq(2L))
    StreamingIndex.ingestBatch(b3, 2L, out, "id", "e")
    assert(
      counts(StreamingIndex.loadWithDeltas(spark, out)) ==
        counts(StreamingIndex.loadWithDeltas(spark, dir)))
    // the replayed batch is committed in out's own delta tree, so the
    // replay set reads empty — close-out loops driven by it terminate
    assert(StreamingIndex.unfoldedBatches(spark, dir, out) == Seq.empty)
    assert(StreamingIndex.unfoldedBatches(spark, out, out) == Seq.empty)
  }

  test("carryUnfolded closes out a fold without the raw vectors; idempotent; refit-guarded") {
    val (dir, _) = freshIndexDir()
    val b1 = emb.filter(col("id") >= 40 && col("id") < 45)
    val b2 = emb.filter(col("id") >= 45 && col("id") < 50)
    StreamingIndex.ingestBatch(b1, 0L, dir, "id", "e")
    val out = Files.createTempDirectory("graft_sidx_carry").toString + "/idx2"
    StreamingIndex.foldDeltas(spark, dir, out)
    // batch 1 lands in the OLD dir after the fold; its raw vectors are
    // then gone — the carry moves the committed encodings instead
    StreamingIndex.ingestBatch(b2, 1L, dir, "id", "e")
    assert(StreamingIndex.carryUnfolded(spark, dir, out) == Seq(1L))
    assert(
      counts(StreamingIndex.loadWithDeltas(spark, out)) ==
        counts(StreamingIndex.loadWithDeltas(spark, dir)))
    // the carried batch serves: a b2 vector finds itself in the new dir
    val q = emb.filter(col("id") === 47).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    val hit = Ivfadc.search(
      StreamingIndex.loadWithDeltas(spark, out), q, nprobe = 8, k = 1, excludeSelf = false)
      .select("nid").collect().map(_.getLong(0))
    assert(hit.sameElements(Array(47L)), s"carried vector not served: ${hit.toSeq}")
    // drift reports ride along (freshIndexDir stages a baseline)
    val drifted = StreamingIndex.driftLog(spark, out).get
      .select(col("batch_id").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    assert(drifted.contains(1L), s"carried batch's drift report missing: $drifted")
    // idempotent: nothing left to carry
    assert(StreamingIndex.carryUnfolded(spark, dir, out) == Seq.empty)
    assert(StreamingIndex.unfoldedBatches(spark, dir, out) == Seq.empty)
    // refit guard: a target holding a DIFFERENT model refuses the carry
    // (encodings are only valid under the quantizer that produced them)
    val other = Files.createTempDirectory("graft_sidx_refit").toString + "/idx3"
    val refit = Ivfadc.fit(
      emb.filter(col("id") < 30), "id", "e", coarseK = 4, coarseIters = 1, m = 4, pqK = 4,
      pqIters = 1)
    Ivfadc.save(refit, other)
    StreamingIndex.ingestBatch(b2, 7L, dir, "id", "e")
    val err = intercept[IllegalArgumentException] {
      StreamingIndex.carryUnfolded(spark, dir, other)
    }
    assert(err.getMessage.contains("DIFFERENT model"), err.getMessage)
  }

  test("a fold that crashes before the index write fails loudly at load, with the snapshot complete") {
    val (dir, _) = freshIndexDir()
    StreamingIndex.ingestBatch(emb.filter(col("id") >= 40 && col("id") < 45), 0L, dir, "id", "e")
    // simulate the crash window foldDeltas' write order leaves: the
    // folded_batches snapshot landed (written FIRST), the index did not
    val partial = Files.createTempDirectory("graft_sidx_partial").toString + "/idx2"
    import spark.implicits._
    Seq(0L).toDF("batch_id").coalesce(1)
      .write.mode("errorifexists").parquet(s"$partial/folded_batches")
    // the snapshot is visible and complete — never an empty replay set…
    assert(StreamingIndex.foldedBatches(spark, partial) == Seq(0L))
    assert(StreamingIndex.unfoldedBatches(spark, dir, partial) == Seq.empty)
    // …and the dir is not silently servable: loading it fails loudly
    intercept[Exception] { Ivfadc.load(spark, partial) }
  }

  test("a model swapped under a running ingest fails the query loudly") {
    val (dir, _) = freshIndexDir()
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamingIndex.ingest(
      in.toDF().toDF("id", "e"), dir, "id", "e",
      Files.createTempDirectory("graft_sidx_swap_ckpt").toString)
    def rows(lo: Long, hi: Long) = emb.filter(col("id") >= lo && col("id") < hi).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toIndexedSeq
    try {
      in.addData(rows(40, 43))
      q.processAllAvailable()
      // swap the model under the running query: rewrite the staged
      // model file bytes (what a refit + re-save over the dir does)
      val conf = spark.sparkContext.hadoopConfiguration
      val modelDir = new org.apache.hadoop.fs.Path(s"$dir/model")
      val fs = modelDir.getFileSystem(conf)
      val part = fs.listStatus(modelDir).map(_.getPath)
        .filter(p => p.getName.startsWith("part-")).head
      val bytes = {
        val inS = fs.open(part)
        try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(inS, out, 8192, false)
          out.toByteArray
        } finally inS.close()
      }
      val outS = fs.create(part, true)
      try { outS.write(bytes); outS.write('\n') } finally outS.close()
      in.addData(rows(43, 46))
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
      assert(chain(err).exists(c =>
        c.isInstanceOf[IllegalStateException] &&
          c.getMessage.contains("frozen-model")), s"unexpected failure chain: $err")
    } finally q.stop()
    // the poisoned batch never committed: only batch 0 is served
    assert(counts(StreamingIndex.loadWithDeltas(spark, dir))._1 == 40 + 3)
  }

  test("the foreachBatch wrapper ingests a live stream exactly once") {
    val (dir, _) = freshIndexDir()
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamingIndex.ingest(
      in.toDF().toDF("id", "e"), dir, "id", "e",
      Files.createTempDirectory("graft_sidx_ckpt").toString)
    try {
      val rows = emb.filter(col("id") >= 40 && col("id") < 46).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      in.addData(rows.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    assert(counts(StreamingIndex.loadWithDeltas(spark, dir))._1 == 40 + 6)
  }
}
