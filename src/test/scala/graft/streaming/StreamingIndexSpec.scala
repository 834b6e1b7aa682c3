package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Ivfadc

/** Streaming index ingest: delta exactly-once (replay overwrites its
  * own partitions), served-view equality with the in-memory append
  * path, crash half-visibility (enc-before-cells commit order), drift
  * logging, compaction, and the foreachBatch wrapper end-to-end.
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
