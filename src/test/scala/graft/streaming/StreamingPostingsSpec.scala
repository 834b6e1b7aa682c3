package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Bm25

/** Streaming sparse-index maintenance: the served view (base +
  * committed postings deltas) must rank BIT-identically to a
  * full-corpus Bm25.topK over the same documents — that is the whole
  * contract — plus the DeltaCommits discipline: crash invisibility,
  * replay idempotence, snapshot-first fold ordering, raw-free carry,
  * and the term-pruning serving layout of a folded base.
  */
class StreamingPostingsSpec extends SparkSpec {

  private val dir0 = "/root/testdata/sf0.001"

  private def docs: DataFrame = graft.tables.Tables.documents(spark, dir0)

  private val queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("batch", "scan"),
    2 -> Seq("customer", "stream", "query"),
    3 -> Seq("vector", "perplexity") // one corpus-absent term
  )

  private def batchOf(i: Int): DataFrame = docs.filter(pmod(col("doc_id"), lit(3)) === i)

  private def rowsOf(df: DataFrame): Seq[(Int, Int, Long, Double)] =
    df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def fullCorpus: Seq[(Int, Int, Long, Double)] =
    rowsOf(Bm25.topK(docs, "doc_id", col("text"), queries, k = 10))

  test("deltas-only served view ranks bit-identically to the full-corpus scan") {
    val dir = Files.createTempDirectory("graft_spost").toString + "/idx"
    (0 until 3).foreach(i =>
      StreamingPostings.ingestBatch(batchOf(i), i.toLong, dir, "doc_id", "text"))
    val served = rowsOf(StreamingPostings.search(StreamingPostings.load(spark, dir), queries))
    assert(served == fullCorpus, "served ranking diverged from the corpus scan")
  }

  test("an uncommitted batch is invisible; replay overwrites, never duplicates") {
    val dir = Files.createTempDirectory("graft_spost_crash").toString + "/idx"
    StreamingPostings.ingestBatch(batchOf(0), 0L, dir, "doc_id", "text")
    // worst crash: both halves fully written, marker (created last) missing
    val p = Bm25.buildPostings(batchOf(1), "doc_id", col("text"))
    p.write.mode("overwrite").parquet(s"$dir/delta/postings/batch_id=7")
    p.select(col("doc_id"), col("dl")).distinct()
      .write.mode("overwrite").parquet(s"$dir/delta/doclens/batch_id=7")
    val before = StreamingPostings.load(spark, dir)
    assert(before.doclens.count() == batchOf(0).count(), "uncommitted batch must not be served")
    // replay completes it; a second replay overwrites its own output
    StreamingPostings.ingestBatch(batchOf(1), 7L, dir, "doc_id", "text")
    StreamingPostings.ingestBatch(batchOf(1), 7L, dir, "doc_id", "text")
    val after = StreamingPostings.load(spark, dir)
    assert(after.doclens.count() == batchOf(0).count() + batchOf(1).count())
  }

  test("fold + raw-free carry serve the same ranking; snapshot and close-out bookkeeping hold") {
    val dir = Files.createTempDirectory("graft_spost_fold").toString + "/idx"
    (0 until 2).foreach(i =>
      StreamingPostings.ingestBatch(batchOf(i), i.toLong, dir, "doc_id", "text"))
    val out = Files.createTempDirectory("graft_spost_fold").toString + "/idx2"
    StreamingPostings.foldDeltas(spark, dir, out)
    assert(StreamingPostings.foldedBatches(spark, out) == Seq(0L, 1L))
    // the late batch commits in the OLD dir; its raw documents are then
    // gone — the carry moves the committed tokenized partitions instead
    StreamingPostings.ingestBatch(batchOf(2), 2L, dir, "doc_id", "text")
    assert(StreamingPostings.unfoldedBatches(spark, dir, out) == Seq(2L))
    assert(StreamingPostings.carryUnfolded(spark, dir, out) == Seq(2L))
    assert(StreamingPostings.unfoldedBatches(spark, dir, out) == Seq.empty)
    assert(StreamingPostings.carryUnfolded(spark, dir, out) == Seq.empty)
    val served = rowsOf(StreamingPostings.search(StreamingPostings.load(spark, out), queries))
    assert(served == fullCorpus, "fold+carry served ranking diverged from the corpus scan")
  }

  test("a fold that crashes before the base write fails loudly at load, snapshot complete") {
    val dir = Files.createTempDirectory("graft_spost_partial").toString + "/idx"
    StreamingPostings.ingestBatch(batchOf(0), 0L, dir, "doc_id", "text")
    val partial = Files.createTempDirectory("graft_spost_partial").toString + "/idx2"
    import spark.implicits._
    Seq(0L).toDF("batch_id").coalesce(1)
      .write.mode("errorifexists").parquet(s"$partial/folded_batches")
    assert(StreamingPostings.foldedBatches(spark, partial) == Seq(0L))
    val err = intercept[IllegalArgumentException] { StreamingPostings.load(spark, partial) }
    assert(err.getMessage.contains("neither a base nor any committed"), err.getMessage)
  }

  test("the folded base serves through a pushed term filter (the pruning layout)") {
    val dir = Files.createTempDirectory("graft_spost_plan").toString + "/idx"
    (0 until 2).foreach(i =>
      StreamingPostings.ingestBatch(batchOf(i), i.toLong, dir, "doc_id", "text"))
    val out = Files.createTempDirectory("graft_spost_plan").toString + "/idx2"
    StreamingPostings.foldDeltas(spark, dir, out)
    val plan = StreamingPostings.search(StreamingPostings.load(spark, out), queries)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"term filter not pushed to the postings scan:\n$plan")
  }

  test("the foreachBatch wrapper ingests a live stream; served == corpus scan") {
    val dir = Files.createTempDirectory("graft_spost_stream").toString + "/idx"
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val in = MemoryStream[(Long, String)]
    val q = StreamingPostings.ingest(
      in.toDF().toDF("doc_id", "text"), dir, "doc_id", "text",
      Files.createTempDirectory("graft_spost_ckpt").toString)
    try {
      val all = docs.select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val (a, b) = all.splitAt(all.length / 2)
      in.addData(a.toIndexedSeq)
      q.processAllAvailable()
      in.addData(b.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val served = rowsOf(StreamingPostings.search(StreamingPostings.load(spark, dir), queries))
    assert(served == fullCorpus, "streamed served ranking diverged from the corpus scan")
  }
}
