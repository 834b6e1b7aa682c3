package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Bm25

/** Streaming maintenance of the SPARSE retrieval index — the BM25/
  * WAND stack's staged inverted index ([[Bm25.buildPostings]] +
  * [[Bm25.docLengths]]) kept fresh by micro-batch, the
  * [[StreamingIndex]] discipline applied to postings (round-14
  * verdict #5: the dense half streamed, the sparse half rebuilt per
  * call — this closes the retrieval lifecycle symmetrically):
  *
  *   1. each batch of documents is tokenized EXACTLY as every batch
  *      query path ([[Bm25.base]]'s lower/trim/split — the
  *      tokenization is code, not a fitted model, so there is no
  *      frozen-model fingerprint to guard: any ingest ever produces
  *      the same rows for the same text),
  *   2. the batch's partial postings (doc_id, dl, term, tf) and
  *      doclens (doc_id, dl) land as `batch_id=N` delta partitions
  *      (OVERWRITE mode — replay-idempotent) and become VISIBLE only
  *      when the batch's commit marker lands ([[DeltaCommits]]:
  *      created last, dropped first on replay),
  *   3. [[load]] serves base + committed deltas; df and the corpus
  *      stats (N, Σdl) are NOT persisted — df is a term-window count
  *      over the query's own filtered postings and stats one
  *      aggregate over doclens, both computed at serve time over the
  *      union, because both are GLOBAL quantities a per-batch
  *      materialization would have to re-merge anyway (and getting
  *      them from the served union keeps index-served scores
  *      bit-identical to a full-corpus [[Bm25.topK]], spec-pinned).
  *
  * [[foldDeltas]] is the compaction cadence (snapshot-first crash
  * ordering, marker re-verify, fresh versioned target — the
  * [[DeltaCommits]] contract); [[carryUnfolded]] closes out a fold
  * without raw documents by copying committed delta partitions (no
  * model means no refit guard — postings are valid under any version
  * of the index). The folded base is term-repartitioned and term-
  * sorted within partitions, so a serving query's term filter prunes
  * row groups (and, at 100 TB with one file per term range, files):
  * the hot path reads the queried terms' postings, never the corpus.
  *
  * Doc ids must be unique across the whole stream (exact-dedup
  * upstream) — same contract as [[graft.operators.Ivfadc.append]]:
  * a re-ingested document would double-count in df, N and Σdl.
  */
object StreamingPostings {

  /** The served sparse index: `postings` (doc_id, dl, term, tf) and
    * `doclens` (doc_id, dl) — base + committed deltas.
    */
  final case class SparseIndex(postings: DataFrame, doclens: DataFrame)

  /** One micro-batch: tokenize under the shared [[Bm25]] tokenization
    * and land both halves under the commit protocol. Batch-mode / test
    * entry point and the `foreachBatch` body.
    */
  def ingestBatch(
      batch: DataFrame,
      batchId: Long,
      dir: String,
      idCol: String,
      textCol: String): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // the tokenize+explode+groupBy lineage feeds both halves; persist
    // for the batch's duration so it runs once (the StreamingIndex
    // residual-prefix rationale)
    val toks = Bm25.buildPostings(batch, idCol, col(textCol)).persist()
    try {
      DeltaCommits.commit(spark, dir, batchId) {
        toks.write.mode("overwrite").parquet(s"$dir/delta/postings/batch_id=$batchId")
        toks.select(col("doc_id"), col("dl")).distinct()
          .write.mode("overwrite").parquet(s"$dir/delta/doclens/batch_id=$batchId")
      }
    } finally { toks.unpersist(blocking = false); () }
  }

  /** Start the streaming ingest: (idCol, textCol) document rows → the
    * index dir's delta partitions, exactly-once per micro-batch.
    */
  def ingest(
      stream: DataFrame,
      dir: String,
      idCol: String,
      textCol: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) => ingestBatch(b, id, dir, idCol, textCol) }
      .option("checkpointLocation", checkpoint)
      .start()

  /** The served view: base (when one exists — a never-folded dir is
    * deltas-only) + every committed delta. Only committed batch
    * directories are listed and footer-read (explicit paths +
    * basePath — an uncommitted or in-replay batch is never touched).
    */
  def load(spark: SparkSession, dir: String): SparseIndex =
    load(spark, dir, DeltaCommits.committedIds(spark, dir))

  private def load(spark: SparkSession, dir: String, committed: Seq[Long]): SparseIndex = {
    def half(name: String, cols: Seq[String]): DataFrame = {
      val base =
        if (DeltaCommits.exists(spark, s"$dir/base/$name"))
          Some(spark.read.parquet(s"$dir/base/$name"))
        else None
      val delta =
        if (committed.isEmpty) None
        else
          Some(
            spark.read
              .option("basePath", s"$dir/delta/$name")
              .parquet(committed.map(id => s"$dir/delta/$name/batch_id=$id"): _*))
      val frames = (base.toSeq ++ delta.toSeq).map(_.select(cols.map(col): _*))
      require(frames.nonEmpty,
        s"StreamingPostings.load: $dir holds neither a base nor any committed delta " +
          "batches — nothing to serve (did the fold target get swapped in before any " +
          "ingest committed?)")
      frames.reduce(_ unionByName _)
    }
    SparseIndex(
      half("postings", Seq("doc_id", "dl", "term", "tf")),
      half("doclens", Seq("doc_id", "dl")))
  }

  /** BM25 top-k from the served view — [[Bm25.topKFromIndex]], so
    * rankings are bit-identical to a full-corpus [[Bm25.topK]] over
    * the same documents.
    */
  def search(
      index: SparseIndex,
      queries: Seq[(Int, Seq[String])],
      k1: Double = 1.2,
      b: Double = 0.75,
      k: Int = 10): DataFrame =
    Bm25.topKFromIndex(index.postings, index.doclens, queries, k1, b, k)

  /** Compaction: rewrite base + committed deltas as a fresh versioned
    * dir's base. Same crash ordering as [[StreamingIndex.foldDeltas]]
    * (snapshot recorded FIRST; a fold that dies mid-way leaves a dir
    * [[load]] refuses loudly, never one silently over-reporting the
    * replay set) and the same post-read marker re-verify. The folded
    * postings are repartitioned BY TERM and term-sorted within
    * partitions — the serving layout: a query's term filter prunes to
    * the queried terms' row groups instead of scanning the corpus's
    * postings.
    */
  def foldDeltas(spark: SparkSession, dir: String, outDir: String): Unit = {
    DeltaCommits.requireFreshTarget(spark, dir, outDir, "foldDeltas")
    val committed = DeltaCommits.committedIds(spark, dir).sorted
    DeltaCommits.writeSnapshot(spark, outDir, committed)
    val served = load(spark, dir, committed)
    served.postings
      // REBALANCE, not repartition(col): same term-clustered layout,
      // but AQE sizes the partition count from the data (advisory
      // partition bytes) instead of pinning it to
      // spark.sql.shuffle.partitions — a tiny fold writes one file, a
      // 100 TB fold writes ~advisory-sized term-range files (guide
      // §6: coalesce on write), with row-group pruning unchanged.
      .hint("rebalance", col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("errorifexists").parquet(s"$outDir/base/postings")
    served.doclens
      .write.mode("errorifexists").parquet(s"$outDir/base/doclens")
    DeltaCommits.verifySnapshotStillCommitted(spark, dir, committed, outDir)
  }

  /** The committed-batch snapshot a fold recorded (empty for a
    * never-folded dir).
    */
  def foldedBatches(spark: SparkSession, dir: String): Seq[Long] =
    DeltaCommits.foldedBatches(spark, dir)

  /** Batches committed in `dir` but absent from `newDir` (snapshot
    * AND its own deltas) — empty means the close-out is done.
    */
  def unfoldedBatches(spark: SparkSession, dir: String, newDir: String): Seq[Long] =
    DeltaCommits.unfoldedBatches(spark, dir, newDir)

  /** Close out a fold without the raw documents: copy committed,
    * already-tokenized delta partitions old→new, markers last. No
    * model, no refit guard — postings are tokenization, not a fit.
    */
  def carryUnfolded(spark: SparkSession, dir: String, newDir: String): Seq[Long] =
    DeltaCommits.carry(
      spark, dir, newDir, Seq("postings", "doclens"),
      unfoldedBatches(spark, dir, newDir))
}
