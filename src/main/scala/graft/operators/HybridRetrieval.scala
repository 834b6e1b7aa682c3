package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid (sparse ⊕ dense) retrieval with BOTH legs in their scale
  * form — the production composition of this repo's two flagship
  * retrieval operators:
  *
  *  - sparse: [[Bm25.topKPruned]] — WAND/max-score pruned keyword
  *    retrieval; candidate volume per query is ≤ cap·|terms| no
  *    matter how hot a term is, and the output is certified exact.
  *  - dense: [[Ivfadc.searchDf]] — probed IVFADC over a trained
  *    coarse+residual-PQ index; candidate work is nprobe·(N/cells)·m
  *    per query, queries never funnel through the driver.
  *
  * fused by reciprocal-rank fusion (Cormack et al. 2009),
  * `rrf = Σ_legs 1/(rrfK + rank)` — the published parameter-free
  * fusion. Ranks are integers, each RRF term is one IEEE division,
  * and the two-term sum is in literal leg order (sparse first), so
  * fused scores hash-replay exactly in any engine.
  *
  * Scale shape: each leg's per-query output is legK rows, so the
  * fusion join moves |Q|·legK rows per leg — sketch-sized relative to
  * the corpus — and shuffles on (qid, doc_id), never touching corpus
  * text or embeddings again. At 100 TB the legs dominate; both are
  * bounded by construction (see their scaladocs). The exact
  * brute-force baseline of this composition is q117 (corpus-scan
  * cosine + unpruned BM25); this operator is its scale path.
  */
object HybridRetrieval {

  /** RRF-fuse two ranked legs over (qid, doc_id, rank_sparse) and
    * (qid, doc_id, rank_dense): full-outer on (qid, doc_id) — a doc
    * ranked by one leg only still scores its one reciprocal term —
    * then re-rank by fused score, ties to the lower doc_id. Leg ranks
    * ride along as audit columns (null = the leg didn't rank it).
    */
  def fuseRrf(sparse: DataFrame, dense: DataFrame, k: Int, rrfK: Double = 60.0): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("rrf").desc, col("doc_id"))
    sparse
      .join(dense, Seq("qid", "doc_id"), "full_outer")
      .withColumn(
        "rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("rank_sparse")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("rank_dense")), lit(0.0)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("qid"), col("rank"), col("doc_id"),
        col("rank_sparse"), col("rank_dense"), col("rrf"))
  }

  /** Top-k hybrid retrieval: WAND BM25 over `docs` + probed IVFADC
    * over a fitted `index`, RRF-fused.
    *
    * @param termQueries (qid, terms) — the sparse side (see
    *                    [[Bm25.topK]] for the term contract)
    * @param queryEmb    (qidCol, qembCol) — the dense side; qids must
    *                    be the same id space as `termQueries` (cast to
    *                    int for the fusion join). Self-matches are NOT
    *                    excluded: query ids are assumed independent of
    *                    corpus ids (`excludeSelf = false`).
    * @param legK        per-leg depth fed to the fusion (each leg
    *                    returns its top legK per query)
    * @param k           fused results per query
    */
  def topK(
      docs: DataFrame,
      idCol: String,
      textCol: Column,
      termQueries: Seq[(Int, Seq[String])],
      index: Ivfadc.Index,
      queryEmb: DataFrame,
      qidCol: String,
      qembCol: String,
      k: Int = 10,
      legK: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      cap: Int = 100,
      nprobe: Int = 2,
      rrfK: Double = 60.0): DataFrame = {
    val sparse = Bm25
      .topKPruned(docs, idCol, textCol, termQueries, k1, b, legK, cap)
      .select(col("qid"), col("doc_id"), col("rank").as("rank_sparse"))
    val dense = Ivfadc
      .searchDf(index, queryEmb, qidCol, qembCol, nprobe, legK, excludeSelf = false)
      .select(
        col("qid").cast("int").as("qid"),
        col("nid").as("doc_id"),
        col("rank").as("rank_dense"))
    fuseRrf(sparse, dense, k, rrfK)
  }
}
