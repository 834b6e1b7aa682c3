package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Pinned.PinOps

/** Okapi BM25 top-k keyword retrieval over an inverted index — the
  * sparse-retrieval complement of the dense ANN family (q40-q44,
  * q100-q102) and of q90's pairwise tf-idf similarity: here the left
  * side is a QUERY SET, not the corpus, so no document pair ever
  * materializes and the per-term work is one posting row per matching
  * document.
  *
  * Determinism: the classic idf is `ln((N-df+0.5)/(df+0.5)+1)`, but ln
  * is not bit-defined across engines (see the q27 note — only sqrt is
  * correctly-rounded everywhere), so scoring uses the log-free
  * rational idf `(N-df+0.5)/(df+0.5)` — per term a monotone transform
  * of the classic weight, so single-term rankings are identical and
  * multi-term rankings equivalent in spirit while every arithmetic
  * step (mul/div/add of identical IEEE operands) is bit-identical in
  * any engine. Per-document scores sum query-term slots in FIXED slot
  * order (a pivot, never a partition-ordered SUM), the same guard the
  * ADC distance sums use.
  *
  * Scale shape: query terms are a broadcast literal; the corpus-stats
  * row (N, Σdl) is a 1-row broadcast cross join; postings are filtered
  * to query terms BEFORE the explode/groupBy so only matching tokens
  * ever shuffle; df rides a window over the term partitioning that the
  * groupBy just established (no second exchange). Top-k per query is a
  * rank window -> WindowGroupLimit pushes the limit map-side. At
  * production scale the posting build is a staged inverted index and
  * hot terms get impact-ordered pruning (WAND) — the df math here is
  * the exact form; the cap knob mirrors q90's posting df cap.
  */
object Bm25 {

  /** Tokenized corpus projection: (doc_id, toks, dl). The tokenize +
    * downstream explode is every BM25 path's per-row hot stage —
    * floor the scan's parallelism (TextGroups.fanOut: identity at
    * production scale, a one-time hash repartition when a small
    * unsplittable scan would run it near-serially; round 15).
    */
  private def base(docs: DataFrame, idCol: String, textCol: Column): DataFrame =
    TextGroups
      .fanOut(docs.select(col(idCol).as("doc_id"), textCol.as("_tx")), col("doc_id"))
      .select(col("doc_id"), split(trim(lower(col("_tx"))), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))

  private def validate(queries: Seq[(Int, Seq[String])]): Unit = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty), "queries must be non-empty")
    queries.foreach { case (qid, ts) =>
      require(
        ts.distinct == ts,
        s"query $qid repeats a term (${ts.mkString(", ")}) — each slot scores " +
          "independently, so duplicates would double-count; dedup the terms")
      require(
        ts.forall(t => t == t.toLowerCase),
        s"query $qid has a non-lowercase term (${ts.mkString(", ")}) — the corpus is " +
          "lowered before tokenizing, so mixed-case terms silently match nothing")
    }
  }

  /** The rational-idf BM25 contribution of one posting row — THE
    * hash-gate-critical arithmetic, factored once so the exact IEEE
    * op order can never drift between the first-pass/pruned path and
    * the RM3 second pass (each has a DuckDB twin mirroring this tree).
    * Expects an `n_docs` column in scope (the 1-row stats broadcast).
    */
  private def contribExpr(
      tfc: Column, dfc: Column, dlc: Column, avgdl: Column, k1: Double, b: Double): Column =
    ((col("n_docs").cast("double") - dfc + lit(0.5)) /
      (dfc.cast("double") + lit(0.5))) *
      ((tfc.cast("double") * lit(k1 + 1.0)) /
        (tfc.cast("double") +
          lit(k1) * (lit(1.0) - lit(b) + (lit(b) * dlc.cast("double")) / avgdl)))

  /** Full inverted-index build over EVERY token: (doc_id, dl, term,
    * tf) — the persisted half of a staged sparse index (the "staged
    * inverted index" the [[topK]] scaladoc promises at production
    * scale; [[graft.streaming.StreamingPostings]] maintains it
    * incrementally). One shuffle; same tokenization as every query
    * path here, so index-served scores are bit-identical to the
    * corpus-scan forms.
    */
  def buildPostings(docs: DataFrame, idCol: String, textCol: Column): DataFrame =
    base(docs, idCol, textCol)
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** The corpus-stats half of a staged sparse index: (doc_id, dl),
    * one row per document — docs whose every term is absent from a
    * query still count toward N and Σdl, so df/idf and avgdl need
    * this table, not the postings' distinct doc set.
    */
  def docLengths(docs: DataFrame, idCol: String, textCol: Column): DataFrame =
    base(docs, idCol, textCol).select(col("doc_id"), col("dl"))

  /** Per-(qid, slot, doc) posting rows from a prebuilt (tf, stats)
    * pair — the shared scoring substrate of the corpus-scan paths
    * ([[topK]]/[[topKPruned]]/[[pairScores]]) and the index-served
    * path ([[topKFromIndex]]): one expression tree, so the two are
    * bit-identical by construction.
    */
  private def queryPostingsFrom(
      tf: DataFrame,
      stats: DataFrame,
      queries: Seq[(Int, Seq[String])],
      k1: Double,
      b: Double): DataFrame = {
    val spark = tf.sparkSession
    import spark.implicits._
    // df = docs-per-term: one posting row per (doc, term), so a count
    // over the term window IS the document frequency — and the window
    // reuses the partitioning the posting build just established.
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("s", contribExpr(col("tf"), col("df"), col("dl"), col("avgdl"), k1, b))
    val qterms = queries.flatMap { case (qid, ts) =>
      ts.zipWithIndex.map { case (t, i) => (qid, i, t) }
    }
    val qdf = broadcast(qterms.toDF("qid", "slot", "term"))
    scored.join(qdf, "term")
  }

  /** Per-(qid, slot, doc) posting rows carrying the term's BM25
    * contribution `s` and the term's document frequency `df` — the
    * shared substrate of [[topK]] and [[topKPruned]].
    */
  private def queryPostings(
      docs: DataFrame,
      idCol: String,
      textCol: Column,
      queries: Seq[(Int, Seq[String])],
      k1: Double,
      b: Double): DataFrame = {
    val corpus = base(docs, idCol, textCol)
    val allTerms = queries.flatMap(_._2).distinct
    // ONE aggregate for (N, Σdl); joined as a 1-row broadcast so avgdl
    // is a scalar everywhere without a driver collect.
    val stats = corpus.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = corpus
      .select(
        col("doc_id"),
        col("dl"),
        explode(filter(col("toks"), t => t.isInCollection(allTerms))).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    queryPostingsFrom(tf, stats, queries, k1, b)
  }

  /** [[topK]] served from a STAGED index — (postings, doclens) as
    * built by [[buildPostings]]/[[docLengths]] (or their streaming
    * base+delta union) — instead of a corpus scan. The postings scan
    * filters to query terms (a pushed parquet filter on a staged
    * table, so hot-term row groups are all that's read; at 100 TB the
    * staged table is term-repartitioned so the filter prunes files,
    * not just row groups), stats are ONE aggregate over the doclens
    * table, and everything downstream is the corpus-scan paths'
    * expression tree verbatim — served rankings are bit-identical to
    * `topK(docs, …)` over the same corpus (spec-pinned).
    */
  def topKFromIndex(
      postings: DataFrame,
      doclens: DataFrame,
      queries: Seq[(Int, Seq[String])],
      k1: Double = 1.2,
      b: Double = 0.75,
      k: Int = 10): DataFrame = {
    validate(queries)
    val allTerms = queries.flatMap(_._2).distinct
    val maxTerms = queries.map(_._2.size).max
    val stats = doclens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = postings
      .filter(col("term").isInCollection(allTerms))
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
    val qpost = queryPostingsFrom(tf, stats, queries, k1, b)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    pivotScore(qpost, maxTerms)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("score"))
  }

  /** Per-(qid, doc) score from posting rows: fixed query-term slots
    * pivoted with MAX(CASE) and summed in literal slot order — never a
    * partition-ordered double SUM (the hash-portability guard).
    */
  private def pivotScore(qpost: DataFrame, maxTerms: Int): DataFrame = {
    val slots = (0 until maxTerms).map(i => max(when(col("slot") === i, col("s"))).as(s"_s$i"))
    val score = (0 until maxTerms).foldLeft(lit(0.0)) { (acc, i) =>
      acc + coalesce(col(s"_s$i"), lit(0.0))
    }
    qpost
      .groupBy(col("qid"), col("doc_id"))
      .agg(slots.head, slots.tail: _*)
      .withColumn("score", score)
  }

  /** Top-k documents per query, BM25-scored (rational-idf variant).
    *
    * @param queries (qid, terms) — terms in fixed slot order; a doc
    *                matches if it contains ANY query term (disjunctive).
    *                Terms must be distinct within a query (each slot
    *                contributes its term's score independently, so a
    *                repeated term would double-count) and lowercase
    *                (the corpus side lowers before tokenizing; a
    *                mixed-case term silently matches nothing).
    */
  def topK(
      docs: DataFrame,
      idCol: String,
      textCol: Column,
      queries: Seq[(Int, Seq[String])],
      k1: Double = 1.2,
      b: Double = 0.75,
      k: Int = 10): DataFrame = {
    validate(queries)
    val maxTerms = queries.map(_._2.size).max
    val qpost = queryPostings(docs, idCol, textCol, queries, k1, b)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    pivotScore(qpost, maxTerms)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("score"))
  }

  /** Per-(qid, doc) raw BM25 scores over every document containing at
    * least one query term — the pair-FEATURE form of [[topK]] (no
    * top-k window): (qid, doc_id, score, hit_terms), `hit_terms` =
    * how many of the query's slots matched the doc. Docs matching no
    * term have no row — a downstream left join reads them as 0.0 / 0.
    * Same slot-ordered pivot sum as [[topK]], so scores hash-replay.
    */
  def pairScores(
      docs: DataFrame,
      idCol: String,
      textCol: Column,
      queries: Seq[(Int, Seq[String])],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    validate(queries)
    val maxTerms = queries.map(_._2.size).max
    val qpost = queryPostings(docs, idCol, textCol, queries, k1, b)
    val hit = (0 until maxTerms).foldLeft(lit(0)) { (acc, i) =>
      acc + when(col(s"_s$i").isNotNull, 1).otherwise(0)
    }
    pivotScore(qpost, maxTerms)
      .select(col("qid"), col("doc_id"), col("score"), hit.as("hit_terms"))
  }

  /** Pseudo-relevance-feedback query expansion (the RM3 recipe:
    * Lavrenko & Croft 2001 relevance models, the Jelinek-Mercer-mixed
    * "RM3" variant in its standard rational simplification):
    *
    *   1. first pass: BM25 top-`fbDocs` per query (the feedback set);
    *   2. expansion weights: w(t) = Σ_r tf(t, d_r)/dl(d_r) over the
    *      feedback docs — summed over FIXED feedback-rank slots in
    *      literal order (the pivot guard, never a partition-ordered
    *      double sum), original query terms excluded;
    *   3. top-`fbTerms` expansion terms per query (w DESC, term ASC),
    *      normalized to ŵ = w/Σw with the Σ again a fixed-slot
    *      literal-order sum;
    *   4. second pass: BM25 over original slots (weight 1.0) plus
    *      expansion slots (weight λ·ŵ), final score the literal-order
    *      sum across the combined slot range.
    *
    * Everything stays relational — the expanded term table is a
    * DataFrame joined against a full (doc, term, tf) inverted-index
    * build, never a driver collect — so query count scales freely; at
    * production scale the inverted index is the staged table the
    * [[topK]] scaladoc describes. Every arithmetic step is exact
    * integer ratios and fixed-order IEEE sums, so the full expanded
    * ranking hash-replays in another engine (q122).
    *
    * @return (qid, rank, doc_id, score), rank 1..k per query
    */
  def topKRm3(
      docs: DataFrame,
      idCol: String,
      textCol: Column,
      queries: Seq[(Int, Seq[String])],
      k1: Double = 1.2,
      b: Double = 0.75,
      k: Int = 10,
      fbDocs: Int = 5,
      fbTerms: Int = 3,
      lambda: Double = 0.5): DataFrame = {
    validate(queries)
    require(fbDocs >= 1 && fbTerms >= 1, s"need fbDocs/fbTerms >= 1 (got $fbDocs/$fbTerms)")
    val spark = docs.sparkSession
    import spark.implicits._
    val maxTerms = queries.map(_._2.size).max
    val corpus = base(docs, idCol, textCol).pinned
    // ---- full inverted index: (doc_id, dl, term, tf), one shuffle.
    // Data-dependent expansion terms join against it relationally —
    // the first pass reuses it through the same plan block.
    val tf = corpus
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .pinned
    val stats = corpus.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    def contrib(tfc: Column, dfc: Column, dlc: Column): Column =
      contribExpr(tfc, dfc, dlc, col("sum_dl").cast("double") / col("n_docs"), k1, b)
    val qterms = queries
      .flatMap { case (qid, ts) => ts.zipWithIndex.map { case (t, i) => (qid, i, t) } }
      .toDF("qid", "slot", "term")
    def scoreTerms(termTable: DataFrame, nSlots: Int): DataFrame = {
      // termTable: (qid, slot, term, weight). df must count one row
      // per (doc, term) — so it rides the posting rows BEFORE the
      // per-qid term join duplicates them (a shared term across
      // queries would otherwise double its df); each slot then pivots
      // MAX(CASE) and the final score sums slots in literal order
      val posts = tf
        .join(termTable.select(col("term")).distinct(), "term")
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
        .crossJoin(broadcast(stats))
        .withColumn("s0", contrib(col("tf"), col("df"), col("dl")))
      val scored = posts
        .join(termTable, "term")
        .withColumn("s", col("s0") * col("weight"))
      val slots = (0 until nSlots).map(i => max(when(col("slot") === i, col("s"))).as(s"_s$i"))
      val total = (0 until nSlots).foldLeft(lit(0.0)) { (acc, i) =>
        acc + coalesce(col(s"_s$i"), lit(0.0))
      }
      scored
        .groupBy(col("qid"), col("doc_id"))
        .agg(slots.head, slots.tail: _*)
        .withColumn("score", total)
    }
    // ---- pass 1: feedback set -----------------------------------------------
    val wFb = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    val fb = scoreTerms(broadcast(qterms.withColumn("weight", lit(1.0))), maxTerms)
      .withColumn("fr", row_number().over(wFb))
      .filter(col("fr") <= fbDocs)
      .select(col("qid"), col("fr"), col("doc_id"))
      .pinned
    // ---- expansion weights: fixed feedback-rank slots ------------------------
    val frSlots = (1 to fbDocs).map(r =>
      max(when(col("fr") === r, col("tf").cast("double") / col("dl"))).as(s"_w$r"))
    val wSum = (1 to fbDocs).foldLeft(lit(0.0)) { (acc, r) =>
      acc + coalesce(col(s"_w$r"), lit(0.0))
    }
    val wExp = Window.partitionBy(col("qid")).orderBy(col("w").desc, col("term"))
    val origTerms = qterms.select(col("qid"), col("term")).withColumn("_o", lit(1))
    val expanded = tf
      .join(broadcast(fb), "doc_id")
      .groupBy(col("qid"), col("term"))
      .agg(frSlots.head, frSlots.tail: _*)
      .withColumn("w", wSum)
      .join(broadcast(origTerms), Seq("qid", "term"), "left_anti")
      .withColumn("er", row_number().over(wExp))
      .filter(col("er") <= fbTerms)
      .pinned
    // normalize over fixed expansion-rank slots, literal order
    val erSlots = (1 to fbTerms).map(r => max(when(col("er") === r, col("w"))).as(s"_n$r"))
    val normSum = (1 to fbTerms).foldLeft(lit(0.0)) { (acc, r) =>
      acc + coalesce(col(s"_n$r"), lit(0.0))
    }
    val norms = expanded
      .groupBy(col("qid"))
      .agg(erSlots.head, erSlots.tail: _*)
      .select(col("qid"), normSum.as("wsum"))
    val expTerms = expanded
      .join(norms, "qid")
      .select(
        col("qid"),
        (col("er") + lit(maxTerms - 1)).cast("int").as("slot"),
        col("term"),
        (lit(lambda) * (col("w") / col("wsum"))).as("weight"))
    // ---- pass 2: original slots (weight 1) + expansion slots (λ·ŵ) ----------
    val combined = broadcast(
      qterms.withColumn("weight", lit(1.0)).unionByName(expTerms))
    val wFin = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    scoreTerms(combined, maxTerms + fbTerms)
      .withColumn("rank", row_number().over(wFin))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("score"))
  }

  /** [[topK]] with max-score (WAND-family) pruning — identical output,
    * bounded candidate generation on hot terms.
    *
    * Each (query, term) posting list is impact-ordered and truncated to
    * its top-`cap` contributions map-side (the rank filter sits
    * directly on the window, so Spark inserts WindowGroupLimit — a hot
    * term never materializes more than `cap` candidate rows per query
    * past its executor). Candidates are then scored on their FULL
    * posting sets, so a candidate's score is exact. Exactness of the
    * top-k follows from the classic max-score bound: a document
    * excluded from every truncated list can score at most
    * Σ_t c_t, where c_t is the cap-th (weakest kept) impact of the
    * lists that actually dropped documents (`df > cap`); if the k-th
    * candidate score strictly dominates that bound, no excluded
    * document can displace it (strictness also kills tie-break
    * displacement). Queries whose bound check fails — cap too small
    * for the score distribution — fall back to the unpruned scoring
    * for just those qids, so the method NEVER returns an approximate
    * ranking. The bound itself sums per-slot pivots in literal order
    * (same portability guard as the score).
    *
    * At 100 TB this is the production form the [[topK]] scaladoc
    * promises: candidate volume per query is ≤ cap·|terms| regardless
    * of how hot a term is, the candidate set is broadcast back against
    * the postings (no shuffle of the hot lists by doc), and the
    * fallback path touches only the failing queries' postings.
    */
  def topKPruned(
      docs: DataFrame,
      idCol: String,
      textCol: Column,
      queries: Seq[(Int, Seq[String])],
      k1: Double = 1.2,
      b: Double = 0.75,
      k: Int = 10,
      cap: Int = 100): DataFrame =
    prunedInternal(docs, idCol, textCol, queries, k1, b, k, cap)._2

  /** (candidate set, final result) — the tuple form exists so specs can
    * assert the candidate volume stays bounded on a hot-term corpus.
    *
    * `reuse = true` (production) pins the three multiply-referenced
    * frames — the posting build, the truncated lists, the ranked
    * candidates — with lazy local checkpoints: the pruned/bound/
    * fallback branches otherwise each re-derive the whole corpus
    * pipeline in the plan (the r8 audit showed 9 replicated 1-row
    * stats broadcasts and 69 shuffles), which at 100 TB means scanning
    * the corpus once per branch. `reuse = false` keeps the raw
    * composed plan so specs can assert plan properties (the
    * WindowGroupLimit truncation) that a checkpoint boundary would
    * hide; both settings produce identical rows.
    */
  private[graft] def prunedInternal(
      docs: DataFrame,
      idCol: String,
      textCol: Column,
      queries: Seq[(Int, Seq[String])],
      k1: Double,
      b: Double,
      k: Int,
      cap: Int,
      reuse: Boolean = true): (DataFrame, DataFrame) = {
    validate(queries)
    require(cap >= 1, s"cap must be >= 1 (got $cap)")
    def pin(df: DataFrame): DataFrame = if (reuse) df.pinned else df
    val maxTerms = queries.map(_._2.size).max
    val qpost = pin(
      queryPostings(docs, idCol, textCol, queries, k1, b)
        .select(col("qid"), col("slot"), col("doc_id"), col("s"), col("df")))
    // Impact-ordered truncation: rank filter DIRECTLY above the window
    // -> WindowGroupLimit keeps the top-cap selection map-side.
    val wImp = Window.partitionBy(col("qid"), col("slot")).orderBy(col("s").desc, col("doc_id"))
    val capped = pin(
      qpost
        .withColumn("ir", row_number().over(wImp))
        .filter(col("ir") <= cap))
    // Exclusion bound per query: lists that dropped documents
    // (df > cap) contribute their weakest KEPT impact; untruncated
    // lists contribute 0 (an excluded doc by definition matches none
    // of them). Summed over fixed slots in literal order.
    val slotBounds =
      (0 until maxTerms).map(i => max(when(col("slot") === i, col("c_t"))).as(s"_c$i"))
    val boundExpr = (0 until maxTerms).foldLeft(lit(0.0)) { (acc, i) =>
      acc + coalesce(col(s"_c$i"), lit(0.0))
    }
    val qbound = capped
      .groupBy(col("qid"), col("slot"))
      .agg(min(col("s")).as("smin"), max(col("df")).as("dfm"))
      .withColumn("c_t", when(col("dfm") > cap, col("smin")).otherwise(lit(0.0)))
      .groupBy(col("qid"))
      .agg(slotBounds.head, slotBounds.tail: _*)
      .withColumn("bound", boundExpr)
      .select(col("qid"), col("bound"))
    val cands = capped.select(col("qid"), col("doc_id")).distinct()
    // Candidates scored on their FULL postings; the candidate set is
    // <= |queries|·maxTerms·cap rows by construction, so broadcasting
    // it keeps the hot posting lists from shuffling by doc.
    val candScore = pivotScore(qpost.join(broadcast(cands), Seq("qid", "doc_id")), maxTerms)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    val ranked = pin(
      candScore
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k))
    val safety = ranked
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("ncand"), min(col("score")).as("kth"))
      .join(broadcast(qbound), Seq("qid"))
      .withColumn(
        "safe",
        col("bound") === 0.0 || (col("ncand") === k && col("bound") < col("kth")))
    val safeQ = safety.filter(col("safe")).select(col("qid"))
    val unsafeQ = safety.filter(!col("safe")).select(col("qid"))
    val prunedPart = ranked
      .join(broadcast(safeQ), Seq("qid"))
      .select(col("qid"), col("rank"), col("doc_id"), col("score"))
    val fullPart = pivotScore(qpost.join(broadcast(unsafeQ), Seq("qid")), maxTerms)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("score"))
    (cands, prunedPart.unionByName(fullPart))
  }
}
