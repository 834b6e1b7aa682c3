package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Pinned.PinOps

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016) — the
  * canonical LLM-preprocessing step the rest of the token-level
  * operators (q31 counts, q74 chunking, q95 length batching) assume
  * already happened.
  *
  * Scale shape: training runs on the WORD-FREQUENCY table, not the
  * corpus — one corpus-sized aggregation up front, then every merge
  * round touches only (distinct word, count) rows, which is vocabulary-
  * sized (Heaps' law: sublinear in corpus size). Each round is one
  * distributed pair-count aggregation; the only driver traffic is the
  * round's argmax — a single row, same bounded-collect contract as the
  * trained k-means centroids (q52). Applying merges is a pure
  * per-word column expression (a left fold over the symbol array), so
  * encoding is map-side, embarrassingly parallel, and usable inside
  * any query without a UDF.
  *
  * Determinism: pair counts are exact longs; the per-round argmax
  * tie-breaks on (count DESC, left ASC, right ASC); the greedy
  * left-to-right merge application is order-defined. No floating
  * point anywhere, so the whole train + encode pipeline is
  * bit-replayable in another engine (the q111/q112 oracles unroll the
  * rounds as DuckDB CTEs with a RELATIONAL re-implementation of the
  * greedy merge — window functions + run parity — making the two
  * sides genuinely independent implementations).
  *
  * Simplifications vs production BPE (documented contract): no
  * end-of-word marker and no byte-level fallback — symbols are the
  * word's Unicode characters. Both are representation choices that
  * change neither the algorithm nor the plan shape.
  */
object Bpe {

  /** Characters of a string as an array column — expressed as
    * substring probes (not `split("")`) so the oracle can mirror the
    * exact construction.
    */
  def chars(s: Column): Column =
    transform(sequence(lit(1), length(s)), i => s.substr(i, lit(1)))

  /** One greedy left-to-right merge pass of (l, r) -> l+r over a
    * symbol array: a fold that appends each symbol unless the
    * accumulator's last element is `l` and the incoming symbol is `r`,
    * in which case the pair collapses. A freshly merged symbol is
    * strictly longer than `l`, so it can never immediately re-merge —
    * exactly the non-overlapping semantics ("a a a" with merge (a,a)
    * becomes ["aa", "a"], not ["aa","aa"]).
    */
  def applyMerge(arr: Column, l: String, r: String): Column =
    aggregate(
      arr,
      array().cast("array<string>"),
      (acc, x) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** All `merges` applied in rank order to a word's characters. */
  def encodeWord(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(chars(word)) { case (arr, (l, r)) => applyMerge(arr, l, r) }

  /** The (distinct word, count) table BPE trains on. */
  def wordFreq(docs: DataFrame, textCol: Column): DataFrame =
    docs
      .select(explode(split(trim(lower(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("wc"))

  /** Train `numMerges` BPE merges. Returns (left, right, pairCount) in
    * rank order.
    *
    * `checkpointEvery = 0` (default): each round recomputes symbols
    * from the word-frequency table by folding ALL merges learned so
    * far — stateless across rounds (no persisted mutable table), at
    * the cost of O(rounds²) total fold depth, fine for tokenizer-
    * prefix sizes (capped at 64 rounds on this path).
    *
    * `checkpointEvery = N > 0`: the PRODUCTION-VOCAB path — every N
    * rounds the symbolized word table is re-materialized with a lazy
    * local checkpoint, so each round folds at most N pending merges
    * over the last materialization instead of the whole history. Per-
    * round plan depth is O(N) and total work O(rounds·N), which is
    * what lets a 30k-merge vocabulary train as 30k bounded Spark jobs
    * rather than an ever-deepening expression chain. Merges are pure
    * integer/string arithmetic, so both paths produce IDENTICAL merge
    * lists (spec-pinned); only the plan shape differs.
    */
  def trainMerges(
      docs: DataFrame,
      textCol: Column,
      numMerges: Int,
      checkpointEvery: Int = 0): Seq[(String, String, Long)] =
    trainMergesProbed(docs, textCol, numMerges, checkpointEvery)

  /** [[trainMerges]] with a per-round hook on the pair-count frame —
    * exists so the spec can pin that checkpointing actually bounds the
    * analyzed-plan depth (a claim a result-only test can't see).
    */
  private[graft] def trainMergesProbed(
      docs: DataFrame,
      textCol: Column,
      numMerges: Int,
      checkpointEvery: Int = 0,
      probe: (Int, DataFrame) => Unit = (_, _) => ()): Seq[(String, String, Long)] = {
    require(checkpointEvery >= 0, s"checkpointEvery must be >= 0, got $checkpointEvery")
    require(
      numMerges >= 1 && (numMerges <= 64 || checkpointEvery > 0),
      s"numMerges $numMerges needs checkpointEvery > 0 past 64 rounds — the unchunked " +
        "path re-folds every merge from chars each round (O(rounds²) fold depth)")
    // Lazy local checkpoint: the corpus-sized aggregation runs once
    // and every round reuses the materialized blocks (freed with the
    // RDD — no CacheManager entry to leak, see the q102 note).
    val wf = wordFreq(docs, textCol).pinned
    // The pin chain, newest first: wf, then each re-materialized
    // symbol table. Generation k's blocks are needed until generation
    // k+1 materializes (the first collect after the checkpoint), so
    // the newest TWO stay; everything older is released the moment a
    // new generation joins — a 30k-merge training run holds at most
    // two corpus-vocabulary tables at any instant instead of
    // accumulating every superseded one until the GC notices. All
    // remaining pins are released before returning: nothing escapes
    // this method but the collected merge list.
    var chain = List[DataFrame](wf)
    def pushGeneration(g: DataFrame): Unit = {
      chain = g :: chain
      chain.drop(2).foreach(Pinned.release(_, blocking = false))
      chain = chain.take(2)
    }
    // cur holds (syms, wc) with every merge up to the last checkpoint
    // already applied; pending holds merges learned since (oldest
    // first). On the default path pending is simply the full history.
    var cur = wf.select(chars(col("word")).as("syms"), col("wc"))
    var pending = Vector.empty[(String, String)]
    var learned = List.empty[(String, String, Long)]
    var round = 0
    while (round < numMerges) {
      val syms = pending.foldLeft(col("syms")) { case (arr, (l, r)) => applyMerge(arr, l, r) }
      val scored = cur
        .select(col("wc"), syms.as("syms"))
        .select(
          col("wc"),
          explode(
            zip_with(
              slice(col("syms"), lit(1), size(col("syms")) - 1),
              slice(col("syms"), lit(2), size(col("syms")) - 1),
              (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wc")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
      probe(round, scored)
      val best = scored.collect()
      if (best.isEmpty) round = numMerges // corpus fully merged: stop early
      else {
        val row = best.head
        learned = (row.getString(0), row.getString(1), row.getLong(2)) :: learned
        pending :+= ((row.getString(0), row.getString(1)))
        round += 1
        if (checkpointEvery > 0 && pending.size >= checkpointEvery && round < numMerges) {
          val folded = pending.foldLeft(col("syms")) { case (arr, (l, r)) =>
            applyMerge(arr, l, r)
          }
          cur = cur.select(folded.as("syms"), col("wc")).pinned
          pushGeneration(cur)
          pending = Vector.empty
        }
      }
    }
    chain.foreach(Pinned.release(_, blocking = false))
    learned.reverse
  }
}
