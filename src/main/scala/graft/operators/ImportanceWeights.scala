package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Pinned.PinOps

/** DSIR-style data selection via hashed n-gram importance weights
  * (Xie et al., 2023, arXiv:2302.03169): fit bag-of-hashed-ngram
  * models over a target domain and the raw corpus, score every raw
  * document by how target-like its n-gram profile is, keep the top
  * scorers.
  *
  * Engine-exactness: the classic formulation sums log-probability
  * ratios, but ln() is not bit-portable across engines (libm vs
  * DuckDB's rounding differ in the last ulp, and a quantizing floor
  * can straddle that ulp). This operator therefore works entirely in
  * integer arithmetic: the per-bucket score is the add-one-smoothed
  * likelihood ratio
  *
  *   (ct+1)/(tot_t+B) : (cr+1)/(tot_r+B)
  *
  * held as a HALF-UP-rounded fixed-point integer in 1e-6 units
  * (one integer division — replayed in DuckDB with the `(2n+d)//(2d)`
  * trick q52's k-means oracle established; micro-units keep every
  * downstream product inside BIGINT range at any corpus size), and a
  * document's weight is the exact sum of gram-count x score-units
  * (decimal(38,0), overflow-free at any corpus size). Sums of
  * integers are order-independent, so the weights — and the top-N
  * selection they induce — hash-compare across engines. The linear-
  * domain score is monotone in the per-bucket probability ratio, so
  * ranking behavior matches the spirit of the paper's importance
  * weights while staying oracle-checkable.
  *
  * Scale shape (100 TB): the model is a B-row table (default 256
  * buckets — broadcast), fitting is one explode + two aggregations
  * with map-side combine absorbing the head buckets, and scoring is
  * map-side after a broadcast join. The only driver-side value is
  * nothing: totals ride a 1-row cross join. Selection is a
  * TakeOrdered top-N, never a global sort.
  */
object ImportanceWeights {

  /** Unigrams + word bigrams of whitespace-split, lowercased text —
    * NON-distinct (the models are count-based). Matches the corpus
    * tokenization idiom (q49/q61) on both engines.
    */
  def grams(text: Column): Column = gramsOfToks(split(trim(lower(text)), "\\s+"))

  /** Gram construction from an already-materialized token array.
    * Bigrams pair the two length-(n-1) slices element-wise with
    * zip_with — LINEAR in the token count. (The tempting
    * transform(sequence(...), i -> element_at(toks, i)...) form is
    * quadratic when `toks` is an unmaterialized expression: the
    * per-element lambda re-evaluates it, 19x slower at sf1 — always
    * project the token array to a column before calling this.)
    */
  def gramsOfToks(toks: Column): Column = {
    val n = size(toks)
    val bi = when(
      n >= 2,
      zip_with(
        slice(toks, lit(1), n - 1),
        slice(toks, lit(2), n - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    concat(toks, bi)
  }

  /** Hash bucket: the first two hex chars of md5 — 256 buckets as
    * plain strings, so no cross-engine hex-to-int conversion is ever
    * needed (the q43 sign-LSH determinism trick).
    */
  def bucket(gram: Column): Column = substring(md5(gram), 1, 2)

  /** HALF_UP at scale 6 of ((ct+1)(tot_r+B)) / ((cr+1)(tot_t+B)), in
    * pure integer arithmetic: round(n/d) = (2n+d) DIV (2d) for
    * positive n, d. Decimal(38,0) intermediates keep the 1e6 scaling
    * exact at any corpus size a decimal can count.
    */
  private def unitsExpr(buckets: Int): Column =
    expr(
      s"""CAST((2 * CAST(ct + 1 AS DECIMAL(20,0)) * CAST(tot_r + $buckets AS DECIMAL(20,0)) * 1000000
         |      + CAST(cr + 1 AS DECIMAL(20,0)) * CAST(tot_t + $buckets AS DECIMAL(20,0)))
         |     DIV (2 * CAST(cr + 1 AS DECIMAL(20,0)) * CAST(tot_t + $buckets AS DECIMAL(20,0)))
         |     AS BIGINT)""".stripMargin)

  /** Model from a per-bucket count table (bucket, ct, cr). */
  private def scoresFromCounts(perBucket: DataFrame, buckets: Int): DataFrame = {
    val totals = perBucket.agg(sum(col("ct")).as("tot_t"), sum(col("cr")).as("tot_r"))
    perBucket
      .crossJoin(broadcast(totals))
      .withColumn("units", unitsExpr(buckets))
      .select(col("bucket"), col("units"))
  }

  /** Fit the hashed-ngram importance model: one row per OBSERVED
    * bucket with its integer score in 1e-6 units.
    *
    * @param docs     the raw corpus (the target rows are a subset)
    * @param textCol  document text
    * @param isTarget predicate selecting the target-domain rows
    * @param buckets  smoothing denominator (the bucket-space size B)
    * @return (bucket: string, units: long)
    */
  def bucketScores(
      docs: DataFrame,
      textCol: Column,
      isTarget: Column,
      buckets: Int = 256
  ): DataFrame = {
    val g = TextGroups
      // fanOut: the gram explode + md5 bucket is the per-row hot stage
      // (round 15; identity when the scan is already parallel). Keyed
      // by the text itself — the only high-cardinality column here.
      .fanOut(docs.select(isTarget.as("_t"), textCol.as("_tx")), col("_tx"))
      .select(col("_t"), split(trim(lower(col("_tx"))), "\\s+").as("_toks"))
      .select(col("_t"), explode(gramsOfToks(col("_toks"))).as("_gram"))
      .select(col("_t"), bucket(col("_gram")).as("bucket"))
    val perBucket = g
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("_t"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
    scoresFromCounts(perBucket, buckets)
  }

  /** Score every document against a fitted model: the BIGINT-exact
    * sum of per-bucket gram count x score units (decimal(38,0) so the
    * sum can never overflow), plus the gram count for reference.
    *
    * @param defaultUnits score for grams hashing into a bucket the
    *        model never observed. None (the default) DROPS such grams
    *        from both the weight and the gram count — right when
    *        scoring the fit corpus itself, where every bucket is
    *        observed (q99). Scoring NEW documents against a model
    *        snapshot wants Some(neutral), the smoothed-model behavior
    *        ([[graft.rules.CorpusRules.ImportanceFilterRule]] uses
    *        1e6 = ratio 1.0).
    * @return (id, n_grams: long, w_units: decimal(38,0))
    */
  def score(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      scores: DataFrame,
      defaultUnits: Option[Long] = None
  ): DataFrame = {
    val counts = TextGroups
      .fanOut(docs.select(idCol.as("id"), textCol.as("_tx")), col("id"))
      .select(col("id"), split(trim(lower(col("_tx"))), "\\s+").as("_toks"))
      .select(col("id"), explode(gramsOfToks(col("_toks"))).as("_gram"))
      .select(col("id"), bucket(col("_gram")).as("bucket"))
      .groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val joined = defaultUnits match {
      case None => counts.join(broadcast(scores), "bucket")
      case Some(d) =>
        counts
          .join(broadcast(scores), Seq("bucket"), "left_outer")
          .withColumn("units", coalesce(col("units"), lit(d)))
    }
    joined
      .groupBy(col("id"))
      .agg(
        sum(col("cnt")).as("n_grams"),
        sum(col("cnt").cast("decimal(18,0)") * col("units").cast("decimal(19,0)")).as("w_units"))
      .select(col("id"), col("n_grams"), col("w_units").cast("decimal(38,0)").as("w_units"))
  }

  /** Fit-and-score over ONE corpus in ONE gram pass: the fused form of
    * [[bucketScores]] + [[score]] for the common self-selection case
    * (fit the model on the same corpus you rank). The gram explode —
    * the only corpus-sized stage — runs once: per-(doc, bucket) counts
    * are checkpointed (at most docs x B rows), the bucket model
    * aggregates from them, and scoring re-reads them. Output-identical
    * to the composed form (spec-pinned): ct = sum of target-doc counts
    * == the direct target gram count.
    *
    * @return (id, n_grams: long, w_units: decimal(38,0))
    */
  def fitScore(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      isTarget: Column,
      buckets: Int = 256
  ): DataFrame = {
    val dc = TextGroups
      .fanOut(docs.select(idCol.as("id"), isTarget.as("_t"), textCol.as("_tx")), col("id"))
      .select(col("id"), col("_t"), split(trim(lower(col("_tx"))), "\\s+").as("_toks"))
      .select(col("id"), col("_t"), explode(gramsOfToks(col("_toks"))).as("_gram"))
      .select(col("id"), col("_t"), bucket(col("_gram")).as("bucket"))
      .groupBy(col("id"), col("_t"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      // barrier: both the model fit and the scoring read this — without
      // it each consumer re-runs the corpus explode
      .pinned
    val perBucket = dc
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("_t"), col("cnt")).otherwise(0L)).as("ct"),
        sum(col("cnt")).as("cr"))
    val scores = scoresFromCounts(perBucket, buckets)
    dc.join(broadcast(scores), "bucket")
      .groupBy(col("id"))
      .agg(
        sum(col("cnt")).as("n_grams"),
        sum(col("cnt").cast("decimal(18,0)") * col("units").cast("decimal(19,0)")).as("w_units"))
      .select(col("id"), col("n_grams"), col("w_units").cast("decimal(38,0)").as("w_units"))
  }
}
