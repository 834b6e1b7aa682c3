package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained model-based quality filtering (the GPT-3/LLaMA "quality
  * classifier" pipeline stage, fastText-shaped, NBSVM form): a seed
  * rule labels a train split, per-doc DISTINCT character trigrams get
  * rate-normalized rational count-ratio weights, documents score the
  * mean matched-trigram weight, and the operating threshold is
  * calibrated on the train split itself. q133 is the batch/oracle twin
  * (its Documents.scala header records the measured design rationale:
  * why char trigrams and not word identity, why rate normalization and
  * not raw ratios, why the threshold must be calibrated, and why every
  * quantization step is PURE INTEGER arithmetic — round() on derived
  * doubles was measured to diverge between engines near 5-ties).
  *
  * The pieces are exposed separately so the batch query, the
  * fit-and-persist path and the ingest rule compose the SAME
  * expressions — weight/threshold semantics cannot drift apart:
  *   - [[labeled]]/[[tokenStream]]: tokenize + label + binarized
  *     trigram stream (map-side; array_distinct bounds downstream work
  *     by distinct-trigrams-per-doc, not text length)
  *   - [[classCounts]]/[[weights]]: the vocabulary-bounded weight fit
  *     (trigram vocabulary is intrinsically bounded by charset³, so the
  *     weight table broadcasts at ANY corpus size)
  *   - [[scores]]/[[calibrate]]: exact-BIGINT weight sums and the
  *     train-calibrated threshold
  *   - [[fit]]: persist weights + threshold for the ingest-time
  *     [[graft.rules.CorpusRules.QualityClassifierRule]], which scores
  *     each row against the broadcast-literal weight map with zero
  *     state (the ImportanceFilterRule deployment shape).
  */
object QualityClassifier {

  /** The seed-rule stopword set — THE Gopher list (TextAnalysis),
    * referenced rather than copied so the seed label, q103's metrics
    * and q133's oracle (which interpolates the same val into its SQL)
    * can never drift apart.
    */
  val stopwords: Seq[String] = TextAnalysis.gopherStopwords

  /** Non-empty whitespace tokens of an already trim(lower(...))'d text. */
  def toks(tx: Column): Column =
    filter(split(tx, "\\s+"), w => w =!= "")

  /** The seed labeling rule: word count / alpha ratio / stopword
    * presence — the cheap heuristic whose labels the classifier
    * generalizes from.
    */
  def seedLabel(toksCol: Column): Column =
    size(toksCol) >= 30 &&
      size(filter(toksCol, w => w.rlike("[a-z]"))).cast("double") / size(toksCol) >= 0.8 &&
      size(filter(typedLit(stopwords), sw => array_contains(toksCol, sw))) >= 2

  /** Per-doc DISTINCT character trigrams. The length guard keeps
    * sequence() ascending (Spark's sequence(1, L-2) DESCENDS for
    * L < 3 — a sub-trigram doc must produce zero trigrams).
    */
  def trigrams(tx: Column): Column =
    array_distinct(
      when(length(tx) >= 3,
        transform(sequence(lit(1), length(tx) - 2), i => substr(tx, i, lit(3))))
        .otherwise(typedLit(Seq.empty[String])))

  /** (doc_id, tx, label_hq) over docs with at least one token. The
    * trigram stream and seed-label kernels downstream are the
    * pipeline's per-row hot path — floor the scan's parallelism
    * (TextGroups.fanOut: identity at production scale, a one-time
    * hash repartition when a small unsplittable scan would otherwise
    * run the kernels near-serially; round-15, measured 3.4 s of
    * single-task stages at sf0.1).
    */
  def labeled(df: DataFrame, id: Column, text: Column): DataFrame =
    TextGroups
      .fanOut(df.select(id.as("doc_id"), trim(lower(text)).as("tx")), col("doc_id"))
      .withColumn("toks", toks(col("tx")))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("tx"), seedLabel(col("toks")).as("label_hq"))

  /** Binarized trigram stream (doc_id, label_hq, term). */
  def tokenStream(labeledDf: DataFrame): DataFrame =
    labeledDf.select(
      col("doc_id"),
      col("label_hq"),
      explode(trigrams(col("tx"))).as("term"))

  /** 1-row (nhq, nlq) class counts — rides a broadcast cross join. */
  def classCounts(labeledTrain: DataFrame): DataFrame =
    labeledTrain.agg(
      sum(when(col("label_hq"), 1L).otherwise(0L)).as("nhq"),
      sum(when(col("label_hq"), 0L).otherwise(1L)).as("nlq"))

  /** Weight table (term, wi): wi = round-half-up of 10⁴·A/(A+B) with
    * A = (hq+1)·(nlq+2), B = (lq+1)·(nhq+2), computed ENTIRELY in
    * exact integer arithmetic ((20000·A + A+B) div (2·(A+B))) so both
    * engines of a cross-engine gate hold the identical integer. The
    * products ride DECIMAL(38,0), not BIGINT: around ~2·10⁷ train docs
    * per class a BIGINT 20000·A silently wraps negative while DuckDB's
    * SUM promotes to HUGEINT and stays correct — the same silent-wrap
    * hazard ImportanceFilterRule's accumulator documents, closed the
    * same way (`div` on decimals is still exact integral division, and
    * wi ≤ 10⁴ always fits the long it returns). df >= minDf prunes the
    * noise tail; the table is vocabulary-bounded regardless.
    */
  def weights(tokTrain: DataFrame, nrow: DataFrame, minDf: Int): DataFrame =
    tokTrain
      .groupBy("term")
      .agg(sum(when(col("label_hq"), 1L).otherwise(0L)).as("hq"), count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minDf)
      .crossJoin(broadcast(nrow))
      .select(
        col("term"),
        ((col("hq") + 1).cast("decimal(38,0)") * (col("nlq") + 2).cast("decimal(38,0)")).as("a"),
        ((col("cnt") - col("hq") + 1).cast("decimal(38,0)") *
          (col("nhq") + 2).cast("decimal(38,0)")).as("b"))
      .select(col("term"), expr("(a * 20000 + (a + b)) div (2 * (a + b))").as("wi"))

  /** Per-doc (doc_id, n_hits, ksum, score): exact BIGINT weight sums;
    * score = double(Σwi)/10⁴/n_hits is two correctly-rounded IEEE
    * divisions of exact integers — no decimal casts anywhere. The
    * weight table is BROADCAST (it is vocabulary-bounded — charset³ at
    * most — regardless of corpus size), so the per-doc trigram stream
    * is never shuffled on term: the lookup is a map-side hash join and
    * the only wide op left is the doc-keyed aggregate. Without the
    * hint the optimizer's post-aggregation size estimate picks a
    * sort-merge join that shuffles the whole trigram stream (measured:
    * 4.10 s vs 3.21 s end-to-end at sf0.1, 25.9 vs 22.3 s at sf1 —
    * ~1.2–1.3× slower; and the trigram stream must stay checkpointed,
    * or recomputing it for the weight fit AND the scoring join costs
    * more than the checkpoint writes: the unpinned broadcast variant
    * measured 1.5× slower than this one at sf1).
    */
  def scores(tok: DataFrame, w: DataFrame): DataFrame =
    tok
      .join(broadcast(w), "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_hits"), sum(col("wi")).as("ksum"))
      .withColumn("score", col("ksum").cast("double") / 10000 / col("n_hits"))

  /** Train-calibrated operating point: the midpoint of the two
    * class-mean scores, each doc's score re-quantized to the grid the
    * same integer way ((2·Σwi + n) div (2n)) before the class sums.
    */
  def calibrate(sc: DataFrame, labeledTrain: DataFrame): DataFrame =
    sc.join(labeledTrain.select("doc_id", "label_hq"), "doc_id")
      .select(col("label_hq"), expr("(2 * ksum + n_hits) div (2 * n_hits)").as("q"))
      .agg(((
        sum(when(col("label_hq"), col("q"))).cast("double") / 10000 /
          sum(when(col("label_hq"), 1)) +
          sum(when(!col("label_hq"), col("q"))).cast("double") / 10000 /
            sum(when(!col("label_hq"), 1))
      ) / 2).as("tau"))

  /** Fit on `df` (EVERY row is the train set — the caller does the
    * split) and persist the model: `outDir/weights` (term, wi) +
    * `outDir/tau` (one row). The ingest rule loads this snapshot —
    * the production flow is fit offline, filter every batch/stream
    * against the frozen model, refit on drift (the same lifecycle as
    * the DSIR and IVFADC maintainers).
    */
  def fit(df: DataFrame, id: Column, text: Column, outDir: String, minDf: Int = 3): Unit = {
    val lab = Pinned.pin(labeled(df, id, text))
    val tok = Pinned.pin(tokenStream(lab))
    val w = Pinned.pin(weights(tok, classCounts(lab), minDf))
    w.write.mode("overwrite").parquet(s"$outDir/weights")
    calibrate(scores(tok, w), lab).write.mode("overwrite").parquet(s"$outDir/tau")
  }
}
