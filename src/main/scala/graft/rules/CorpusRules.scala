package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.TextHashExprs
import graft.operators.{Dedup, TextAnalysis}

/** The LLM-data-pipeline operators as pluggable pipeline RULES
  * (SURVEY §7.1 item 8: extensions ride the same pipeline machinery as
  * the reference-parity rules) — a JSON pipeline config can now chain
  * quality filtering, language-ID and dedup over any text source, batch
  * or streaming, exactly like a go-fish user chains .so plugins.
  *
  * All rules expect a `text` column and pass other columns through.
  */
object CorpusRules {

  /** Quality gate: keep docs with >= `minTokens` tokens and a
    * duplicate-bigram fraction below `maxDupFraction` (q46's metric).
    * Stateless map/filter — streams with no extra state.
    */
  final class QualityFilterRule(minTokens: Int = 20, maxDupFraction: Double = 0.6) extends Rule {
    val name = "qualityFilter"
    def apply(df: DataFrame): DataFrame = {
      val toks = Dedup.tokens(col("text"))
      val nTok = size(toks)
      val nBi = greatest(nTok - 1, lit(0))
      val nDist = when(nTok >= 2, size(TextHashExprs.shingleSet(toks, 2))).otherwise(lit(0))
      val dupFrac = when(nBi > 0, (nBi - nDist).cast("double") / nBi).otherwise(lit(0.0))
      df.filter(nTok >= minTokens && dupFrac < maxDupFraction)
    }
  }

  /** Adds `lang_pred` via the single-pass indicator kernel. Stateless. */
  object LangIdRule extends Rule {
    val name = "langId"
    def apply(df: DataFrame): DataFrame = {
      val langs = TextAnalysis.indicators.map(_._1)
      val scores = TextHashExprs.langScores(Dedup.tokens(col("text")))
      val best = array_max(scores)
      val pred = langs.zipWithIndex.foldRight(lit("und")) { case ((lang, i), elseCol) =>
        when(scores.getItem(i) > 0 && scores.getItem(i) === best, lang).otherwise(elseCol)
      }
      df.withColumn("lang_pred", pred)
    }
  }

  /** Exact dedup on the normalized-text fingerprint.
    *
    * Batch keeps the lexicographically SMALLEST row of each duplicate
    * group (min over a struct of all columns) — `dropDuplicates` keeps
    * whichever task finishes first, which flips under concurrent load;
    * a dedup DECISION must be replayable. Streaming keeps first-arrival
    * semantics (`dropDuplicates` is the append-mode-compatible form;
    * arrival order IS the stream's semantics, as in the reference's
    * KV). State there is one fingerprint per distinct doc — bound it
    * with StreamJoins.dedupExact when the stream carries event time.
    */
  object ExactDedupRule extends Rule {
    val name = "exactDedup"
    def apply(df: DataFrame): DataFrame = {
      val cols = df.columns
      df.withColumn("_fp", md5(array_join(Dedup.tokens(col("text")), " ")))
        .groupBy(col("_fp"))
        .agg(min(struct(cols.map(col): _*)).as("_row"))
        .select(cols.map(c => col(s"_row.$c")): _*)
    }
    override def applyStreaming(df: DataFrame): DataFrame =
      df.withColumn("_fp", md5(array_join(Dedup.tokens(col("text")), " ")))
        .dropDuplicates("_fp")
        .drop("_fp")
  }

  /** Near-duplicate dedup on the 64-bit SimHash bucket: docs whose
    * token streams hash to the same signature are near-identical
    * (Charikar '02), and the rule keeps one representative per bucket.
    * 64 bits, not the oracle-checked 16 (q36): a dedup DECISION needs a
    * bucket space far wider than the corpus, or pigeonhole collisions
    * silently delete unrelated docs past ~10^4 documents.
    *
    * Batch keeps the lexicographically smallest row (replayable, like
    * [[ExactDedupRule]]). Streaming keeps first arrival via
    * `dropDuplicates` on the signature — state grows with distinct
    * signatures; bound it with a watermark (StreamJoins.dedupExact
    * pattern) when the stream carries event time. For graded
    * thresholds use the full MinHash-LSH batch path (operators.Dedup) —
    * the single-bucket form is the coarse streaming tier.
    */
  object NearDupRule extends Rule {
    val name = "nearDup"
    private def sim = TextHashExprs.simhash64(Dedup.tokens(col("text")))
    def apply(df: DataFrame): DataFrame = {
      val cols = df.columns
      df.withColumn("_sim", sim)
        .groupBy(col("_sim"))
        .agg(min(struct(cols.map(col): _*)).as("_row"))
        .select(cols.map(c => col(s"_row.$c")): _*)
    }
    override def applyStreaming(df: DataFrame): DataFrame =
      df.withColumn("_sim", sim)
        .dropDuplicates("_sim")
        .drop("_sim")
  }

  val all: Seq[Rule] = Seq(new QualityFilterRule(), LangIdRule, ExactDedupRule, NearDupRule)
}
