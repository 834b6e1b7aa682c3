package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: language
  * identification, quality scoring, token counting, and document
  * fingerprinting. All pure Catalyst expressions (codegen'd, no UDFs),
  * all deterministic and engine-portable.
  */
object TextAnalysis {

  /** Indicator stopwords per language — the classic cheap language-ID
    * heuristic: score = number of tokens found in each language's
    * closed-class word list, argmax wins. (A production system would
    * use char-n-gram profiles; the harness — per-language score columns,
    * deterministic argmax with alphabetic tie-break — is identical.)
    */
  val indicators: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que"),
    "zh" -> Seq("de", "le", "shi", "zai", "you", "wo", "ta", "men")
  )

  /** Number of tokens contained in `words`. */
  def indicatorHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Predicted language: argmax of indicator hits, ties broken by
    * alphabetic language order; no hits at all → "und" (undetermined,
    * the BCP-47 convention).
    */
  def langId(toks: Column): Column = {
    val scored = indicators.map { case (lang, words) => (lang, indicatorHits(toks, words)) }
    val best = scored
      .map(_._2)
      .reduce((a, b) => when(a >= b, a).otherwise(b)) // max, first-wins ⇒ alphabetic tie-break
    scored.foldRight(lit("und")) { case ((lang, score), elseCol) =>
      when(score > 0 && score === best, lang).otherwise(elseCol)
    }
  }

  /** Canonical content fingerprint: md5 of the whitespace-normalized,
    * lower-cased token stream. Detects reformatted exact duplicates
    * that raw-byte hashing misses.
    */
  def canonicalFingerprint(text: Column): Column =
    md5(array_join(Dedup.tokens(text), " "))

  /** Positional rolling hash (order-sensitive, unlike a bag-of-words
    * hash): fold over (token, index), h = (h * 31 + tokHash(t, i)) mod p
    * with p < 2^30 so every intermediate fits in a long on any engine.
    */
  def rollingHash(toks: Column): Column = {
    val p = lit(1073741789L) // largest prime < 2^30
    // per-token value: first 7 hex digits of md5 → 28-bit int, position-salted
    val tokVal = (t: Column, i: Column) => conv(md5(concat(i.cast("string"), lit("@"), t)).substr(1, 7), 16, 10).cast("long")
    aggregate(
      zip_with(toks, sequence(lit(0), size(toks) - 1), (t, i) => tokVal(t, i)),
      lit(0L),
      (acc, v) => pmod(acc * 31L + v, p)
    )
  }

  /** BPE-ish subword count: word tokens plus punctuation runs, the
    * standard cheap proxy for tokenizer cost before a real BPE pass.
    * Word characters are Unicode letters/digits of ANY script — an
    * ASCII-only class would collapse a Cyrillic/Arabic/CJK document to
    * one "token" and wreck every cost estimate built on it. Han
    * ideographs additionally split per character (BPE tokenizers emit
    * roughly one token per ideograph in unspaced CJK text).
    */
  def tokenCountBpeIsh(text: Column): Column =
    size(
      filter(
        split(
          lower(text),
          "(?<=[\\p{L}\\p{N}])(?![\\p{L}\\p{N}])|(?<![\\p{L}\\p{N}])(?=[\\p{L}\\p{N}])|(?<=\\p{IsHan})(?=\\p{IsHan})"
        ),
        t => length(trim(t)) > 0
      )
    )

  // ---- Gopher quality rules (Rae et al. 2021, Appendix A1.1) -----------------

  /** The Gopher stop-word indicator list (the paper uses a similar
    * closed-class set; a doc must contain at least 2 DISTINCT entries).
    */
  val gopherStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Count of ALL tokens in `arr`'s most frequent element, computed as
    * the longest run of equal adjacent entries of the SORTED array —
    * O(n log n) per doc instead of the O(n²) count-each-distinct
    * lambda (the quadratic-lambda pitfall `ImportanceWeights
    * .gramsOfToks` documents). Pure fold, so it stays inside codegen.
    */
  def maxElementCount(arr: Column): Column =
    aggregate(
      sort_array(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best")
    )

  /** Per-document Gopher rule metrics over a lower-cased token array.
    * Every ratio is an exact-integer quotient evaluated once in IEEE
    * double, so the metrics hash-match an external replay bit-for-bit.
    * Line-based rules (bullet/ellipsis line fractions) apply only to
    * corpora with line structure; on a single-line corpus they are the
    * whole-doc symbol ratios and fold into `alpha_ratio`.
    */
  def gopherMetrics(toks: Column): Seq[Column] = {
    val n = size(toks)
    def ngrams(j: Int) = transform(
      sequence(lit(0), n - j),
      i => concat_ws(" ", slice(toks, i + 1, lit(j))))
    // DELIBERATE DEVIATION from A1.1: the paper measures the top
    // n-gram's share as a CHARACTER fraction; this metric is the
    // TOKEN fraction (occurrences·n / word count), because the token
    // form keeps every quotient an exact integer ratio that
    // hash-replays across engines. gopherKeep applies the paper's
    // threshold VALUES (0.20/0.18/0.16) to this token-fraction metric.
    def topNgramFrac(j: Int) =
      when(n >= j, (maxElementCount(ngrams(j)) * j.toLong).cast("double") / n)
        .otherwise(lit(0.0))
    // '#' occurrences plus '...' runs (leftmost non-overlapping, the
    // same replace semantics in both engines; the length delta of a
    // '...' removal is an exact multiple of 3)
    val symCount = aggregate(
      toks,
      lit(0L),
      (a, w) =>
        a + (length(w) - length(replace(w, lit("#"), lit("")))).cast("long") +
          ((length(w) - length(replace(w, lit("..."), lit("")))) / 3).cast("long"))
    Seq(
      n.as("n_words"),
      (aggregate(toks, lit(0L), (a, w) => a + length(w)).cast("double") / n)
        .as("mean_word_len"),
      (size(filter(toks, w => w.rlike("[a-z]"))).cast("double") / n).as("alpha_ratio"),
      (symCount.cast("double") / n).as("symbol_word_ratio"),
      size(filter(typedLit(gopherStopwords), sw => array_contains(toks, sw)))
        .as("n_stop_distinct"),
      topNgramFrac(2).as("top_bigram_frac"),
      topNgramFrac(3).as("top_3gram_frac"),
      topNgramFrac(4).as("top_4gram_frac")
    )
  }

  /** The line-structure half of the Gopher bundle (A1.1's "90% of
    * lines starting with a bullet" / "30% ending with an ellipsis"
    * rules), meaningful only for corpora that carry newlines — a
    * single-line document is one line, so the fractions are 0 or 1 and
    * [[gopherLineKeep]] still behaves sensibly. Kept separate from
    * [[gopherMetrics]] so the oracle-gated token metrics stay
    * line-agnostic.
    */
  def gopherLineMetrics(text: Column): Seq[Column] = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val n = size(lines)
    Seq(
      n.as("n_lines"),
      when(n > 0,
        size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("double") / n)
        .otherwise(lit(0.0))
        .as("bullet_line_frac"),
      when(n > 0,
        size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") / n)
        .otherwise(lit(0.0))
        .as("ellipsis_line_frac"),
      // A1.2's duplicate-line fraction: EVERY copy of a repeated line
      // counts as a duplicate ("lines that are duplicates of other
      // lines"), so the numerator is n minus the singleton count —
      // not n minus distinct, which would charge k-1 of k copies
      when(n > 0, (n.cast("long") - singletonCount(lines)).cast("double") / n)
        .otherwise(lit(0.0))
        .as("dup_line_frac")
    )
  }

  /** Count of elements that occur exactly once, as a sorted-run fold
    * (O(n log n), same shape as [[maxElementCount]]). The empty-string
    * `prev` sentinel is safe: callers pass arrays of non-empty
    * strings.
    */
  def singletonCount(arr: Column): Column =
    aggregate(
      sort_array(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("single")),
      (acc, x) => {
        val newGrp = x =!= acc.getField("prev")
        struct(
          x.as("prev"),
          when(newGrp, lit(1L)).otherwise(acc.getField("run") + 1L).as("run"),
          when(newGrp && acc.getField("run") === 1L, acc.getField("single") + 1L)
            .otherwise(acc.getField("single"))
            .as("single"))
      },
      acc =>
        acc.getField("single") +
          when(acc.getField("run") === 1L, lit(1L)).otherwise(lit(0L)))

  /** Gopher's line-rule keep decision: ≤90% bullet lines, ≤30%
    * ellipsis-terminated lines, ≤30% duplicate lines (A1.2).
    */
  def gopherLineKeep: Column =
    col("bullet_line_frac") <= 0.9 && col("ellipsis_line_frac") <= 0.3 &&
      col("dup_line_frac") <= 0.3

  /** The Gopher keep decision over [[gopherMetrics]] columns: word
    * count in [minWords, 100k], mean word length in [3, 10], ≥80% of
    * words alphabetic, symbol-to-word ratio ≤10% (A1.1's '#'/'...'
    * rule), ≥2 distinct stop words, and A1.1's decreasing repetition
    * caps on the most frequent 2/3/4-gram — the paper's thresholds
    * (≤20%/18%/16%), applied to the token-fraction metrics (the paper
    * states them as character fractions; see [[gopherMetrics]] for why
    * the token form is used). The paper's word floor of 50 assumes web
    * documents; short-doc corpora tune `minWords` down.
    */
  def gopherKeep(minWords: Int = 50): Column =
    col("n_words") >= minWords && col("n_words") <= 100000 &&
      col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
      col("alpha_ratio") >= 0.8 &&
      col("symbol_word_ratio") <= 0.1 &&
      col("n_stop_distinct") >= 2 &&
      col("top_bigram_frac") <= 0.20 &&
      col("top_3gram_frac") <= 0.18 &&
      col("top_4gram_frac") <= 0.16

  // ---- C4 filters (Raffel et al. 2020, §2.2) --------------------------------

  /** Default blocklist — a deliberately tiny stand-in for C4's
    * published "List of Dirty, Naughty, Obscene or Otherwise Bad
    * Words"; the mechanism (page dropped if ANY token matches) is what
    * the operator implements, and the list is an injectable parameter
    * of [[c4PageMetrics]] / `C4FilterRule` (a realistic list ships as
    * the `c4_blocklist.txt` test fixture). The word list itself is a
    * deployment choice.
    */
  val c4Blocklist: Seq[String] = Seq("casino", "viagra", "lottery")

  /** C4's line-level retention over a `\n`-separated page: keep a line
    * iff it ends in terminal punctuation (`.` `!` `?` or a closing
    * quote), has at least `minLineWords` words (Raffel et al. 2020
    * §2.2 retains "lines that contained at least 5 words"), and does
    * not mention "javascript".
    */
  def c4KeptLines(page: Column, minLineWords: Int = 5): Column =
    filter(
      split(page, "\n"),
      l =>
        trim(l).rlike("[.!?\"]$") &&
          size(filter(split(trim(l), "\\s+"), w => length(w) > 0)) >= minLineWords &&
          !lower(l).contains("javascript"))

  /** C4's page-level metric columns, computed over the RETAINED lines
    * (sentence count) and the raw page (content checks): sentence
    * count = terminal-punctuation count of the cleaned text; flags for
    * "lorem ipsum", `{` (code), and blocklist tokens.
    */
  def c4PageMetrics(
      page: Column,
      minLineWords: Int = 5,
      blocklist: Seq[String] = c4Blocklist): Seq[Column] = {
    val kept = c4KeptLines(page, minLineWords)
    val cleaned = array_join(kept, "\n")
    val toksAll = split(trim(lower(page)), "\\s+")
    Seq(
      size(split(page, "\n")).as("n_lines"),
      size(kept).as("n_kept_lines"),
      length(regexp_replace(cleaned, "[^.!?]", "")).as("n_sentences"),
      lower(page).contains("lorem ipsum").as("has_lorem"),
      page.contains("{").as("has_brace"),
      (size(filter(toksAll, t => t.isInCollection(blocklist))) > 0).as("has_blockword"),
      length(cleaned).as("cleaned_len")
    )
  }

  /** The C4 keep decision over [[c4PageMetrics]] columns: at least
    * `minSentences` sentences survive line cleaning (Raffel et al.
    * 2020 §2.2 discards "any page with fewer than 3 sentences") and
    * none of the page-level content flags fire.
    */
  def c4Keep(minSentences: Int = 3): Column =
    col("n_sentences") >= minSentences &&
      !col("has_lorem") && !col("has_brace") && !col("has_blockword")
}
