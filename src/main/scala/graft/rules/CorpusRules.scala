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

  /** The dedup keepers pick the MINIMUM row by ordering the full row
    * struct — deterministic under any partitioning, but that requires
    * every passthrough column to be ORDERABLE (maps are not). Fail
    * with the offending columns named instead of the analysis-time
    * "cannot be used in grouping/ordering" exception deep inside the
    * pipeline plan.
    */
  private def requireOrderable(df: DataFrame, rule: String): Unit = {
    val bad = df.schema.fields.filterNot(f =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
    require(
      bad.isEmpty,
      s"$rule keeps the minimum row by ordering ALL columns; unorderable column(s): " +
        bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ") +
        " — drop or serialize them before this rule"
    )
  }

  /** Streaming first-arrival dedup with BOUNDED state when the
    * pipeline declares event time. Unbounded `dropDuplicates` state is
    * the exact hazard StreamJoins.dedupExact documents: one state entry
    * per distinct key, never dropped, grows for the query's lifetime.
    * Rules are zero-arg plugins, so the event-time declaration rides
    * the session conf like CorpusMatchRule's parameters:
    *
    *   - `spark.graft.stream.eventTimeCol`   — event-time column of the
    *     streaming input; when set, dedup state is watermark-bounded
    *     (`dropDuplicatesWithinWatermark`) and repeats arriving later
    *     than the horizon re-emit (the documented tradeoff).
    *   - `spark.graft.stream.watermarkDelay` — horizon, default "24 hours".
    *
    * Without the conf the dedup falls back to exact first-arrival with
    * per-distinct-key state — acceptable only when the keyspace is
    * known to stay small (e.g. CorpusMatchRule's alert pairs, bounded
    * by the reference corpus × offending inputs). A declared column
    * missing from the frame fails loudly: a typo must not silently
    * reintroduce unbounded state.
    *
    * NULL event times fail loudly too: the watermark operator would
    * otherwise DROP such rows silently — a data-dependent semantic
    * divergence from the conf-off path, which keeps them. A source
    * with legitimately-optional timestamps must coalesce them to a
    * real time (ingest time, usually) or not declare an event-time
    * column.
    */
  private[rules] def streamDedupFirstArrival(df: DataFrame, keys: Seq[String]): DataFrame = {
    val conf = df.sparkSession.conf
    conf.getOption("spark.graft.stream.eventTimeCol") match {
      case Some(ts) =>
        require(
          df.columns.contains(ts),
          s"spark.graft.stream.eventTimeCol=$ts is not a column of the stream " +
            s"(${df.columns.mkString(", ")})")
        val delay = conf.getOption("spark.graft.stream.watermarkDelay").getOrElse("24 hours")
        val guarded = df.withColumn(
          ts,
          when(
            col(ts).isNull,
            raise_error(lit(
              s"null $ts in stream: the watermarked dedup would silently drop this row — " +
                s"coalesce the timestamp upstream or unset spark.graft.stream.eventTimeCol")))
            .otherwise(col(ts)))
        guarded.withWatermark(ts, delay).dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
      case None =>
        df.dropDuplicates(keys.head, keys.tail: _*)
    }
  }

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
      requireOrderable(df, name)
      val cols = df.columns
      df.withColumn("_fp", md5(array_join(Dedup.tokens(col("text")), " ")))
        .groupBy(col("_fp"))
        .agg(min(struct(cols.map(col): _*)).as("_row"))
        .select(cols.map(c => col(s"_row.$c")): _*)
    }
    override def applyStreaming(df: DataFrame): DataFrame =
      streamDedupFirstArrival(
        df.withColumn("_fp", md5(array_join(Dedup.tokens(col("text")), " "))),
        Seq("_fp")
      ).drop("_fp")
  }

  /** Near-duplicate dedup with EXACT semantics: two docs are near-dups
    * iff their 64-bit SimHashes (Charikar '02) differ in at most 3
    * bits. Candidate generation is banded LSH — the signature splits
    * into 4×16-bit bands and any pair within Hamming distance 3 shares
    * a band by pigeonhole, so recall is 100% — and every candidate is
    * then VERIFIED with an exact popcount before clustering: random
    * 16-bit band collisions (which would otherwise chain unrelated
    * docs into giant components past ~10^4 docs) never survive.
    * Components of verified pairs each keep their minimum-id row — the
    * q51 decision shape at SimHash cost (no shingling).
    * `maxBucketSize` guards the quadratic pair explosion of degenerate
    * bands (the band space is only 65536 values; big corpora WILL fill
    * it) — over-limit buckets are dropped, their members still pair in
    * other bands.
    *
    * Row identity is the 60-bit md5 of the raw text (stable across
    * runs/partitionings, so the decision is replayable); exact
    * duplicates share an id and collapse in the final keeper step.
    *
    * CAVEAT: the clustering stage runs Spark jobs EAGERLY when the
    * rule is applied (plan construction), so compiling a batch pipeline
    * with this rule executes the clustering then — sources must not
    * change between compile and run. The ConnectedComponents call runs
    * with tuneSession=false, so the shared pipeline session's conf is
    * never mutated under concurrent queries.
    *
    * Streaming cannot run the iterative clustering: applyStreaming
    * keeps first arrival per EXACT 64-bit signature — the near-exact
    * tier. True streaming near-dup (each doc vs everything ingested
    * before it) is [[graft.streaming.StreamingDedup.nearDupIngest]] —
    * micro-batches against ingest-time staging tables with corpus
    * memory and replay idempotence.
    */
  object NearDupRule extends Rule {
    val name = "nearDup"
    private val MaxHamming = 3
    private def sig = TextHashExprs.simhash64(Dedup.tokens(col("text")))
    private def rowId = TextHashExprs.md5Slice60(col("text"), 0)
    def apply(df: DataFrame): DataFrame = {
      requireOrderable(df, name)
      val cols = df.columns
      val withId = df.withColumn("_ndid", rowId).withColumn("_sig", sig)
      val bands = withId.select(
        col("_ndid"),
        posexplode(
          array((0 to 3).map(b => shiftrightunsigned(col("_sig"), 16 * b).bitwiseAND(0xffffL)): _*)
        ).as(Seq("band", "band_hash"))
      )
      val sigs = withId.select(col("_ndid"), col("_sig")).distinct()
      val pairs = Dedup
        .candidatePairs(bands, "_ndid", maxBucketSize = 10000)
        .join(sigs.select(col("_ndid").as("id1"), col("_sig").as("_s1")), "id1")
        .join(sigs.select(col("_ndid").as("id2"), col("_sig").as("_s2")), "id2")
        .filter(bit_count(col("_s1").bitwiseXOR(col("_s2"))) <= MaxHamming)
        .select("id1", "id2")
      val clusters = graft.operators
        .ConnectedComponents(pairs, "id1", "id2", tuneSession = false)
        .withColumnRenamed("id", "_ndid")
      withId
        .join(clusters, Seq("_ndid"), "left_outer")
        .filter(col("component").isNull || col("component") === col("_ndid"))
        .groupBy(col("_ndid")) // exact dups share an id — keep one row
        .agg(min(struct(cols.map(col): _*)).as("_row"))
        .select(cols.map(c => col(s"_row.$c")): _*)
    }
    override def applyStreaming(df: DataFrame): DataFrame =
      streamDedupFirstArrival(df.withColumn("_sig", sig), Seq("_sig")).drop("_sig")
  }

  /** Match incoming docs against a static REFERENCE corpus by near-dup
    * (MinHash-LSH candidates + exact-Jaccard verify) — the ingest-time
    * form of decontamination: benchmark/eval matches, known-bad content
    * and PII blocklists all reduce to "does this doc near-dup anything
    * in that corpus?". Output = matching input rows + `corpus_match_id`
    * (md5 of the matched corpus text) + `jaccard`; one row per distinct
    * (input text, corpus doc) match. Clean docs pass through NOTHING —
    * this is the quarantine/alert feed (route it to a queue sink), the
    * corpus-side dual of q94's incremental pairing; batch filtering of
    * the clean remainder is q65/q80's job.
    *
    * Rules are zero-arg plugins (the reference's .so model), so
    * parameters ride the session conf:
    *   - `spark.graft.corpusMatch.corpus`    — required parquet path with a `text` column
    *   - `spark.graft.corpusMatch.threshold` — Jaccard cutoff, default 0.5
    *   - `spark.graft.corpusMatch.k`         — shingle width, default 3
    *   - `spark.graft.corpusMatch.numHashes` — MinHash signature length, default 8
    *   - `spark.graft.corpusMatch.bands`     — LSH bands (must divide numHashes),
    *     default 4. More hashes/bands = higher candidate recall at higher
    *     signature cost — tune for the corpus's near-dup tightness.
    *
    * Scale/streaming shape: the corpus side is STATIC — its band rows
    * and shingle sets behave as a lookup table (stream-static inner
    * joins, append-safe, no watermark). The only state is streaming's
    * first-arrival alert dedup, one entry per distinct alert pair.
    * Batch dedups deterministically (min row per pair, like
    * [[ExactDedupRule]]).
    */
  object CorpusMatchRule extends Rule {
    val name = "corpusMatch"

    private def matches(df: DataFrame, persistCorpus: Boolean): DataFrame = {
      val spark = df.sparkSession
      val corpusDir = spark.conf.getOption("spark.graft.corpusMatch.corpus").getOrElse(
        throw new IllegalArgumentException(
          s"$name needs spark.graft.corpusMatch.corpus = <parquet dir with a text column>"))
      val threshold =
        spark.conf.getOption("spark.graft.corpusMatch.threshold").map(_.toDouble).getOrElse(0.5)
      val K = spark.conf.getOption("spark.graft.corpusMatch.k").map(_.toInt).getOrElse(3)
      val NumHashes =
        spark.conf.getOption("spark.graft.corpusMatch.numHashes").map(_.toInt).getOrElse(8)
      val Bands = spark.conf.getOption("spark.graft.corpusMatch.bands").map(_.toInt).getOrElse(4)
      require(K >= 1 && NumHashes >= 1 && Bands >= 1,
        s"$name LSH parameters must be positive (k=$K, numHashes=$NumHashes, bands=$Bands)")
      require(NumHashes % Bands == 0,
        s"$name: spark.graft.corpusMatch.bands ($Bands) must divide numHashes ($NumHashes)")
      // Output + working column names must not collide with the input's
      // (the internal ones are _-prefixed like the sibling rules'; the
      // two output names are part of this rule's contract) — fail with
      // the names spelled out instead of an ambiguous-reference
      // AnalysisException deep inside the join.
      val reserved = Seq("corpus_match_id", "jaccard", "_did", "_insh", "_csh", "_band", "_band_hash")
      val clash = df.columns.toSet.intersect(reserved.toSet)
      require(clash.isEmpty, s"$name reserves column name(s) ${clash.mkString(", ")} — rename them upstream")
      // Corpus side: one band row per (distinct text, band), the shingle
      // set carried alongside so the verify needs no second corpus join.
      // Benchmark corpora are small next to the stream; duplicating the
      // shingle array per band row trades bytes for a join.
      val cbandsPlain = df.sparkSession.read
        .parquet(corpusDir)
        .select(md5(col("text")).as("corpus_match_id"),
          TextHashExprs.shingleSet(Dedup.tokens(col("text")), K).as("_csh"))
        .filter(size(col("_csh")) > 0)
        .dropDuplicates("corpus_match_id")
        .select(
          col("corpus_match_id"),
          col("_csh"),
          posexplode(
            Dedup.bandHashes(TextHashExprs.minhashSig(col("_csh"), NumHashes), Bands, NumHashes / Bands)
          ).as(Seq("_band", "_band_hash"))
        )
      // Streaming re-evaluates the static join side EVERY microbatch —
      // persist makes it the actual lookup table (computed once, read
      // per trigger). Lives for the query's lifetime; swap the corpus by
      // restarting the query (it is a static snapshot either way).
      val cbands =
        if (persistCorpus) cbandsPlain.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else cbandsPlain
      val cols = df.columns
      df
        .withColumn("_did", md5(col("text")))
        .withColumn("_insh", TextHashExprs.shingleSet(Dedup.tokens(col("text")), K))
        .filter(size(col("_insh")) > 0)
        .select(
          (cols.map(col) :+ col("_did") :+ col("_insh")) :+
            posexplode(
              Dedup.bandHashes(TextHashExprs.minhashSig(col("_insh"), NumHashes), Bands, NumHashes / Bands)
            ).as(Seq("_band", "_band_hash")): _*
        )
        .join(cbands, Seq("_band", "_band_hash"))
        .withColumn("jaccard", Dedup.jaccard(col("_insh"), col("_csh")))
        .filter(col("jaccard") >= threshold)
        .select((cols.map(col) :+ col("_did") :+ col("corpus_match_id") :+ col("jaccard")): _*)
    }

    def apply(df: DataFrame): DataFrame = {
      requireOrderable(df, name)
      val out = df.columns :+ "corpus_match_id" :+ "jaccard"
      matches(df, persistCorpus = false)
        .groupBy(col("_did"), col("corpus_match_id"))
        .agg(min(struct(out.map(col): _*)).as("_row"))
        .select(out.map(c => col(s"_row.$c")): _*)
    }

    /** First-arrival alert per (input text, corpus doc) — state is one
      * fingerprint pair per distinct alert, not per stream row. Set
      * `spark.graft.stream.eventTimeCol` to bound that state by
      * watermark (see [[streamDedupFirstArrival]]); without it the
      * state grows with distinct matching texts, acceptable only while
      * the alert keyspace stays small.
      */
    override def applyStreaming(df: DataFrame): DataFrame =
      streamDedupFirstArrival(
        matches(df, persistCorpus = true),
        Seq("_did", "corpus_match_id")
      ).drop("_did")
  }

  /** DSIR-style importance filter: keep docs whose hashed-ngram
    * importance weight against a PRE-FIT model clears a per-gram
    * threshold — the ingest-time form of q99's selection (the
    * production DSIR flow: fit the bucket model offline with
    * `ImportanceWeights.bucketScores` and persist it; filter every
    * batch/stream against that snapshot).
    *
    * Entirely map-side and ZERO-state: the model (<= 64k rows) loads
    * once at compile time into a literal lookup map, and the per-doc
    * weight folds over the gram array inside the row — no explode, no
    * shuffle, no groupBy, so the rule streams in append mode with no
    * aggregation state (unlike a naive port of q99's explode+groupBy
    * plan, which would be a streaming aggregation).
    *
    * The keep decision is pure integer arithmetic (exact, replayable):
    *   keep iff w_units >= minAvgUnits * n_grams
    * i.e. the doc's MEAN per-gram score in 1e-6 units clears the bar —
    * length-normalized without a division. minAvgUnits = 1e6 means
    * "more target-like than background on average".
    *
    * Conf (zero-arg plugin, like the sibling rules):
    *   - `spark.graft.importance.model`        — required parquet path
    *     with (bucket: string, units: long) — `bucketScores` output
    *   - `spark.graft.importance.minAvgUnits`  — default 1000000
    *   - `spark.graft.importance.defaultUnits` — score for grams whose
    *     bucket the model never saw, default 1000000 (neutral). A
    *     model fit on the full corpus observes every bucket the corpus
    *     produces, so this only fires on drift.
    *
    * Adds `imp_units` (decimal(38,0) — matching the operator's
    * overflow-free accumulator: unit×gram sums with a skewed model
    * can exceed Long range, and a silent wrap would flip the keep
    * decision) and `imp_grams` (long) to surviving rows for
    * downstream logging/threshold audits.
    */
  object ImportanceFilterRule extends Rule {
    val name = "importanceFilter"
    def apply(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      val path = spark.conf.getOption("spark.graft.importance.model").getOrElse(
        throw new IllegalArgumentException(
          s"$name needs spark.graft.importance.model = <parquet dir with (bucket, units)>"))
      val minAvg =
        spark.conf.getOption("spark.graft.importance.minAvgUnits").map(_.toLong).getOrElse(1000000L)
      val dflt =
        spark.conf.getOption("spark.graft.importance.defaultUnits").map(_.toLong).getOrElse(1000000L)
      val reserved = Seq("imp_units", "imp_grams", "_toks")
      val clash = df.columns.toSet.intersect(reserved.toSet)
      require(clash.isEmpty, s"$name reserves column name(s) ${clash.mkString(", ")} — rename them upstream")
      val entries = spark.read.parquet(path).select("bucket", "units").collect()
      require(entries.nonEmpty, s"$name: empty model at $path")
      require(entries.length <= 65536,
        s"$name: model at $path has ${entries.length} buckets — beyond the literal-map form; " +
          "shrink the bucket space or join against the model table instead")
      val modelMap = map(entries.flatMap(r => Seq(lit(r.getString(0)), lit(r.getLong(1)))): _*)
      val g = graft.operators.ImportanceWeights.gramsOfToks(col("_toks"))
      val units = transform(
        g,
        gr => coalesce(
          element_at(modelMap, substring(md5(gr), 1, 2)),
          lit(dflt)))
      val out = df
        .withColumn("_toks", split(trim(lower(col("text"))), "\\s+"))
        // decimal(38,0) accumulator, like ImportanceWeights.score: a
        // rare-domain model can hold units ~1e12, and 1e12 × a
        // multi-million-gram doc overflows Long silently
        .withColumn(
          "imp_units",
          aggregate(units, lit(0L).cast("decimal(38,0)"), (acc, x) => acc + x))
        .withColumn("imp_grams", size(g).cast("long"))
        .drop("_toks")
      out.filter(col("imp_units") >= lit(minAvg).cast("decimal(38,0)") * col("imp_grams"))
    }
  }

  /** The Gopher rule bundle (Rae et al. 2021, A1.1) as an ingest-time
    * filter: drops documents failing the published quality rules and
    * keeps the metric columns on survivors for threshold audits —
    * q103 is the batch/oracle twin of this rule. Stateless, one
    * codegen'd projection per row; the top-bigram cap uses the
    * O(B log B) sorted-run fold, never the O(B²) count-per-distinct
    * lambda. `spark.graft.gopher.minWords` overrides the word-count
    * floor (the paper's 50 assumes web documents; short-doc corpora
    * tune it down).
    */
  object GopherFilterRule extends Rule {
    val name = "gopherFilter"
    def apply(df: DataFrame): DataFrame = {
      val minWords = df.sparkSession.conf
        .getOption("spark.graft.gopher.minWords")
        .map(_.toInt)
        .getOrElse(50)
      val reserved =
        Seq("n_words", "mean_word_len", "alpha_ratio", "symbol_word_ratio", "n_stop_distinct",
          "top_bigram_frac", "top_3gram_frac", "top_4gram_frac",
          "n_lines", "bullet_line_frac", "ellipsis_line_frac", "dup_line_frac", "_toks")
      val clash = df.columns.toSet.intersect(reserved.toSet)
      require(
        clash.isEmpty,
        s"$name reserves column name(s) ${clash.mkString(", ")} — rename them upstream")
      // materialize the token array before the per-bigram lambdas
      // (unmaterialized split re-runs per position — quadratic)
      df.withColumn("_toks", split(trim(lower(col("text"))), "\\s+"))
        .select(
          col("*") +:
            (TextAnalysis.gopherMetrics(col("_toks")) ++
              TextAnalysis.gopherLineMetrics(col("text"))): _*)
        .drop("_toks")
        .filter(TextAnalysis.gopherKeep(minWords) && TextAnalysis.gopherLineKeep)
    }
  }

  /** The C4 filter set (Raffel et al. 2020, §2.2) as an ingest-time
    * rule over multi-line pages in `text`: line-level retention
    * (terminal punctuation, ≥5 words, no "javascript"), page-level
    * rejection (lorem ipsum, `{`, blocklist tokens, <3 surviving
    * sentences) — the paper's published defaults. Survivors get their
    * `text` REPLACED by the cleaned retained lines — C4 is a
    * transform, not just a filter — with the metric columns kept for
    * audits. q113 is the batch/oracle twin of the metric half.
    * `spark.graft.c4.minSentences` overrides the sentence floor;
    * `spark.graft.c4.blocklist` (a comma-separated token list, or
    * `file:<path>` naming a newline-separated list file) replaces the
    * placeholder [[TextAnalysis.c4Blocklist]] with a deployment's real
    * "bad words" list.
    */
  object C4FilterRule extends Rule {
    val name = "c4Filter"

    /** Resolve the session-configured blocklist: inline CSV, a
      * `file:` path to a newline-separated list (blank lines and
      * `#`-comments skipped), or the placeholder default.
      */
    private[rules] def blocklist(df: DataFrame): Seq[String] =
      df.sparkSession.conf.getOption("spark.graft.c4.blocklist") match {
        case Some(v) if v.startsWith("file:") =>
          val src = scala.io.Source.fromFile(v.stripPrefix("file:"), "UTF-8")
          try src.getLines().map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toList
          finally src.close()
        case Some(v) => v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        case None => TextAnalysis.c4Blocklist
      }

    def apply(df: DataFrame): DataFrame = {
      val minSentences = df.sparkSession.conf
        .getOption("spark.graft.c4.minSentences")
        .map(_.toInt)
        .getOrElse(3)
      val reserved =
        Seq("n_lines", "n_kept_lines", "n_sentences", "has_lorem", "has_brace",
          "has_blockword", "cleaned_len", "_kept")
      val clash = df.columns.toSet.intersect(reserved.toSet)
      require(
        clash.isEmpty,
        s"$name reserves column name(s) ${clash.mkString(", ")} — rename them upstream")
      df.withColumn("_kept", TextAnalysis.c4KeptLines(col("text")))
        .select(col("*") +: TextAnalysis.c4PageMetrics(col("text"), blocklist = blocklist(df)): _*)
        .filter(TextAnalysis.c4Keep(minSentences))
        .withColumn("text", array_join(col("_kept"), "\n"))
        .drop("_kept")
    }
  }

  /** Trained-model quality filter: keep docs a PRE-FIT NBSVM-style
    * classifier scores at or above its calibrated operating point —
    * the ingest-time form of q133's scoring (the production flow for
    * model-based quality filtering: fit offline with
    * [[graft.operators.QualityClassifier.fit]], persist, filter every
    * batch/stream against that snapshot, refit on drift — the same
    * lifecycle as [[ImportanceFilterRule]]'s DSIR model).
    *
    * Entirely map-side and ZERO-state, like the DSIR twin: the weight
    * table (vocabulary-bounded — charset³ at most, df-pruned in
    * practice) loads once at compile time into a literal lookup map,
    * and the per-doc score folds over the DISTINCT-trigram array
    * inside the row — no explode, no shuffle, no groupBy, so the rule
    * streams in append mode with no aggregation state. Weight sums are
    * exact BIGINT; the score is the same two IEEE divisions the batch
    * query performs, so rule decisions replay bit-identically against
    * q133's predictions (QualityClassifierRuleSpec pins the parity).
    *
    * Conf (zero-arg plugin, like the sibling rules):
    *   - `spark.graft.quality.model`    — required dir written by
    *     QualityClassifier.fit (weights/ + tau/)
    *   - `spark.graft.quality.minScore` — optional double overriding
    *     the model's calibrated threshold (tighten for recall-critical
    *     corpora, loosen for coverage)
    *
    * Adds `qc_hits` (long: matched trigram types) and `qc_score`
    * (double: mean matched weight; 0.5 = the no-evidence prior) to
    * surviving rows for downstream threshold audits.
    */
  object QualityClassifierRule extends Rule {
    val name = "qualityClassifier"
    def apply(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      val path = spark.conf.getOption("spark.graft.quality.model").getOrElse(
        throw new IllegalArgumentException(
          s"$name needs spark.graft.quality.model = <dir written by QualityClassifier.fit>"))
      val reserved = Seq("qc_hits", "qc_score", "_tx", "_wis")
      val clash = df.columns.toSet.intersect(reserved.toSet)
      require(clash.isEmpty, s"$name reserves column name(s) ${clash.mkString(", ")} — rename them upstream")
      val entries = spark.read.parquet(s"$path/weights").select("term", "wi").collect()
      require(entries.nonEmpty, s"$name: empty weight table at $path/weights")
      require(entries.length <= 65536,
        s"$name: weight table at $path/weights has ${entries.length} terms — beyond the " +
          "literal-map form; raise the fit's minDf or join against the weight table instead")
      val tau = spark.conf.getOption("spark.graft.quality.minScore").map(_.toDouble).getOrElse(
        spark.read.parquet(s"$path/tau").head().getDouble(0))
      val modelMap = map(entries.flatMap(r => Seq(lit(r.getString(0)), lit(r.getLong(1)))): _*)
      df.withColumn("_tx", trim(lower(col("text"))))
        // token-less docs (empty/whitespace/null text) are OUTSIDE the
        // model's population — the batch twin excludes them before
        // scoring and the seed rule could never keep them, so a
        // no-evidence 0.5 prior must not sneak them past a tau <= 0.5
        // operating point
        .filter(size(graft.operators.QualityClassifier.toks(col("_tx"))) > 0)
        .withColumn(
          "_wis",
          filter(
            transform(graft.operators.QualityClassifier.trigrams(col("_tx")),
              t => element_at(modelMap, t)),
            w => w.isNotNull))
        .withColumn("qc_hits", size(col("_wis")).cast("long"))
        .withColumn(
          "qc_score",
          when(col("qc_hits") > 0,
            aggregate(col("_wis"), lit(0L), (acc, x) => acc + x).cast("double") / 10000 /
              col("qc_hits"))
            .otherwise(lit(0.5)))
        .drop("_tx", "_wis")
        .filter(col("qc_score") >= tau)
    }
  }

  val all: Seq[Rule] =
    Seq(new QualityFilterRule(), LangIdRule, ExactDedupRule, NearDupRule, CorpusMatchRule,
      ImportanceFilterRule, GopherFilterRule, C4FilterRule, QualityClassifierRule)
}
