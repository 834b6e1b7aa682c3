package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables
import graft.operators.Pinned.PinOps

/** Training-data pipeline: text analysis + deduplication over `documents`.
  *
  * Everything here is higher-order-function based (codegen'd Catalyst
  * expressions over arrays), no UDFs: tokenization via split, stopword
  * counting via array filter, dedup via hash-groupBy. The MinHash/SimHash
  * near-dup path lives in graft.operators.Dedup (no SQL oracle — verified
  * by ScalaTest properties instead).
  */
object Documents {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  // ---- q30: exact deduplication (hash groupBy) -----------------------------
  def q30DedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("text_hash")

  val q30Sql: String =
    """SELECT md5(text) AS text_hash,
      |       MIN(doc_id) AS keep_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_copies
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY text_hash""".stripMargin

  // ---- q31: token counting ---------------------------------------------------
  def q31TokenStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"),
        length(col("text")).as("len_chars")
      )
      .orderBy("doc_id")

  val q31Sql: String =
    """SELECT doc_id,
      |  CAST(LEN(regexp_split_to_array(TRIM(text), '\s+')) AS INTEGER) AS n_tokens,
      |  CAST(LENGTH(text) AS INTEGER) AS len_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- q32: quality scoring (length / punctuation / stopword ratios) ---------
  // Memoized by distinct raw text (TextGroups) — pure text function.
  def q32TextQuality(s: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(lower(col("t"))), "\\s+")
    val nTok = size(toks)
    val nStop = size(filter(toks, w => w.isInCollection(stopwords)))
    val nPunct = length(col("t")) - length(regexp_replace(col("t"), "[.,;:!?]", ""))
    graft.operators.TextGroups
      .perDoc(docs(s, dir), "doc_id", col("text")) { reps =>
        reps.select(
          col("gid"),
          nTok.as("n_tokens"),
          nStop.as("n_stopwords"),
          nPunct.as("n_punct"),
          (nStop.cast("double") / nTok).as("stopword_ratio"),
          (nPunct.cast("double") / length(col("t"))).as("punct_ratio")
        )
      }
      .orderBy("doc_id")
  }

  val q32Sql: String =
    s"""SELECT doc_id,
       |  CAST(LEN(toks) AS INTEGER) AS n_tokens,
       |  CAST(LEN(list_filter(toks, w -> w IN (${stopwords.map("'" + _ + "'").mkString(",")}))) AS INTEGER) AS n_stopwords,
       |  CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,;:!?]', '', 'g')) AS INTEGER) AS n_punct,
       |  CAST(LEN(list_filter(toks, w -> w IN (${stopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE) / LEN(toks) AS stopword_ratio,
       |  CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,;:!?]', '', 'g')) AS DOUBLE) / LENGTH(text) AS punct_ratio
       |FROM (SELECT doc_id, text, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
       |      FROM documents) d
       |ORDER BY doc_id""".stripMargin

  // ---- q33: corpus profile by language ----------------------------------------
  def q33LangProfile(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        countDistinct(col("source")).as("n_sources")
      )
      .orderBy("lang")

  val q33Sql: String =
    """SELECT lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_chars,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---- q34: n-gram shingles (dedup building block, exact-SQL-checkable) --------
  // 3-gram shingle count per document: the first stage of MinHash dedup,
  // verified exactly here; hashing stages are property-tested in ScalaTest.
  // Memoized by distinct raw text (TextGroups) — pure text function.
  def q34Shingles(s: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(lower(col("t"))), "\\s+")
    graft.operators.TextGroups
      .perDoc(docs(s, dir), "doc_id", col("text")) { reps =>
        reps.select(
          col("gid"),
          size(toks).as("n_tokens"),
          // kernel expression; equal to the declarative distinct-transform
          // form (property-tested in TextHashExprsSpec)
          size(graft.expressions.TextHashExprs.shingleSet(toks, 3)).as("n_distinct_shingles")
        )
      }
      .orderBy("doc_id")
  }

  val q34Sql: String =
    """SELECT doc_id,
      |  CAST(LEN(toks) AS INTEGER) AS n_tokens,
      |  CAST(LEN(list_distinct(
      |    list_transform(range(0, LEN(toks) - 2),
      |      i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS INTEGER) AS n_distinct_shingles
      |FROM (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
      |      FROM documents) d
      |ORDER BY doc_id""".stripMargin

  // ---- q46: repetition / boilerplate detection --------------------------------
  // Duplicate-bigram fraction per document — the standard repetition
  // signal for filtering TV-static docs from a training corpus. Pure
  // per-row map work: embarrassingly parallel, no shuffle at any scale.
  // Memoized by distinct raw text (TextGroups) — pure text function.
  def q46Repetition(s: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(lower(col("t"))), "\\s+")
    val nTok = size(toks)
    val nBi = greatest(nTok - 1, lit(0))
    val nDist = when(nTok >= 2, size(graft.expressions.TextHashExprs.shingleSet(toks, 2))).otherwise(lit(0))
    graft.operators.TextGroups
      .perDoc(docs(s, dir), "doc_id", col("text")) { reps =>
        reps
          .select(col("gid"), nBi.as("n_bigrams"), nDist.as("n_distinct_bigrams"))
          .select(
            col("gid"),
            col("n_bigrams"),
            col("n_distinct_bigrams"),
            when(
              col("n_bigrams") > 0,
              (col("n_bigrams") - col("n_distinct_bigrams")).cast("double") / col("n_bigrams")
            ).otherwise(lit(0.0)).as("dup_fraction")
          )
      }
      .orderBy("doc_id")
  }

  val q46Sql: String =
    """WITH d AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks FROM documents),
      |b AS (SELECT doc_id,
      |        CAST(CASE WHEN LEN(toks) >= 2 THEN LEN(toks) - 1 ELSE 0 END AS INTEGER) AS n_bigrams,
      |        CAST(CASE WHEN LEN(toks) >= 2
      |             THEN LEN(list_distinct(list_transform(range(0, LEN(toks) - 1),
      |                    i -> toks[i+1] || ' ' || toks[i+2])))
      |             ELSE 0 END AS INTEGER) AS n_distinct_bigrams
      |      FROM d)
      |SELECT doc_id, n_bigrams, n_distinct_bigrams,
      |  CASE WHEN n_bigrams > 0
      |       THEN CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / n_bigrams
      |       ELSE 0.0 END AS dup_fraction
      |FROM b
      |ORDER BY doc_id""".stripMargin

  // ---- q47: deterministic stratified sampling ----------------------------------
  // Fixed-size per-language sample via hash-ordered row_number — the
  // reproducible subsampling every corpus build needs (a rand() sample is
  // neither reproducible nor oracle-checkable). One shuffle by lang;
  // rank-k cutoff per stratum.
  def q47StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs(s, dir)
      .select(col("doc_id"), col("lang"), row_number().over(w).as("rk"))
      .filter(col("rk") <= 20)
      .orderBy("lang", "rk")
  }

  val q47Sql: String =
    """WITH r AS (SELECT doc_id, lang,
      |             CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
      |           FROM documents)
      |SELECT doc_id, lang, rk FROM r WHERE rk <= 20
      |ORDER BY lang, rk""".stripMargin

  // ---- q48: scrub / normalize (URL + email + number redaction) ------------------
  // Text-cleaning pass: count and redact URL/email/digit spans, collapse
  // whitespace, lower-case; emit the normalized-text hash. Per-row map
  // work, codegen'd regexes — no shuffle.
  def q48Scrub(s: SparkSession, dir: String): DataFrame = {
    val urlPat = "https?://\\S+"
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    val numPat = "[0-9]+"
    def normalized(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      lower(regexp_replace(trim(
        regexp_replace(
          regexp_replace(regexp_replace(t, urlPat, "<URL>"), emailPat, "<EMAIL>"),
          numPat, "<NUM>")), "\\s+", " "))
    // Memoized by distinct RAW text (TextGroups): every output column
    // is a pure function of `text`, and the java-regex passes are the
    // whole cost — run them once per distinct text. Raw text is the
    // key because case differences change the redaction counts.
    graft.operators.TextGroups
      .perDoc(docs(s, dir), "doc_id", col("text")) { reps =>
        reps.select(
          col("gid"),
          size(regexp_extract_all(col("t"), lit(urlPat), lit(0))).as("n_urls"),
          size(regexp_extract_all(col("t"), lit(emailPat), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("t"), lit(numPat), lit(0))).as("n_nums"),
          md5(normalized(col("t"))).as("norm_hash")
        )
      }
      .orderBy("doc_id")
  }

  val q48Sql: String =
    """SELECT doc_id,
      |  CAST(LEN(regexp_extract_all(text, 'https?://\S+')) AS INTEGER) AS n_urls,
      |  CAST(LEN(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS INTEGER) AS n_emails,
      |  CAST(LEN(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_nums,
      |  md5(LOWER(REGEXP_REPLACE(TRIM(
      |    REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(text,
      |      'https?://\S+', '<URL>', 'g'),
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
      |      '[0-9]+', '<NUM>', 'g')), '\s+', ' ', 'g'))) AS norm_hash
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- q49: corpus vocabulary (explode → aggregate, the wordcount shape) --------
  // Top-50 tokens with collection and document frequency. The explode →
  // partial-agg → final-agg plan is the scale path: map-side combine
  // absorbs the token skew (every doc shares the head vocabulary) before
  // the shuffle, and the top-k is a TakeOrdered, not a global sort.
  def q49Vocabulary(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_occurrences"), countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("n_occurrences").desc, col("tok"))
      .limit(50)

  val q49Sql: String =
    """WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS tok
      |           FROM documents)
      |SELECT tok,
      |  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
      |FROM t
      |GROUP BY tok
      |ORDER BY n_occurrences DESC, tok
      |LIMIT 50""".stripMargin

  // ---- q59: histogram (fixed-width bucketing) -----------------------------------
  // Document-length histogram per language: integer bucket arithmetic
  // (no float edges), the standard exploration profile before setting
  // corpus length filters. One shuffle on (lang, bucket).
  def q59Histogram(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"), (floor(col("n_chars") / 100) * 100).cast("long").as("bucket_lo"))
      .groupBy(col("lang"), col("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "bucket_lo")

  val q59Sql: String =
    """SELECT lang,
      |  CAST(FLOOR(n_chars / 100) * 100 AS BIGINT) AS bucket_lo,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs
      |FROM documents
      |GROUP BY 1, 2
      |ORDER BY lang, bucket_lo""".stripMargin

  // ---- q60: keyword extraction (per-doc top terms, integer-exact) -----------------
  // Top-3 terms per document by in-doc count with corpus doc-frequency
  // attached — TF-IDF's integer core, kept float-free so the oracle
  // hash-compares exactly (ln() rounding differs across engines).
  // Shape: explode → (doc, term) counts → df join (term-keyed) →
  // per-doc top-k window; WindowGroupLimit caps the shuffle.
  def q60Keywords(s: SparkSession, dir: String): DataFrame =
    // Memoized by distinct text (TextGroups): term frequencies and the
    // top-3 rank are functions of the text; a term's corpus document
    // frequency is the sum of group sizes over the groups containing
    // it (== countDistinct(doc_id) in the direct form).
    graft.operators.TextGroups
      .perDocWithSizes(docs(s, dir), "doc_id", lower(trim(col("text")))) { (reps, sizes) =>
        val terms = reps.select(col("gid"), explode(split(col("t"), "\\s+")).as("term"))
        val tf = terms.groupBy(col("gid"), col("term")).agg(count(lit(1)).as("tf"))
        val df_ = terms
          .select("gid", "term")
          .distinct()
          .join(sizes, "gid")
          .groupBy(col("term"))
          .agg(sum(col("gsz")).as("doc_freq"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("gid"))
          .orderBy(col("tf").desc, col("term"))
        tf.join(df_, "term")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("gid"), col("rk"), col("term"), col("tf"), col("doc_freq"))
      }
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("doc_freq"))
      .orderBy("doc_id", "rk")

  val q60Sql: String =
    """WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS term
      |           FROM documents),
      |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, term),
      |df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq FROM t GROUP BY term),
      |ranked AS (
      |  SELECT doc_id, term, tf, doc_freq,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS INTEGER) AS rk
      |  FROM tf JOIN df USING (term))
      |SELECT doc_id, rk, term, tf, doc_freq
      |FROM ranked WHERE rk <= 3
      |ORDER BY doc_id, rk""".stripMargin

  // ---- q61: corpus-frequency fluency score ---------------------------------------
  // Quality filtering the corpus against itself: each document scored by
  // the mean corpus-frequency of its bigrams (docs full of rare bigrams
  // are gibberish-or-unique; boilerplate scores high). All-integer until
  // the final single division, so the oracle hash-compares exactly.
  // Shape: bigram explode → corpus counts → join back per doc bigram →
  // per-doc avg. The join key (bigram) is the high-cardinality side;
  // partial aggs absorb the head bigrams before both shuffles.
  def q61BigramFluency(s: SparkSession, dir: String): DataFrame =
    // Memoized by distinct text (TextGroups): the bigram explode and
    // per-doc aggregation run once per distinct text; the corpus
    // document frequency of a bigram is the sum of group sizes over
    // the groups containing it (== countDistinct(doc_id) in the
    // direct form, since a text's distinct-bigram set repeats
    // identically for each duplicate doc).
    graft.operators.TextGroups
      .perDocWithSizes(docs(s, dir), "doc_id", lower(trim(col("text")))) { (reps, sizes) =>
        val bigrams = reps
          .select(
            col("gid"),
            explode(graft.expressions.TextHashExprs.shingleSet(split(col("t"), "\\s+"), 2)).as("bigram"))
          .join(sizes, "gid")
        val w = org.apache.spark.sql.expressions.Window.partitionBy("bigram")
        bigrams
          .withColumn("bg_docs", sum(col("gsz")).over(w))
          .groupBy(col("gid"))
          .agg(
            count(lit(1)).as("n_bigrams"),
            sum(col("bg_docs")).as("sum_bg_docs"))
          .select(
            col("gid"),
            col("n_bigrams"),
            col("sum_bg_docs"),
            (col("sum_bg_docs").cast("double") / col("n_bigrams")).as("fluency"))
      }
      .orderBy("doc_id")

  val q61Sql: String =
    """WITH b AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(range(0, LEN(toks) - 1),
      |           i -> toks[i+1] || ' ' || toks[i+2]))) AS bigram
      |  FROM (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
      |        FROM documents) d
      |  WHERE LEN(toks) >= 2),
      |f AS (SELECT bigram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS bg_docs FROM b GROUP BY bigram)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(bg_docs) AS BIGINT) AS sum_bg_docs,
      |  CAST(SUM(bg_docs) AS DOUBLE) / COUNT(*) AS fluency
      |FROM b JOIN f USING (bigram)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ---- q63: heavy hitters via the SpaceSaving aggregate ---------------------------
  // The bounded-memory form of q49: a custom TypedImperativeAggregate
  // builds SpaceSaving summaries map-side and merges them across
  // partitions — only `capacity` slots ever shuffle, vs. one row per
  // distinct token. On this corpus capacity (256) exceeds the
  // vocabulary, so the sketch is provably exact and the oracle checks
  // it against true counts; the approximate regime's bounds are
  // property-tested in SpaceSavingAggSpec.
  def q63HeavyHitters(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .agg(graft.expressions.SpaceSavingAgg.topk(col("tok"), k = 20, capacity = 256).as("hh"))
      .select(posexplode(col("hh")).as(Seq("pos", "h")))
      .select(
        (col("pos") + 1).cast("int").as("rk"),
        col("h.item").as("token"),
        col("h.cnt").as("n_occurrences")
      )
      .orderBy("rk")

  val q63Sql: String =
    """WITH t AS (SELECT unnest(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS token
      |           FROM documents),
      |c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences FROM t GROUP BY token)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token) AS INTEGER) AS rk,
      |       token, n_occurrences
      |FROM c
      |ORDER BY n_occurrences DESC, token
      |LIMIT 20""".stripMargin

  // ---- q67: grouped heavy hitters (per-language top tokens) -----------------------
  // The SpaceSaving aggregate's GROUPED path: one bounded summary per
  // language. Exact regime again (capacity >> per-lang vocabulary).
  def q67LangHeavyHitters(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"), explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .groupBy(col("lang"))
      .agg(graft.expressions.SpaceSavingAgg.topk(col("tok"), k = 5, capacity = 256).as("hh"))
      .select(col("lang"), posexplode(col("hh")).as(Seq("pos", "h")))
      .select(
        col("lang"),
        (col("pos") + 1).cast("int").as("rk"),
        col("h.item").as("token"),
        col("h.cnt").as("n_occurrences")
      )
      .orderBy("lang", "rk")

  val q67Sql: String =
    """WITH t AS (SELECT lang, unnest(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS token
      |           FROM documents),
      |c AS (SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      |      FROM t GROUP BY lang, token),
      |r AS (SELECT lang, token, n_occurrences,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |          ORDER BY n_occurrences DESC, token) AS INTEGER) AS rk
      |      FROM c)
      |SELECT lang, rk, token, n_occurrences
      |FROM r WHERE rk <= 5
      |ORDER BY lang, rk""".stripMargin

  // ---- q73: sequence packing (concat-and-chunk span map) -------------------------
  // Training prep: the corpus is conceptually concatenated in doc_id
  // order and split into fixed 512-token context windows; each document
  // maps to the span of windows it lands in (a doc can straddle a
  // boundary). All arithmetic is integral, so the map is engine-exact.
  //
  // The global running sum is computed in TWO PASSES instead of one
  // unpartitioned window (which would serialize the whole corpus
  // through a single task): assign each doc a range BUCKET that is a
  // pure function of doc_id, (1) aggregate per-bucket token totals
  // (one row per bucket — bounded by bucket count, not data) and
  // prefix-sum them on the driver, (2) broadcast the offsets and do
  // the running sum map-side inside each bucket. Bit-identical to the
  // single-window form — doc_id is unique, so bucket order + within-
  // bucket order is the global order.
  //
  // The buckets are uniform-width slices of [min(doc_id), max(doc_id)]
  // rather than repartitionByRange: RangePartitioner re-samples with
  // an RDD-id-derived seed on every job, so two passes over the same
  // plan can place rows in DIFFERENT partitions once row counts exceed
  // the sample size — a silent mis-offset at scale. A pure bucket
  // function makes the result independent of physical partitioning
  // altogether (PartitioningStabilitySpec pins this). For pathological
  // id distributions, swap the uniform width for approxQuantile bounds
  // computed once on the driver; the span math is unchanged.
  def q73PackSpans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docs(s, dir)
      .select(col("doc_id"), size(split(trim(lower(col("text"))), "\\s+")).as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val (mn, mx) = {
      val r = toks.agg(min("doc_id"), max("doc_id")).head()
      if (r.isNullAt(0)) (0L, 0L) else (r.getLong(0), r.getLong(1))
    }
    val nBuckets = s.sessionState.conf.numShufflePartitions
    val width = math.max(1L, (mx - mn) / nBuckets + 1L)
    val bucketed = toks.withColumn("bucket", expr(s"(doc_id - $mn) div $width"))
    val bucketTotals: Array[(Long, Long)] = bucketed
      .groupBy("bucket")
      .agg(sum("n_tokens").as("toks"))
      .as[(Long, Long)]
      .collect()
    val offsets: Map[Long, Long] = {
      var acc = 0L
      bucketTotals.sortBy(_._1).map { case (b, toksInBucket) =>
        val off = acc; acc += toksInBucket; b -> off
      }.toMap
    }
    val bcOffsets = s.sparkContext.broadcast(offsets)
    bucketed
      .repartition(nBuckets, col("bucket"))
      .sortWithinPartitions("doc_id") // buckets are doc_id ranges: doc_id order groups them
      .as[(Long, Int, Long)]
      .mapPartitions { it =>
        val off = bcOffsets.value
        var cur = Long.MinValue
        var acc = 0L
        it.map { case (docId, nTokens, bucket) =>
          if (bucket != cur) { cur = bucket; acc = off(bucket) } // keyed by bucket, not task id
          val start = acc
          acc += nTokens
          (docId, nTokens, start)
        }
      }
      .toDF("doc_id", "n_tokens", "start_tok")
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("start_tok"),
        expr("CAST(start_tok div 512 AS INT)").as("first_chunk"),
        expr("CAST((start_tok + n_tokens - 1) div 512 AS INT)").as("last_chunk"),
        expr("CAST((start_tok + n_tokens - 1) div 512 - start_tok div 512 + 1 AS INT)").as("n_chunks")
      )
      .orderBy("doc_id")
  }

  val q73Sql: String =
    """WITH d AS (SELECT doc_id,
      |             LEN(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS n_tokens
      |           FROM documents),
      |p AS (SELECT doc_id, n_tokens,
      |        SUM(n_tokens) OVER (ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_tok
      |      FROM d WHERE n_tokens > 0)
      |SELECT doc_id,
      |  CAST(n_tokens AS INTEGER) AS n_tokens,
      |  CAST(start_tok AS BIGINT) AS start_tok,
      |  CAST(start_tok // 512 AS INTEGER) AS first_chunk,
      |  CAST((start_tok + n_tokens - 1) // 512 AS INTEGER) AS last_chunk,
      |  CAST((start_tok + n_tokens - 1) // 512 - start_tok // 512 + 1 AS INTEGER) AS n_chunks
      |FROM p
      |ORDER BY doc_id""".stripMargin

  // ---- q74: per-document fixed-size token chunking --------------------------------
  // The other packing regime (no cross-doc concatenation): each doc is
  // split into 32-token chunks, one output row per chunk — the explode
  // side of context-window preparation. sequence+explode generates the
  // chunk index inline per row; no driver loop, no join.
  def q74TokenChunks(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), size(split(trim(lower(col("text"))), "\\s+")).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(
        col("doc_id"),
        col("n_tokens"),
        explode(expr("sequence(0, CAST((n_tokens + 31) div 32 AS INT) - 1)")).as("chunk_idx")
      )
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("chunk_idx"),
        least(lit(32), col("n_tokens") - col("chunk_idx") * 32).as("chunk_len")
      )
      .orderBy("doc_id", "chunk_idx")

  val q74Sql: String =
    """WITH d AS (SELECT doc_id,
      |             LEN(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS n_tokens
      |           FROM documents),
      |c AS (SELECT doc_id, n_tokens,
      |        unnest(range(0, (n_tokens + 31) // 32)) AS chunk_idx
      |      FROM d WHERE n_tokens > 0)
      |SELECT doc_id,
      |  CAST(n_tokens AS INTEGER) AS n_tokens,
      |  CAST(chunk_idx AS INTEGER) AS chunk_idx,
      |  CAST(LEAST(32, n_tokens - chunk_idx * 32) AS INTEGER) AS chunk_len
      |FROM c
      |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---- q77: n-gram novelty (corpus diversity profiling) ---------------------------
  // For each doc: the fraction of its 3-gram shingles that no LOWER
  // doc_id contains — the diversity metric curation uses to spot
  // corpora drifting into repetition. A shingle's "first" doc is
  // min(doc_id) over its occurrences: one groupBy + one equi-join on
  // the shingle key, no pairwise comparison anywhere.
  def q77Novelty(s: SparkSession, dir: String): DataFrame = {
    // Memoized by distinct text: a shingle's "first" doc is the min
    // doc_id over its occurrences == the min GROUP id over the groups
    // containing it (gid = the group's min doc_id). Only a group's
    // representative can own novelty — every other member of the group
    // shares a lower-id doc (the rep) with ALL its shingles, so its
    // novel count is 0. The shingle explode, the min-aggregation and
    // the per-doc counts all run once per distinct text.
    val (members0, reps) = graft.operators.TextGroups
      .prelude(docs(s, dir), "doc_id", lower(trim(col("text"))))
    val members = members0.withColumnRenamed("doc_id", "mid")
    val sh = reps.select(
      col("gid"),
      explode(graft.expressions.TextHashExprs.shingleSet(split(col("t"), "\\s+"), 3)).as("s"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("s")
    val perRep = sh
      .withColumn("first_gid", min(col("gid")).over(w))
      .groupBy(col("gid"))
      .agg(
        count(lit(1)).as("n_shingles"),
        count(when(col("first_gid") === col("gid"), lit(1))).as("n_novel"))
    members
      .join(perRep, "gid")
      .select(
        col("mid").as("doc_id"),
        col("n_shingles"),
        when(col("mid") === col("gid"), col("n_novel")).otherwise(lit(0L)).as("n_novel"))
      .select(
        col("doc_id"),
        col("n_shingles"),
        col("n_novel"),
        (col("n_novel").cast("double") / col("n_shingles")).as("novelty_frac"))
      .orderBy("doc_id")
  }

  val q77Sql: String =
    """WITH d AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks FROM documents),
      |sh AS (SELECT doc_id,
      |         unnest(CASE WHEN LEN(toks) >= 3
      |                     THEN list_distinct(list_transform(range(0, LEN(toks) - 2),
      |                            i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
      |                     ELSE [] END) AS s
      |       FROM d),
      |f AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_shingles,
      |  CAST(COUNT(CASE WHEN first_doc = doc_id THEN 1 END) AS BIGINT) AS n_novel,
      |  CAST(COUNT(CASE WHEN first_doc = doc_id THEN 1 END) AS DOUBLE) / COUNT(*) AS novelty_frac
      |FROM sh JOIN f USING (s)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ---- q78: cross-source shingle overlap (contamination matrix) -------------------
  // Pairwise source-level 3-gram overlap — which sources duplicate each
  // other's content. Same one-shuffle bucket-pairing shape as LSH
  // candidate generation (Dedup.candidatePairs): group sources per
  // shingle, explode pairs inside each bucket, aggregate per pair —
  // the |sources|² pair space only materializes per shared shingle,
  // never as a corpus self-join.
  def q78SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    // Pre-distinct on (source, lowercased text) before the explode:
    // the final (source, shingle) distinct makes this a no-op
    // semantically, but duplicate texts within a source shingle once
    // instead of once per copy.
    val ss = docs(s, dir)
      .select(col("source"), lower(trim(col("text"))).as("t"))
      .distinct()
      .select(
        col("source"),
        explode(graft.expressions.TextHashExprs.shingleSet(split(col("t"), "\\s+"), 3)).as("s")
      )
      .distinct()
    val totals = ss.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    val shared = ss
      .groupBy(col("s"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) > 1)
      .select(
        explode(
          flatten(
            transform(
              col("srcs"),
              (x, i) => transform(slice(col("srcs"), i + 2, size(col("srcs"))), y => array(x, y))
            )
          )
        ).as("p")
      )
      .groupBy(element_at(col("p"), 1).as("source1"), element_at(col("p"), 2).as("source2"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(totals.select(col("source").as("source1"), col("n_sh").as("n1"))), "source1")
      .join(broadcast(totals.select(col("source").as("source2"), col("n_sh").as("n2"))), "source2")
      .select(
        col("source1"),
        col("source2"),
        col("n_shared"),
        col("n1"),
        col("n2"),
        (col("n_shared").cast("double") / (col("n1") + col("n2") - col("n_shared"))).as("jaccard")
      )
      .orderBy("source1", "source2")
  }

  val q78Sql: String =
    """WITH d AS (SELECT source, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks FROM documents),
      |sh AS (SELECT DISTINCT source,
      |         unnest(CASE WHEN LEN(toks) >= 3
      |                     THEN list_distinct(list_transform(range(0, LEN(toks) - 2),
      |                            i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
      |                     ELSE [] END) AS s
      |       FROM d),
      |tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY source),
      |p AS (SELECT a.source AS source1, b.source AS source2, CAST(COUNT(*) AS BIGINT) AS n_shared
      |      FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
      |      GROUP BY 1, 2)
      |SELECT source1, source2, n_shared, t1.n_sh AS n1, t2.n_sh AS n2,
      |  CAST(n_shared AS DOUBLE) / (t1.n_sh + t2.n_sh - n_shared) AS jaccard
      |FROM p
      |JOIN tot t1 ON source1 = t1.source
      |JOIN tot t2 ON source2 = t2.source
      |ORDER BY source1, source2""".stripMargin

  // ---- q83: deterministic mixture sampling (corpus blending) ----------------------
  // Data mixing: downsample each language to a target rate (the knob
  // that rebalances a corpus before training). Bernoulli-by-hash, not
  // rand(): keep a doc iff its 60-bit md5 fraction < rate, so the
  // sample is reproducible across runs, partitionings and engines —
  // and any shard can be sampled independently with no coordination.
  def q83MixtureSample(s: SparkSession, dir: String): DataFrame = {
    val rate = when(col("lang") === "en", 0.5)
      .when(col("lang") === "fr", 0.8)
      .otherwise(0.25)
    val h = conv(md5(col("doc_id").cast("string")).substr(1, 15), 16, 10).cast("double") /
      lit(math.pow(2, 60))
    docs(s, dir)
      .select(col("doc_id"), col("lang"), h.as("h"), rate.as("rate"))
      .filter(col("h") < col("rate"))
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  val q83Sql: String =
    """WITH d AS (SELECT doc_id, lang,
      |    CAST(list_reduce(list_transform(range(1, 16),
      |           ii -> CAST(strpos('0123456789abcdef',
      |                        substr(md5(CAST(doc_id AS VARCHAR)), ii, 1)) - 1 AS BIGINT)),
      |           (a, x) -> a * 16 + x) AS DOUBLE) / 1152921504606846976.0 AS h,
      |    CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'fr' THEN 0.8 ELSE 0.25 END AS rate
      |  FROM documents)
      |SELECT doc_id, lang FROM d WHERE h < rate
      |ORDER BY doc_id""".stripMargin

  // ---- q84: sharded sequence packing (the 100 TB form of q73) ---------------------
  // Same concat-and-chunk map as q73 but the running sum partitions by
  // the shard key (`source`): every shard packs its own token stream
  // independently, so the window parallelizes across shards instead of
  // serializing the corpus — SCALE.md's "per-shard packing" claim as a
  // checked query, not prose.
  def q84ShardedPack(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.currentRow)
    docs(s, dir)
      .select(col("doc_id"), col("source"), size(split(trim(lower(col("text"))), "\\s+")).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(
        col("doc_id"),
        col("source"),
        col("n_tokens"),
        col("start_tok"),
        expr("CAST(start_tok div 512 AS INT)").as("first_chunk"),
        expr("CAST((start_tok + n_tokens - 1) div 512 AS INT)").as("last_chunk")
      )
      .orderBy("doc_id")
  }

  val q84Sql: String =
    """WITH d AS (SELECT doc_id, source,
      |             LEN(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS n_tokens
      |           FROM documents),
      |p AS (SELECT doc_id, source, n_tokens,
      |        SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_tok
      |      FROM d WHERE n_tokens > 0)
      |SELECT doc_id, source,
      |  CAST(n_tokens AS INTEGER) AS n_tokens,
      |  CAST(start_tok AS BIGINT) AS start_tok,
      |  CAST(start_tok // 512 AS INTEGER) AS first_chunk,
      |  CAST((start_tok + n_tokens - 1) // 512 AS INTEGER) AS last_chunk
      |FROM p
      |ORDER BY doc_id""".stripMargin

  // ---- q89: duplicate n-gram span masking (Lee et al. 2022 style) ---------------
  // Span-level dedup: for every 5-gram that occurs in >=2 distinct docs,
  // mark the 5 token positions it covers; report per doc how many gram
  // occurrences are duplicated and how many tokens the duplicated spans
  // cover. This is the bounded-gram Spark form of suffix-array substring
  // dedup ("Deduplicating Training Data Makes Language Models Better"):
  // candidate generation is one shuffle on the gram key (never a doc
  // cross-product), coverage is a per-doc distinct count — both scale
  // linearly in corpus size at fixed gram width.
  private val spanN = 5

  private def gramPositions(s: SparkSession, dir: String, n: Int): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .filter(col("n_tokens") >= n)
      .select(
        col("doc_id"),
        posexplode(
          transform(sequence(lit(0), col("n_tokens") - n),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))
        ).as(Seq("pos", "gram"))
      )

  def q89DupNgramSpans(s: SparkSession, dir: String): DataFrame = {
    // All per-doc outputs are functions of the lowercased text plus the
    // corpus-level duplicated-gram set, so the gram explode, the dup
    // test and the span aggregation run over DISTINCT texts (group
    // representative = min doc_id) and expand back per doc at the end.
    // The dup predicate generalizes under grouping: a gram appears in
    // >= 2 distinct DOCS iff it appears in >= 2 distinct groups OR in
    // one group with >= 2 members — min(gid) != max(gid) or
    // max(group size) >= 2 over the gram's window.
    val (members0, reps0) = graft.operators.TextGroups
      .prelude(docs(s, dir), "doc_id", lower(trim(col("text"))))
    val members = members0.withColumnRenamed("doc_id", "mid")
    val reps = reps0
      .select(col("gid"), split(col("t"), "\\s+").as("toks"))
      .select(col("gid"), col("toks"), size(col("toks")).as("n_tokens"))
    val sizes = members.groupBy("gid").agg(count(lit(1)).as("gsz"))
    val repGrams = reps
      .filter(col("n_tokens") >= spanN)
      .select(
        col("gid"),
        posexplode(
          transform(sequence(lit(0), col("n_tokens") - spanN),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(spanN))))
        ).as(Seq("pos", "gram")))
      .join(sizes, "gid")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("gram")
    val dupPos = repGrams
      .withColumn("g_min", min(col("gid")).over(w))
      .withColumn("g_max", max(col("gid")).over(w))
      .withColumn("g_sz", max(col("gsz")).over(w))
      .filter(col("g_min") =!= col("g_max") || col("g_sz") >= 2)
      .select(col("gid"), col("pos"))
    // One fused aggregation: every duplicated position contributes
    // exactly spanN idx rows, so n_dup_grams = count/spanN (integral
    // by construction) — avoids a second pass over dupPos and a
    // second join into the result.
    val dupAgg = dupPos
      .select(col("gid"), explode(sequence(col("pos"), col("pos") + (spanN - 1))).as("idx"))
      .groupBy("gid")
      .agg(
        (count(lit(1)) / spanN).cast("long").as("n_dup_grams"),
        countDistinct(col("idx")).as("n_dup_tokens"))
    members
      .join(reps.select(col("gid"), col("n_tokens")), "gid")
      .join(dupAgg, Seq("gid"), "left")
      .na.fill(0L, Seq("n_dup_grams", "n_dup_tokens"))
      .select(col("mid").as("doc_id"), col("n_tokens"), col("n_dup_grams"), col("n_dup_tokens"))
      .orderBy("doc_id")
  }

  val q89Sql: String =
    """WITH d AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks FROM documents),
      |t AS (SELECT doc_id, toks, LEN(toks) AS n_tokens FROM d),
      |g0 AS (SELECT doc_id, toks, unnest(range(0, n_tokens - 4)) AS pos FROM t WHERE n_tokens >= 5),
      |g AS (SELECT doc_id, pos, array_to_string(toks[pos+1:pos+5], ' ') AS gram FROM g0),
      |dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
      |dp AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup)),
      |pg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_grams FROM dp GROUP BY doc_id),
      |cov AS (SELECT doc_id, CAST(COUNT(DISTINCT idx) AS BIGINT) AS n_dup_tokens
      |        FROM (SELECT doc_id, unnest(range(pos, pos+5)) AS idx FROM dp) GROUP BY doc_id)
      |SELECT t.doc_id, CAST(t.n_tokens AS INTEGER) AS n_tokens,
      |  COALESCE(pg.n_dup_grams, 0) AS n_dup_grams,
      |  COALESCE(cov.n_dup_tokens, 0) AS n_dup_tokens
      |FROM t LEFT JOIN pg USING (doc_id) LEFT JOIN cov USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin

  // ---- q97: duplicate-span REMOVAL (Lee et al. 2022 dedup action) ---------------
  // q89 counts duplicated 5-gram spans; this is the dedup ACTION a
  // training pipeline takes on them: cut every covered token position
  // and emit the scrubbed text (plus the audit counts). Same staged
  // shape as q89 — gram-keyed dup test over distinct texts, never a
  // doc cross-product — then the cover set drives an index-filter over
  // the token array, entirely map-side per doc.
  def q97SpanScrub(s: SparkSession, dir: String): DataFrame = {
    val (members0, reps0) = graft.operators.TextGroups
      .prelude(docs(s, dir), "doc_id", lower(trim(col("text"))))
    val members = members0.withColumnRenamed("doc_id", "mid")
    val reps = reps0
      .select(col("gid"), split(col("t"), "\\s+").as("toks"))
      .select(col("gid"), col("toks"), size(col("toks")).as("n_tokens"))
    val sizes = members.groupBy("gid").agg(count(lit(1)).as("gsz"))
    val repGrams = reps
      .filter(col("n_tokens") >= spanN)
      .select(
        col("gid"),
        posexplode(
          transform(sequence(lit(0), col("n_tokens") - spanN),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(spanN))))
        ).as(Seq("pos", "gram")))
      .join(sizes, "gid")
    // duplicated ⟺ the gram occurs in >= 2 distinct DOCS: across
    // groups (g_min != g_max) or inside one multi-member group
    val w = org.apache.spark.sql.expressions.Window.partitionBy("gram")
    val dupPos = repGrams
      .withColumn("g_min", min(col("gid")).over(w))
      .withColumn("g_max", max(col("gid")).over(w))
      .withColumn("g_sz", max(col("gsz")).over(w))
      .filter(col("g_min") =!= col("g_max") || col("g_sz") >= 2)
      .select(col("gid"), col("pos"))
    val covered = dupPos
      .select(col("gid"), explode(sequence(col("pos"), col("pos") + (spanN - 1))).as("idx"))
      .groupBy(col("gid"))
      .agg(collect_set(col("idx")).as("cov"))
    val cleaned = reps
      .join(covered, Seq("gid"), "left")
      .select(
        col("gid"),
        col("n_tokens"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("n_removed"),
        concat_ws(
          " ",
          filter(col("toks"), (_, i) => !coalesce(array_contains(col("cov"), i), lit(false)))
        ).as("clean_text"))
    members
      .join(cleaned, "gid")
      .select(col("mid").as("doc_id"), col("n_tokens"), col("n_removed"), col("clean_text"))
      .orderBy("doc_id")
  }

  val q97Sql: String =
    """WITH d AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks FROM documents),
      |t AS (SELECT doc_id, toks, LEN(toks) AS n_tokens FROM d),
      |g0 AS (SELECT doc_id, toks, unnest(range(0, n_tokens - 4)) AS pos FROM t WHERE n_tokens >= 5),
      |g AS (SELECT doc_id, pos, array_to_string(toks[pos+1:pos+5], ' ') AS gram FROM g0),
      |dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
      |dp AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup)),
      |cov AS (SELECT doc_id, list(DISTINCT idx) AS cov
      |        FROM (SELECT doc_id, unnest(range(pos, pos+5)) AS idx FROM dp) GROUP BY doc_id)
      |SELECT t.doc_id, CAST(t.n_tokens AS INTEGER) AS n_tokens,
      |  CAST(COALESCE(LEN(cov.cov), 0) AS BIGINT) AS n_removed,
      |  COALESCE(array_to_string(
      |    list_transform(
      |      list_filter(range(0, t.n_tokens), i -> NOT list_contains(COALESCE(cov.cov, []), i)),
      |      i -> t.toks[i+1]),
      |    ' '), '') AS clean_text
      |FROM t LEFT JOIN cov USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin

  // ---- q90: sparse document similarity (feature-blocked TF inner product) -------
  // The sparse complement of the dense-vector ANN family: documents as
  // trigram TF vectors, similarity = integer dot product, candidate
  // pairs generated by an equi-join on the shared trigram — the inverted-
  // index shape. Features occurring in >30 docs are dropped (stop-feature
  // cap): it bounds pair generation at sum(min(df,cap)^2) regardless of
  // corpus size — the standard common-feature guard of sparse similarity
  // joins — and features in a single doc pair with nothing. Integer math
  // end-to-end, so the oracle hash-matches exactly.
  def q90SparseDocsim(s: SparkSession, dir: String): DataFrame = {
    val maxDf = 30
    val topK = 3
    // Staged by distinct text (TextGroups, adaptive): identical texts
    // have identical TF vectors, so the gram self-join and the dot
    // aggregation — the query's quadratic heart, Σ df² join rows per
    // gram — run over distinct-text GROUPS and shrink by the square of
    // the duplication factor; doc-level df (the 2..maxDf posting cap)
    // is recovered as sum of gsz over the groups containing the gram.
    // Group pair dots expand to doc pairs only after aggregation. On a
    // unique corpus the prelude degenerates to singletons (projection
    // only) and this IS the direct plan.
    // key spelled lower(trim(...)) like q89/q91 so the three share one
    // cached duplication measurement (same semantic hash); the value
    // equals gramPositions' trim(lower(...)) — lowercasing preserves
    // whitespace
    val (members0, reps, sizes) = graft.operators.TextGroups
      .preludeWithSizes(docs(s, dir), "doc_id", lower(trim(col("text"))))
    val members = members0.withColumnRenamed("doc_id", "mid")
    val gtf = reps
      .select(col("gid"), split(col("t"), "\\s+").as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .filter(col("n_tokens") >= 3)
      .select(
        col("gid"),
        explode(
          transform(sequence(lit(0), col("n_tokens") - 3),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(3))))
        ).as("gram"))
      .groupBy(col("gid"), col("gram"))
      .agg(count(lit(1)).as("tf"))
    // df via a whole-partition window instead of groupBy(gram)+join:
    // the join form re-evaluates the explode+TF subtree for the filter
    // side (4 scans in the physical plan); the window keeps ONE pass
    // per join side and leaves the data hash-partitioned by gram —
    // exactly what the candidate self-join needs next (measured
    // 2.5 s → 1.6 s at sf0.1).
    val w = org.apache.spark.sql.expressions.Window.partitionBy("gram")
    val kept = gtf
      .join(sizes, "gid")
      .withColumn("df", sum(col("gsz")).over(w))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("gid", "gram", "tf")
    // Half the pair space (g1 <= g2), mirrored after aggregation; the
    // g1 == g2 case carries within-group doc pairs (identical texts:
    // dot = Σ tf², exactly what the direct form computes for them).
    // Bucket-grouped like Dedup.candidatePairs — a self-join of `kept`
    // would re-execute the whole explode+TF+df subtree per side; here
    // ONE pass groups each gram's (gid, tf) postings (≤ maxDf entries
    // by the df cap, so the arrays are tiny) and pairs explode inside
    // the bucket, i <= j keeping the self-pair. The groupBy lands on
    // the gram partitioning the df window just established — no extra
    // exchange before it.
    val gpairs = kept
      .groupBy(col("gram"))
      .agg(sort_array(collect_list(struct(col("gid"), col("tf")))).as("gs"))
      .select(
        explode(
          flatten(
            transform(
              col("gs"),
              (x, i) =>
                transform(
                  slice(col("gs"), i + 1, size(col("gs"))),
                  y =>
                    struct(
                      x.getField("gid").as("g1"),
                      y.getField("gid").as("g2"),
                      (x.getField("tf") * y.getField("tf")).as("p")))
            )
          )
        ).as("pp"))
      .groupBy(col("pp.g1").as("g1"), col("pp.g2").as("g2"))
      .agg(sum(col("pp.p")).as("dot"))
      // one row per colliding GROUP pair — tiny; the barrier stops the
      // union's two expansion branches below from re-running the whole
      // gram pipeline (the q91 repVerified idiom)
      .pinned
    val oneWay = gpairs
      .join(members.select(col("gid").as("g1"), col("mid").as("da")), "g1")
      .join(members.select(col("gid").as("g2"), col("mid").as("db")), "g2")
      .filter(col("da") =!= col("db"))
    val pairs = oneWay
      .select(col("da").as("doc_id"), col("db").as("nbr_id"), col("dot"))
      .unionByName(oneWay
        .filter(col("g1") =!= col("g2"))
        .select(col("db").as("doc_id"), col("da").as("nbr_id"), col("dot")))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("dot").desc, col("nbr_id").asc)
    pairs
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= topK)
      .select("doc_id", "nbr_id", "dot", "rank")
      .orderBy("doc_id", "rank")
  }

  val q90Sql: String =
    """WITH d AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks FROM documents),
      |t AS (SELECT doc_id, toks, LEN(toks) AS n_tokens FROM d),
      |g AS (SELECT doc_id, array_to_string(toks[pos+1:pos+3], ' ') AS gram
      |      FROM (SELECT doc_id, toks, unnest(range(0, n_tokens - 2)) AS pos
      |            FROM t WHERE n_tokens >= 3)),
      |tf AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS tf FROM g GROUP BY 1, 2),
      |keep AS (SELECT gram FROM tf GROUP BY gram HAVING COUNT(*) BETWEEN 2 AND 30),
      |k AS (SELECT * FROM tf WHERE gram IN (SELECT gram FROM keep)),
      |p AS (SELECT a.doc_id AS doc_id, b.doc_id AS nbr_id,
      |        CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
      |      FROM k a JOIN k b ON a.gram = b.gram AND a.doc_id <> b.doc_id
      |      GROUP BY 1, 2),
      |r AS (SELECT doc_id, nbr_id, dot,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dot DESC, nbr_id) AS INTEGER) AS rank
      |      FROM p)
      |SELECT doc_id, nbr_id, dot, rank FROM r WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  // ---- q91: gram-blocked fuzzy dedup (Levenshtein verify) -----------------------
  // Edit-distance near-dup: candidate pairs are doc pairs sharing at
  // least one exact 5-gram (the same inverted-index blocking as q89 —
  // never a doc cross-product), pre-filtered by |length difference| and
  // verified with exact Levenshtein distance. The expensive O(len^2)
  // distance only runs on blocked candidates, which is what makes
  // edit-distance dedup feasible at corpus scale.
  //
  // Grams occurring in more than `maxDf` documents are NOT blocking
  // keys (the Ed-Join-style stop-signature cap, same convention as
  // q90's 2..30 posting cap): a boilerplate 5-gram shared by B
  // documents would otherwise emit B² candidate rows — dedupFirst
  // staging collapses duplicate TEXTS but not a gram shared by B
  // DISTINCT texts. The cap bounds pair generation at
  // Σ_gram min(df, maxDf)² regardless of corpus size. df is
  // DOC-level (sum of group sizes over the groups containing the
  // gram), so grouped and direct staging modes stay bit-identical;
  // pairs whose every shared gram exceeds the cap are dropped — for
  // such heavy boilerplate overlap the right tools are exact dedup
  // (q30) / MinHash (q35), not edit-distance blocking.
  def q91FuzzyEditdist(s: SparkSession, dir: String): DataFrame = {
    val maxDist = 40
    val maxDf =
      s.conf.getOption("spark.graft.q91.maxDf").map(_.toInt).getOrElse(50)
    // Every output column is a function of the two LOWERCASED TEXTS
    // (shared 5-gram count, length filter, Levenshtein) — only the doc
    // ids differ between duplicate docs. So the whole query runs over
    // DISTINCT texts (group representative = min doc_id) and expands
    // group pairs back to doc pairs at the end: near-dup corpora
    // repeat texts heavily (sf1 soak: 4,992 distinct texts across 50k
    // docs), and gram explode, candidate self-join AND verify all
    // shrink by the duplication factor. Identical-text pairs share ALL
    // of the text's distinct grams at distance 0, which is what the
    // direct form computes for them. On a fully diverse corpus this
    // degenerates to one extra narrow window pass.
    val (members0, reps, sizes) = graft.operators.TextGroups
      .preludeWithSizes(docs(s, dir), "doc_id", lower(trim(col("text"))))
    val members = members0.withColumnRenamed("doc_id", "mid")
    // distinct 5-grams per representative; array_distinct before the
    // explode keeps the distinct map-side (no shuffle)
    val repGrams = reps
      .select(col("gid"), split(col("t"), "\\s+").as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .filter(col("n_tokens") >= spanN)
      .select(
        col("gid"),
        explode(array_distinct(
          transform(sequence(lit(0), col("n_tokens") - spanN),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(spanN)))))).as("gram"))
    // Doc-level df per gram via a whole-partition window (q90's idiom:
    // one pass, no join back, and it leaves the data hash-partitioned
    // by gram — exactly what the posting groupBy needs next). The
    // window's count aggregation spills, unlike collecting an uncapped
    // hot gram's postings into one array before filtering would.
    val wdf = org.apache.spark.sql.expressions.Window.partitionBy("gram")
    val valid = repGrams
      .join(sizes, "gid")
      .withColumn("df", sum(col("gsz")).over(wdf))
      .filter(col("df") <= maxDf)
      .select("gid", "gram")
    // Bucket-grouped pairing (q90's template): ONE pass groups each
    // gram's postings (≤ maxDf docs by the cap, so the arrays are
    // bounded) and pairs explode inside the bucket with g1 < g2 —
    // never a self-join that re-executes the gram subtree per side.
    // The aggregate yields (pair, shared-gram count): block strength
    // as a free output column.
    val repCand = valid
      .groupBy(col("gram"))
      .agg(sort_array(collect_list(col("gid"))).as("gs"))
      .select(
        explode(
          flatten(
            transform(
              col("gs"),
              (x, i) =>
                transform(
                  slice(col("gs"), i + 2, size(col("gs"))),
                  y => struct(x.as("g1"), y.as("g2")))))).as("p"))
      .groupBy(col("p.g1").as("g1"), col("p.g2").as("g2"))
      .agg(count(lit(1)).as("n_shared"))
    // The thresholded levenshtein banded-bails at maxDist instead of
    // filling the full len^2 matrix for far-apart pairs; it runs once
    // per distinct text pair by construction here.
    val repVerified = repCand
      .join(reps.select(col("gid").as("g1"), col("t").as("ta")), "g1")
      .join(reps.select(col("gid").as("g2"), col("t").as("tb")), "g2")
      .filter(abs(length(col("ta")) - length(col("tb"))) <= maxDist)
      .select(col("g1"), col("g2"), col("n_shared"),
        levenshtein(col("ta"), col("tb"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
      // Barrier: without it Catalyst collapses this projection above
      // the expansion joins below and re-runs levenshtein once per DOC
      // pair instead of once per text pair (measured 15s vs 1s for the
      // expansion at sf1). The table is one row per verified text pair
      // — tiny — and the lazy checkpoint materializes inside the same
      // job (CC uses the same idiom for its iteration barrier).
      .pinned
    val cross = repVerified
      .join(members.select(col("gid").as("g1"), col("mid").as("a")), "g1")
      .join(members.select(col("gid").as("g2"), col("mid").as("b")), "g2")
      .select(
        least(col("a"), col("b")).as("doc1"),
        greatest(col("a"), col("b")).as("doc2"),
        col("n_shared"), col("dist"))
    // Within-group (identical-text) pairs share every VALID gram at
    // distance 0 — the cap applies uniformly (the SQL's within pairs
    // arise from the same capped gram join), so a group with zero
    // under-cap grams emits no pairs here either.
    val repGramCount = valid.groupBy(col("gid")).agg(count(lit(1)).as("n_shared"))
    val within = members.join(repGramCount, "gid").as("x")
      .join(members.as("y"), col("x.gid") === col("y.gid") && col("x.mid") < col("y.mid"))
      .select(col("x.mid").as("doc1"), col("y.mid").as("doc2"),
        col("x.n_shared"), lit(0).as("dist"))
    cross.unionByName(within).orderBy("doc1", "doc2")
  }

  val q91Sql: String =
    """WITH d AS (SELECT doc_id, LOWER(TRIM(text)) AS t,
      |             regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
      |           FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |        array_to_string(toks[pos+1:pos+5], ' ') AS gram
      |      FROM (SELECT doc_id, toks, unnest(range(0, LEN(toks) - 4)) AS pos
      |            FROM d WHERE LEN(toks) >= 5)),
      |keep AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= 50),
      |k AS (SELECT doc_id, gram FROM g WHERE gram IN (SELECT gram FROM keep)),
      |cand AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2, CAST(COUNT(*) AS BIGINT) AS n_shared
      |         FROM k a JOIN k b ON a.gram = b.gram AND a.doc_id < b.doc_id
      |         GROUP BY 1, 2)
      |SELECT doc1, doc2, n_shared, CAST(levenshtein(t1.t, t2.t) AS INTEGER) AS dist
      |FROM cand
      |JOIN d t1 ON doc1 = t1.doc_id
      |JOIN d t2 ON doc2 = t2.doc_id
      |WHERE ABS(LENGTH(t1.t) - LENGTH(t2.t)) <= 40
      |  AND levenshtein(t1.t, t2.t) <= 40
      |ORDER BY doc1, doc2""".stripMargin

  // ---- q93: per-language adaptive quality thresholding ------------------------
  // Language-adaptive filtering (the CCNet/RefinedWeb shape): a fixed
  // global quality cutoff over-filters low-resource languages, so the
  // cutoff is computed PER LANGUAGE — keep docs at or above their
  // language's 25th-percentile stopword ratio.
  //
  // The threshold is the DISCRETE quantile (smallest observed value
  // with cumulative count >= ceil(0.25·n)), computed from per-(lang,
  // value) counts + a cumulative window, NOT an interpolating
  // percentile aggregate: an interpolated cutoff is an arithmetic
  // artifact whose last-ulp rounding may differ between engines, and a
  // MEMBERSHIP filter on it would flip boundary docs — the discrete
  // form compares only values the data contains, so it is bit-exact on
  // any engine (0.25·n is exact: 0.25 is a power of two).
  //
  // Scale shape: the value-count relation is bounded by distinct ratio
  // values (O(maxTokens²)) × languages regardless of corpus size, so
  // the cumulative window is over a tiny relation, and the thresholds
  // broadcast back. The quality kernel is memoized by distinct raw
  // text (TextGroups, q32's idiom — tokenization shrinks by the corpus
  // duplication factor); that grouping does shuffle the corpus text
  // once, and since `scored` feeds BOTH the threshold pass and the
  // filter pass it is persisted (spillable) so the grouping pipeline
  // runs once, not twice — at warehouse scale this is the per-doc
  // quality staging table every downstream consumer reads.
  def q93AdaptiveQuality(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val toks = split(trim(lower(col("t"))), "\\s+")
    val quality =
      size(filter(toks, x => x.isInCollection(stopwords))).cast("double") / size(toks)
    val perDocQuality = graft.operators.TextGroups
      // fanOutReps = false: the stopword-fraction kernel is one cheap
      // array pass — the parallelism-floor repartition costs more than
      // it saves here (measured +0.35 s at sf0.1, round 15)
      .perDoc(docs(s, dir), "doc_id", col("text"), fanOutReps = false) { reps =>
        reps.select(col("gid"), quality.as("quality"))
      }
    val scored = docs(s, dir)
      .select(col("doc_id"), col("lang"))
      .join(perDocQuality, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val valueCounts = scored.groupBy("lang", "quality").agg(count(lit(1)).as("c"))
    val cum = valueCounts.select(
      col("lang"),
      col("quality"),
      sum("c").over(w.partitionBy("lang").orderBy("quality")
        .rowsBetween(w.unboundedPreceding, w.currentRow)).as("cum"),
      sum("c").over(w.partitionBy("lang")).as("n")
    )
    val thresholds = cum
      .filter(col("cum") >= ceil(col("n") * 0.25))
      .groupBy("lang")
      .agg(min("quality").as("lang_p25"))
    scored
      .join(broadcast(thresholds), "lang")
      .filter(col("quality") >= col("lang_p25"))
      .select("doc_id", "lang", "quality", "lang_p25")
      .orderBy("doc_id")
  }

  val q93Sql: String =
    s"""WITH q AS (SELECT doc_id, lang,
       |  CAST(LEN(list_filter(toks, w -> w IN (${stopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE)
       |    / LEN(toks) AS quality
       |FROM (SELECT doc_id, lang, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks FROM documents)),
       |vc AS (SELECT lang, quality, COUNT(*) AS c FROM q GROUP BY lang, quality),
       |cum AS (SELECT lang, quality,
       |          SUM(c) OVER (PARTITION BY lang ORDER BY quality
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |          SUM(c) OVER (PARTITION BY lang) AS n
       |        FROM vc),
       |th AS (SELECT lang, MIN(quality) AS lang_p25 FROM cum
       |       WHERE cum >= CEIL(0.25 * n) GROUP BY lang)
       |SELECT doc_id, q.lang, quality, lang_p25
       |FROM q JOIN th ON q.lang = th.lang
       |WHERE quality >= lang_p25
       |ORDER BY doc_id""".stripMargin

  // ---- q95: length-bucketed batching (padding-waste accounting) ----------------
  // Training/inference batch preparation: group docs into fixed-size
  // batches and account for padding waste (every doc pads to its
  // batch's max length). Two strategies over the same corpus — 'arrival'
  // (doc_id order, the naive form) and 'sorted' (length-grouped, the
  // HF-style group_by_length form) — so the output quantifies the
  // padding saved by length bucketing, per batch.
  //
  // Batching is per source shard: the rank windows partition by
  // `source`, so shards rank in parallel and no global single-partition
  // window exists (the production form subdivides giant sources by an
  // ingest-time range key the same way). Batch = 32 docs within shard.
  def q95LengthBatching(s: SparkSession, dir: String): DataFrame = {
    val batch = 32
    val w = org.apache.spark.sql.expressions.Window
    val t = docs(s, dir).select(
      col("doc_id"),
      col("source"),
      size(split(trim(col("text")), "\\s+")).as("n_tokens")
    )
    val ranked = t.select(
      col("source"),
      col("n_tokens"),
      row_number().over(w.partitionBy("source").orderBy("n_tokens", "doc_id")).as("rs"),
      row_number().over(w.partitionBy("source").orderBy("doc_id")).as("ra")
    )
    val sorted =
      ranked.select(lit("sorted").as("strategy"), col("source"),
        expr(s"CAST((rs - 1) div $batch AS INT)").as("batch_id"), col("n_tokens"))
    val arrival =
      ranked.select(lit("arrival").as("strategy"), col("source"),
        expr(s"CAST((ra - 1) div $batch AS INT)").as("batch_id"), col("n_tokens"))
    sorted
      .unionByName(arrival)
      .groupBy("strategy", "source", "batch_id")
      .agg(
        count(lit(1)).as("n_docs"),
        max("n_tokens").as("max_tokens"),
        sum("n_tokens").cast("bigint").as("sum_tokens")
      )
      .select(
        col("strategy"),
        col("source"),
        col("batch_id"),
        col("n_docs"),
        col("max_tokens"),
        col("sum_tokens"),
        (col("n_docs") * col("max_tokens") - col("sum_tokens")).cast("bigint").as("padding"),
        ((col("n_docs") * col("max_tokens") - col("sum_tokens")).cast("double") /
          (col("n_docs") * col("max_tokens"))).as("waste_frac")
      )
      .orderBy("strategy", "source", "batch_id")
  }

  val q95Sql: String =
    """WITH t AS (SELECT doc_id, source,
      |             LEN(regexp_split_to_array(TRIM(text), '\s+')) AS n_tokens
      |           FROM documents),
      |r AS (SELECT source, n_tokens,
      |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS rs,
      |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS ra
      |      FROM t),
      |b AS (SELECT 'sorted' AS strategy, source, (rs - 1) // 32 AS batch_id, n_tokens FROM r
      |      UNION ALL
      |      SELECT 'arrival', source, (ra - 1) // 32, n_tokens FROM r)
      |SELECT strategy, source, CAST(batch_id AS INTEGER) AS batch_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(MAX(n_tokens) AS INTEGER) AS max_tokens,
      |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
      |  CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT) AS padding,
      |  CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS DOUBLE)
      |    / (COUNT(*) * MAX(n_tokens)) AS waste_frac
      |FROM b GROUP BY strategy, source, batch_id
      |ORDER BY strategy, source, batch_id""".stripMargin

  // ---- q103: Gopher quality rules (Rae et al. 2021, Appendix A1.1) -----------
  // The published rule bundle behind the Gopher/MassiveText corpus:
  // word-count bounds, mean word length, alphabetic-word fraction,
  // distinct-stop-word presence, and the top-bigram repetition cap —
  // metrics AND the keep verdict per document. Pure text function →
  // memoized by distinct text (TextGroups); every ratio is an exact
  // integer quotient so the whole row hash-matches the DuckDB replay.
  // The top-bigram count is a sorted-adjacent-run fold (O(B log B)),
  // not the O(B²) count-per-distinct lambda.
  def q103GopherRules(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    graft.operators.TextGroups
      .perDoc(docs(s, dir), "doc_id", col("text")) { reps =>
        // Materialize the token array BEFORE the per-bigram lambdas:
        // slice() on an unmaterialized split(...) re-runs the split per
        // position — the quadratic-lambda pitfall (same class as the
        // q99 19x regression in SCALE.md). Bound to a column, each
        // metric reads the one materialized array.
        reps
          .select(col("gid"), split(trim(lower(col("t"))), "\\s+").as("_toks"))
          .select(col("gid") +: TextAnalysis.gopherMetrics(col("_toks")): _*)
          .withColumn("keep", TextAnalysis.gopherKeep())
      }
      .orderBy("doc_id")
  }

  val q103Sql: String = {
    val stop = graft.operators.TextAnalysis.gopherStopwords
      .map("'" + _ + "'")
      .mkString("[", ",", "]")
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
       |           FROM documents),
       |m AS (SELECT doc_id,
       |        CAST(LEN(toks) AS INTEGER) AS n_words,
       |        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |               list_transform(toks, w -> CAST(LENGTH(w) AS BIGINT))),
       |             (a, b) -> a + b) AS DOUBLE) / LEN(toks) AS mean_word_len,
       |        CAST(LEN(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
       |          / LEN(toks) AS alpha_ratio,
       |        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |               list_transform(toks, w ->
       |                 CAST(LENGTH(w) - LENGTH(REPLACE(w, '#', '')) AS BIGINT)
       |                 + CAST((LENGTH(w) - LENGTH(REPLACE(w, '...', ''))) // 3 AS BIGINT))),
       |             (a, b) -> a + b) AS DOUBLE) / LEN(toks) AS symbol_word_ratio,
       |        CAST(LEN(list_filter($stop, sw -> list_contains(toks, sw))) AS INTEGER)
       |          AS n_stop_distinct
       |      FROM t),
       |bg2 AS (SELECT doc_id, unnest(list_transform(range(1, LEN(toks)),
       |                 i -> toks[i] || ' ' || toks[i + 1])) AS g
       |        FROM t),
       |bb2 AS (SELECT doc_id, MAX(c) AS best FROM
       |          (SELECT doc_id, g, COUNT(*) AS c FROM bg2 GROUP BY doc_id, g) GROUP BY doc_id),
       |bg3 AS (SELECT doc_id, unnest(list_transform(range(1, LEN(toks) - 1),
       |                 i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS g
       |        FROM t),
       |bb3 AS (SELECT doc_id, MAX(c) AS best FROM
       |          (SELECT doc_id, g, COUNT(*) AS c FROM bg3 GROUP BY doc_id, g) GROUP BY doc_id),
       |bg4 AS (SELECT doc_id, unnest(list_transform(range(1, LEN(toks) - 2),
       |                 i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3])) AS g
       |        FROM t),
       |bb4 AS (SELECT doc_id, MAX(c) AS best FROM
       |          (SELECT doc_id, g, COUNT(*) AS c FROM bg4 GROUP BY doc_id, g) GROUP BY doc_id),
       |j AS (SELECT m.doc_id, n_words, mean_word_len, alpha_ratio, symbol_word_ratio,
       |        n_stop_distinct,
       |        CASE WHEN n_words >= 2
       |             THEN CAST(COALESCE(bb2.best, 0) * 2 AS DOUBLE) / n_words
       |             ELSE 0.0 END AS top_bigram_frac,
       |        CASE WHEN n_words >= 3
       |             THEN CAST(COALESCE(bb3.best, 0) * 3 AS DOUBLE) / n_words
       |             ELSE 0.0 END AS top_3gram_frac,
       |        CASE WHEN n_words >= 4
       |             THEN CAST(COALESCE(bb4.best, 0) * 4 AS DOUBLE) / n_words
       |             ELSE 0.0 END AS top_4gram_frac
       |      FROM m LEFT JOIN bb2 ON m.doc_id = bb2.doc_id
       |             LEFT JOIN bb3 ON m.doc_id = bb3.doc_id
       |             LEFT JOIN bb4 ON m.doc_id = bb4.doc_id)
       |SELECT doc_id, n_words, mean_word_len, alpha_ratio, symbol_word_ratio, n_stop_distinct,
       |  top_bigram_frac, top_3gram_frac, top_4gram_frac,
       |  (n_words >= 50 AND n_words <= 100000
       |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |   AND alpha_ratio >= 0.8
       |   AND symbol_word_ratio <= 0.1
       |   AND n_stop_distinct >= 2
       |   AND top_bigram_frac <= 0.20
       |   AND top_3gram_frac <= 0.18
       |   AND top_4gram_frac <= 0.16) AS keep
       |FROM j
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q133: trained quality classifier (NBSVM-style, char trigrams) ---------
  // Model-based quality filtering — the pipeline stage the rule-based
  // filters (q103/q113/q93) feed: a seed RULE labels a train split, a
  // classifier trained on those labels scores the rest of the corpus
  // (the GPT-3/LLaMA "quality classifier" step, fastText-shaped).
  //
  // Design, and why each piece is the way it is:
  //   - Features: per-doc DISTINCT character trigrams of trim(lower(text)).
  //     Word-identity features were measured first and barely separate
  //     (class means 0.588 vs 0.584 on this corpus — the synthetic
  //     vocabulary is near-random w.r.t. the rule); char trigrams witness
  //     the symbol/digit shapes the low-alpha class is made of, fastText-
  //     style, and lift held-out accuracy to 0.80/0.81/0.83 at
  //     sf0.001/0.01/0.1 vs 0.64/0.61/0.57 majority. array_distinct
  //     binarizes per doc MAP-SIDE (NBSVM uses binarized counts), so the
  //     groupBy's input is bounded by distinct-trigrams-per-doc, not text
  //     length. The trigram vocabulary is intrinsically bounded (charset³),
  //     so the weight table stays broadcastable at ANY corpus size —
  //     df >= 3 only prunes the noise tail.
  //   - Weights: rate-normalized rational count ratio
  //     w = A/(A+B), A = (hq+1)·(n_lq+2), B = (lq+1)·(n_hq+2) — the
  //     NBSVM log-count-ratio with the log dropped (ln/exp round
  //     differently across engines; conventions in QUERIES.md). Rate
  //     normalization (not raw (hq+1)/(hq+lq+2)) matters: the classes
  //     are imbalanced and HQ docs are longer, so every trigram's raw
  //     doc-frequency skews HQ and an uncentered score saturates above
  //     any fixed threshold (measured: all-HQ predictions, accuracy ==
  //     majority). The weight is quantized to the 4-decimal grid IN
  //     INTEGER ARITHMETIC: wi = (20000·A + A+B) div (2·(A+B)) — the
  //     round-half-up of 10000·A/(A+B) computed entirely in BIGINT, so
  //     both engines hold the identical integer. round(A/(A+B), 4) on
  //     the double was measured to diverge (sf0.01, 33 rows): Spark
  //     rounds the exact binary expansion while DuckDB rounds x·10⁴,
  //     and quotients landing near a 5-tie at the 5th decimal go
  //     opposite ways — the same trap as the decimal-cast ties, closed
  //     the same way (integer-scaled rounding, never round() on a
  //     derived double in a hash-compared path).
  //   - Score: per-doc mean of matched trigram weights. The weight sums
  //     ride as exact BIGINT (Σwi), so score = double(Σwi)/10⁴/n_hits is
  //     two correctly-rounded IEEE divisions of exact integers — no
  //     decimal casts needed anywhere. Docs with no vocabulary hit score
  //     the 0.5 prior.
  //   - Threshold: calibrated on the TRAIN split — the midpoint of the
  //     two class-mean scores, with each doc's score re-quantized to the
  //     grid the same integer way ((2·Σwi + n) div (2n)) before the
  //     class sums, keeping the calibration integer-exact too. A fixed
  //     0.5 is wrong for the same reason rate normalization is needed:
  //     the residual prior shift is corpus-dependent, so the model must
  //     carry its own operating point.
  //   - Split: doc_id % 5 (train ≠ 0, held-out = 0) — deterministic, no
  //     RNG. Output is the held-out frame with per-doc score, prediction
  //     and agreement vs the rule label, ORDER BY doc_id.
  //
  // Scale shape: tokenize+distinct is map-side per doc; the only wide ops
  // are groupBy(term) over per-doc-distinct trigrams (vocabulary-bounded
  // output), one term-keyed join of doc-trigrams against the weight table
  // (broadcastable — see above), and doc-keyed aggregates. The (n_hq,n_lq)
  // pair and the threshold ride 1-row broadcasts, the same shape as
  // q104's corpus-stats row. Nothing is corpus-pairwise; every collect-
  // free stage is linear in the data with vocabulary-bounded state.
  // The building blocks live in operators.QualityClassifier so this
  // query, the fit-and-persist path and the ingest-time
  // QualityClassifierRule compose the SAME expressions.
  def q133QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.QualityClassifier._
    val m = labeled(docs(s, dir), col("doc_id"), col("text"))
      .pinned // referenced by tok, the train-count row and the held-out frame
    val tok = tokenStream(m)
      .pinned // referenced by the weight fit and the all-doc scoring join
    val train = col("doc_id") % 5 =!= 0
    val mTrain = m.filter(train)
    val w = weights(tok.filter(train), classCounts(mTrain), minDf = 3)
    val sc = scores(tok, w)
      .pinned // referenced by the threshold calibration and the held-out output
    val tau = calibrate(sc, mTrain)
    val scored = coalesce(col("score"), lit(0.5))
    m.filter(col("doc_id") % 5 === 0)
      .join(sc, Seq("doc_id"), "left")
      .crossJoin(broadcast(tau))
      .select(
        col("doc_id"),
        col("label_hq"),
        coalesce(col("n_hits"), lit(0)).as("n_hits"),
        scored.as("score"),
        (scored >= col("tau")).as("pred_hq"),
        ((scored >= col("tau")) === col("label_hq")).as("correct"))
      .orderBy("doc_id")
  }

  val q133Sql: String = {
    val stop = graft.operators.QualityClassifier.stopwords
      .map("'" + _ + "'")
      .mkString("[", ",", "]")
    s"""WITH d AS (SELECT doc_id, TRIM(LOWER(text)) AS tx,
      |             list_filter(regexp_split_to_array(TRIM(LOWER(text)), '\\s+'),
      |                         w -> w <> '') AS toks
      |           FROM documents),
      |m AS MATERIALIZED (SELECT doc_id, tx,
      |        (LEN(toks) >= 30
      |         AND CAST(LEN(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
      |               / LEN(toks) >= 0.8
      |         AND LEN(list_filter($stop,
      |                             sw -> list_contains(toks, sw))) >= 2) AS label_hq
      |      FROM d WHERE LEN(toks) > 0),
      |tok AS MATERIALIZED (SELECT doc_id, label_hq,
      |          unnest(list_distinct(list_transform(range(1, LENGTH(tx) - 1),
      |                                              i -> tx[i:i+2]))) AS term
      |        FROM m),
      |n AS (SELECT SUM(CASE WHEN label_hq THEN 1 ELSE 0 END) AS nhq,
      |             SUM(CASE WHEN label_hq THEN 0 ELSE 1 END) AS nlq
      |      FROM m WHERE doc_id % 5 <> 0),
      |w AS (SELECT term, (a * 20000 + (a + b)) // (2 * (a + b)) AS wi
      |      FROM (SELECT term,
      |              (SUM(CASE WHEN label_hq THEN 1 ELSE 0 END) + 1) * (n.nlq + 2) AS a,
      |              (SUM(CASE WHEN label_hq THEN 0 ELSE 1 END) + 1) * (n.nhq + 2) AS b
      |            FROM tok, n WHERE doc_id % 5 <> 0
      |            GROUP BY term, n.nhq, n.nlq HAVING COUNT(*) >= 3)),
      |sc AS MATERIALIZED (SELECT tok.doc_id,
      |         CAST(COUNT(*) AS INTEGER) AS n_hits,
      |         SUM(w.wi) AS ksum,
      |         CAST(SUM(w.wi) AS DOUBLE) / 10000 / COUNT(*) AS score
      |       FROM tok JOIN w ON tok.term = w.term
      |       GROUP BY tok.doc_id),
      |tau AS (SELECT (CAST(SUM(CASE WHEN m.label_hq
      |                    THEN (2 * sc.ksum + sc.n_hits) // (2 * sc.n_hits) END) AS DOUBLE)
      |                  / 10000 / SUM(CASE WHEN m.label_hq THEN 1 END)
      |                + CAST(SUM(CASE WHEN NOT m.label_hq
      |                    THEN (2 * sc.ksum + sc.n_hits) // (2 * sc.n_hits) END) AS DOUBLE)
      |                  / 10000 / SUM(CASE WHEN NOT m.label_hq THEN 1 END)) / 2 AS t
      |        FROM sc JOIN m ON sc.doc_id = m.doc_id WHERE sc.doc_id % 5 <> 0)
      |SELECT m.doc_id, m.label_hq,
      |  COALESCE(sc.n_hits, 0) AS n_hits,
      |  COALESCE(sc.score, 0.5) AS score,
      |  COALESCE(sc.score, 0.5) >= tau.t AS pred_hq,
      |  (COALESCE(sc.score, 0.5) >= tau.t) = m.label_hq AS correct
      |FROM m LEFT JOIN sc ON m.doc_id = sc.doc_id, tau
      |WHERE m.doc_id % 5 = 0
      |ORDER BY m.doc_id""".stripMargin
  }

  // ---- q104: BM25 top-k keyword retrieval (Robertson et al., Okapi) ----------
  // Sparse retrieval over the corpus inverted index: a fixed query set
  // is broadcast, postings are filtered to query terms BEFORE any
  // shuffle, df rides the term-partitioned window, and per-doc scores
  // sum fixed query-term slots (never a partition-ordered double SUM).
  // The rational-idf (log-free) variant keeps every arithmetic step
  // bit-identical across engines — see operators.Bm25 for the scale
  // and determinism rationale. qid 4 includes a term absent from the
  // corpus, exercising the missing-slot coalesce path.
  private val bm25Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("spark", "join"),
    2 -> Seq("window", "agg"),
    3 -> Seq("customer", "stream", "query"),
    4 -> Seq("vector", "perplexity")
  )

  def q104Bm25(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bm25
      .topK(docs(s, dir), "doc_id", col("text"), bm25Queries, k1 = 1.2, b = 0.75, k = 10)
      .orderBy("qid", "rank")

  /** DuckDB replay of the rational-idf BM25 ranking for a query set —
    * shared by q104 (exact) and q110 (pruned: [[graft.operators.Bm25
    * .topKPruned]] is exactness-preserving by its max-score bound +
    * fallback, so the UNPRUNED relational form is the correct oracle
    * for it too).
    */
  private def bm25Sql(queries: Seq[(Int, Seq[String])]): String = {
    val maxTerms = queries.map(_._2.size).max
    val allTerms = queries.flatMap(_._2).distinct.map("'" + _ + "'").mkString(",")
    val qtRows = queries
      .flatMap { case (qid, ts) => ts.zipWithIndex.map { case (t, i) => s"($qid,$i,'$t')" } }
      .mkString(",")
    val slotCols = (0 until maxTerms)
      .map(i => s"          MAX(CASE WHEN slot = $i THEN s END) AS s$i")
      .mkString(",\n")
    val scoreExpr = (0 until maxTerms).foldLeft("0.0") { (acc, i) =>
      s"($acc + COALESCE(s$i, 0.0))"
    }
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
       |           FROM documents),
       |base AS (SELECT doc_id, toks, LEN(toks) AS dl FROM t),
       |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl
       |          FROM base),
       |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM (SELECT doc_id, dl, unnest(list_filter(toks, w -> w IN ($allTerms))) AS term
       |             FROM base)
       |       GROUP BY doc_id, dl, term),
       |wdf AS (SELECT doc_id, dl, term, tf,
       |          CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
       |        FROM tf),
       |sc AS (SELECT doc_id, term,
       |         ((CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
       |         ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
       |          (CAST(tf AS DOUBLE) +
       |           1.2 * (1.0 - 0.75 + (0.75 * CAST(dl AS DOUBLE))
       |                  / (CAST(sum_dl AS DOUBLE) / n_docs)))) AS s
       |       FROM wdf CROSS JOIN stats),
       |qt(qid, slot, term) AS (VALUES $qtRows),
       |per AS (SELECT qid, doc_id,
       |$slotCols
       |        FROM sc JOIN qt USING (term) GROUP BY qid, doc_id),
       |r AS (SELECT qid, doc_id,
       |        $scoreExpr AS score
       |      FROM per),
       |rk AS (SELECT qid, doc_id, score,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)
       |              AS INTEGER) AS rank
       |       FROM r)
       |SELECT CAST(qid AS INTEGER) AS qid, rank, doc_id, score
       |FROM rk WHERE rank <= 10
       |ORDER BY qid, rank""".stripMargin
  }

  val q104Sql: String = bm25Sql(bm25Queries)

  // ---- q132: streaming sparse-index lifecycle, served vs full-corpus oracle --
  // The sparse complement of q126/q127's dense index lifecycle (round-14
  // verdict #5): documents ingested as THREE postings micro-batches
  // (StreamingPostings.ingestBatch — commit markers, replay-idempotent
  // overwrites), the first two folded into a fresh versioned base
  // (term-repartitioned, the serving layout), the third carried over
  // raw-free (carryUnfolded — committed tokenized partitions + marker,
  // no re-tokenization), then BM25 served from base + carried delta
  // (Bm25.topKFromIndex). The oracle is the ordinary FULL-CORPUS BM25
  // relational form: index-served scores are bit-identical to a corpus
  // scan by construction (one shared scoring expression tree), so the
  // whole ingest→fold→carry→serve lifecycle is what the hash gate
  // certifies. qid 3 includes a corpus-absent term (missing-slot
  // coalesce under the index path). At 100 TB: each batch's postings
  // build touches only that batch, the fold is one term-shuffle of
  // index rows (never raw text), serving reads the queried terms' row
  // groups from the term-sorted base.
  private val q132Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("spark", "scan"),
    2 -> Seq("filter", "agg", "stream"),
    3 -> Seq("join", "perplexity")
  )

  def q132StreamingPostings(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamingPostings
    val root = java.nio.file.Files.createTempDirectory("graft_q132").toString
    val v1 = s"$root/postings_v1"
    val d = docs(s, dir)
    (0 until 2).foreach { i =>
      StreamingPostings.ingestBatch(
        d.filter(pmod(col("doc_id"), lit(3)) === i), i.toLong, v1, "doc_id", "text")
    }
    val v2 = s"$root/postings_v2"
    StreamingPostings.foldDeltas(s, v1, v2)
    // the late batch lands in the OLD dir after the fold's snapshot;
    // close out into the new version without touching raw documents
    StreamingPostings.ingestBatch(
      d.filter(pmod(col("doc_id"), lit(3)) === 2), 2L, v1, "doc_id", "text")
    require(StreamingPostings.carryUnfolded(s, v1, v2) == Seq(2L))
    StreamingPostings.search(StreamingPostings.load(s, v2), q132Queries, k = 10)
      .orderBy("qid", "rank")
  }

  val q132Sql: String = bm25Sql(q132Queries)

  // ---- q110: BM25 with WAND/max-score pruning --------------------------------
  // Same ranking as q104 but through Bm25.topKPruned: every (query,
  // term) posting list is impact-truncated to its top-`cap` entries
  // map-side (WindowGroupLimit), candidates are re-scored on full
  // postings, and the classic max-score bound certifies exactness (or
  // the query falls back to unpruned scoring). On this corpus the
  // query terms have df≈400 > cap=100, so the pruning path genuinely
  // executes; because the operator is exactness-preserving, the oracle
  // is the ordinary unpruned relational form.
  private val wandQueries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("batch", "scan"),
    2 -> Seq("data", "slow", "filter"),
    3 -> Seq("join")
  )

  def q110Bm25Wand(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bm25
      .topKPruned(
        docs(s, dir),
        "doc_id",
        col("text"),
        wandQueries,
        k1 = 1.2,
        b = 0.75,
        k = 10,
        cap = 100)
      .orderBy("qid", "rank")

  val q110Sql: String = bm25Sql(wandQueries)

  // ---- q122: RM3 pseudo-relevance-feedback query expansion --------------------
  // The published retrieval-quality step on top of BM25 (Lavrenko &
  // Croft 2001 relevance models, standard rational simplification):
  // first-pass top-5 feedback docs per query, expansion weights
  // w(t) = sum over fixed feedback-rank slots of tf/dl (literal
  // order), top-3 new terms normalized and mixed at lambda = 0.5 into
  // a second BM25 pass over the combined slot range. Fully relational
  // (the expanded term table joins a full inverted-index build —
  // no driver collect), every sum a fixed-slot literal-order pivot,
  // so the expanded ranking hash-gates end-to-end.
  private val rm3Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("data", "quality"),
    2 -> Seq("spark"),
    3 -> Seq("stream", "window")
  )
  private val rm3FbDocs = 5
  private val rm3FbTerms = 3

  def q122Rm3Expansion(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bm25
      .topKRm3(
        docs(s, dir), "doc_id", col("text"), rm3Queries,
        k1 = 1.2, b = 0.75, k = 10,
        fbDocs = rm3FbDocs, fbTerms = rm3FbTerms, lambda = 0.5)
      .orderBy("qid", "rank")

  val q122Sql: String = {
    val maxTerms = rm3Queries.map(_._2.size).max
    val nSlots = maxTerms + rm3FbTerms
    val qtRows = rm3Queries
      .flatMap { case (qid, ts) => ts.zipWithIndex.map { case (t, i) => s"($qid,$i,'$t')" } }
      .mkString(",")
    def pivotSum(n: Int, pivotCol: String, onCol: String) = {
      val slots = (0 until n)
        .map(i => s"MAX(CASE WHEN $pivotCol = $i THEN $onCol END) AS _p$i")
        .mkString(", ")
      val total = (0 until n).foldLeft("0.0") { (acc, i) => s"($acc + COALESCE(_p$i, 0.0))" }
      (slots, total)
    }
    val (p1Slots, p1Total) = pivotSum(maxTerms, "slot", "s")
    val (p2Slots, p2Total) = pivotSum(nSlots, "slot", "s")
    val frSlots = (1 to rm3FbDocs)
      .map(r => s"MAX(CASE WHEN fr = $r THEN CAST(tf AS DOUBLE) / dl END) AS _w$r")
      .mkString(", ")
    val frTotal = (1 to rm3FbDocs).foldLeft("0.0") { (acc, r) =>
      s"($acc + COALESCE(_w$r, 0.0))"
    }
    val erSlots = (1 to rm3FbTerms)
      .map(r => s"MAX(CASE WHEN er = $r THEN w END) AS _n$r")
      .mkString(", ")
    val erTotal = (1 to rm3FbTerms).foldLeft("0.0") { (acc, r) =>
      s"($acc + COALESCE(_n$r, 0.0))"
    }
    val contrib =
      """((CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
        |         ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
        |          (CAST(tf AS DOUBLE) +
        |           1.2 * (1.0 - 0.75 + (0.75 * CAST(dl AS DOUBLE))
        |                  / (CAST(sum_dl AS DOUBLE) / n_docs))))""".stripMargin
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
       |           FROM documents),
       |tbase AS (SELECT doc_id, toks, LEN(toks) AS dl FROM t),
       |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl
       |          FROM tbase),
       |itf AS MATERIALIZED (
       |  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM tbase)
       |  GROUP BY doc_id, dl, term),
       |qt(qid, slot, term) AS (VALUES $qtRows),
       |p1posts AS (
       |  SELECT doc_id, dl, term, tf,
       |    CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
       |  FROM itf WHERE term IN (SELECT DISTINCT term FROM qt)),
       |p1s AS (SELECT qid, slot, doc_id, $contrib AS s
       |        FROM p1posts JOIN qt USING (term) CROSS JOIN stats),
       |p1 AS (SELECT qid, doc_id, $p1Slots FROM p1s GROUP BY qid, doc_id),
       |fb AS (SELECT qid, doc_id,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |           ORDER BY $p1Total DESC, doc_id) AS INTEGER) AS fr
       |       FROM p1 QUALIFY fr <= $rm3FbDocs),
       |ew AS (SELECT qid, term, $frSlots
       |       FROM itf JOIN fb USING (doc_id)
       |       GROUP BY qid, term),
       |ew2 AS (SELECT qid, term, $frTotal AS w FROM ew),
       |ex AS (SELECT qid, term, w,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |           ORDER BY w DESC, term) AS INTEGER) AS er
       |       FROM ew2
       |       WHERE NOT EXISTS (SELECT 1 FROM qt
       |                         WHERE qt.qid = ew2.qid AND qt.term = ew2.term)
       |       QUALIFY er <= $rm3FbTerms),
       |norm AS (SELECT qid, $erSlots FROM ex GROUP BY qid),
       |norm2 AS (SELECT qid, $erTotal AS wsum FROM norm),
       |et AS (SELECT ex.qid, CAST(ex.er + ${maxTerms - 1} AS INTEGER) AS slot, ex.term,
       |         0.5 * (ex.w / norm2.wsum) AS weight
       |       FROM ex JOIN norm2 ON ex.qid = norm2.qid),
       |ct AS (SELECT qid, slot, term, 1.0 AS weight FROM qt
       |       UNION ALL SELECT qid, slot, term, weight FROM et),
       |p2posts AS (
       |  SELECT doc_id, dl, term, tf,
       |    CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
       |  FROM itf WHERE term IN (SELECT DISTINCT term FROM ct)),
       |p2s AS (SELECT qid, slot, doc_id, ($contrib) * weight AS s
       |        FROM p2posts JOIN ct USING (term) CROSS JOIN stats),
       |p2 AS (SELECT qid, doc_id, $p2Slots FROM p2s GROUP BY qid, doc_id)
       |SELECT CAST(qid AS INTEGER) AS qid,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY $p2Total DESC, doc_id) AS INTEGER) AS rank,
       |  doc_id, $p2Total AS score
       |FROM p2
       |QUALIFY rank <= 10
       |ORDER BY qid, rank""".stripMargin
  }

  // ---- q111/q112: BPE tokenizer training + encoding (Sennrich 2016) ----------
  // Training runs on the word-frequency table (corpus-sized work once,
  // vocabulary-sized work per merge round); the only driver traffic is
  // each round's 1-row argmax — the q52 bounded-collect contract. The
  // oracle unrolls the rounds as CTEs (the q52/q100 unrolled-Lloyd
  // pattern) with a RELATIONAL re-implementation of the greedy
  // left-to-right merge: match flags via LEAD, overlap chains resolved
  // by gaps-and-islands run parity (chains only arise for equal-symbol
  // pairs), consumed positions dropped via LAG — genuinely independent
  // of the Spark side's fold-based application. All arithmetic is
  // exact integer counting; ties break on (count DESC, l, r).

  private val bpeRounds = 8

  /** CTE chain `wfreq .. sym{rounds}`: word-freq table, symbolized as
    * chars, then `rounds` unrolled merge rounds, each exposing
    * `best$r` (the round's learned merge) and `sym$r` (symbols after
    * applying it). The multiply-referenced CTEs are MATERIALIZED:
    * DuckDB otherwise inlines each reference, and with sym{r}
    * referenced 3× per round the expansion is exponential in rounds
    * (the un-hinted 8-round chain never finishes; hinted it runs in
    * well under a second).
    */
  private def bpeTrainCtes(rounds: Int): String = {
    val base =
      s"""wfreq AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
         |          FROM (SELECT unnest(regexp_split_to_array(TRIM(LOWER(text)), '\\s+')) AS word
         |                FROM documents)
         |          WHERE LEN(word) > 0 GROUP BY word),
         |wtab AS MATERIALIZED (SELECT word, wc, ROW_NUMBER() OVER (ORDER BY word) AS wid FROM wfreq),
         |wpos AS (SELECT wid, wc, word, unnest(range(1, LEN(word) + 1)) AS pos FROM wtab),
         |sym0 AS MATERIALIZED (SELECT wid, wc, CAST(pos AS BIGINT) AS pos, substr(word, CAST(pos AS INTEGER), 1) AS sym
         |         FROM wpos)""".stripMargin
    val roundCtes = (0 until rounds).map { r =>
      val n = r + 1
      s"""pairs$n AS (SELECT a.sym AS l, b.sym AS r, SUM(a.wc) AS c
         |            FROM sym$r a JOIN sym$r b ON a.wid = b.wid AND b.pos = a.pos + 1
         |            GROUP BY a.sym, b.sym),
         |best$n AS MATERIALIZED (SELECT l, r, CAST(c AS BIGINT) AS c FROM pairs$n ORDER BY c DESC, l, r LIMIT 1),
         |mt$n AS (SELECT s.wid, s.wc, s.pos, s.sym,
         |           CASE WHEN s.sym = b.l
         |                 AND LEAD(s.sym) OVER (PARTITION BY s.wid ORDER BY s.pos) = b.r
         |                THEN 1 ELSE 0 END AS mt,
         |           LEAD(s.sym) OVER (PARTITION BY s.wid ORDER BY s.pos) AS nx
         |         FROM sym$r s CROSS JOIN best$n b),
         |isl$n AS (SELECT *, CASE WHEN mt = 1
         |                 THEN pos - ROW_NUMBER() OVER (PARTITION BY wid, mt ORDER BY pos) END AS grp
         |          FROM mt$n),
         |tk$n AS (SELECT *, CASE WHEN mt = 1
         |                AND (ROW_NUMBER() OVER (PARTITION BY wid, grp ORDER BY pos) - 1) % 2 = 0
         |               THEN 1 ELSE 0 END AS taken
         |         FROM isl$n),
         |sym$n AS MATERIALIZED (SELECT wid, wc, ROW_NUMBER() OVER (PARTITION BY wid ORDER BY pos) AS pos,
         |            CASE WHEN taken = 1 THEN sym || nx ELSE sym END AS sym
         |          FROM (SELECT *, LAG(taken) OVER (PARTITION BY wid ORDER BY pos) AS consumed
         |                FROM tk$n)
         |          WHERE COALESCE(consumed, 0) = 0)""".stripMargin
    }
    (base +: roundCtes).mkString(",\n")
  }

  def q111BpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val merges = graft.operators.Bpe.trainMerges(docs(s, dir), col("text"), bpeRounds)
    merges.zipWithIndex
      .map { case ((l, r, c), i) => (i + 1, l, r, c) }
      .toDF("rank", "l", "r", "pair_count")
      .orderBy("rank")
  }

  val q111Sql: String = {
    val rows = (1 to bpeRounds)
      .map(n => s"SELECT $n AS rank, l, r, c AS pair_count FROM best$n")
      .mkString("\n      UNION ALL ")
    s"""WITH ${bpeTrainCtes(bpeRounds)}
       |SELECT CAST(rank AS INTEGER) AS rank, l, r, pair_count
       |FROM ($rows)
       |ORDER BY rank""".stripMargin
  }

  def q112BpeEncode(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val merges = graft.operators.Bpe.trainMerges(d, col("text"), bpeRounds).map(m => (m._1, m._2))
    // Encode each DISTINCT word once (vocabulary-sized work), then
    // broadcast the tiny word -> token-count table back onto the doc
    // word stream — at 100 TB the fold never runs twice for one word
    // and the join is map-side.
    val wtok = broadcast(
      graft.operators.Bpe
        .wordFreq(d, col("text"))
        .select(
          col("word"),
          size(graft.operators.Bpe.encodeWord(col("word"), merges)).as("nt"),
          length(col("word")).cast("long").as("nc")))
    d.select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .join(wtok, "word")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("nc")).as("n_chars"),
        sum(col("nt")).cast("long").as("n_bpe_tokens"))
      .withColumn("compression", col("n_chars").cast("double") / col("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  val q112Sql: String = {
    s"""WITH ${bpeTrainCtes(bpeRounds)},
       |wtok AS (SELECT wid, CAST(COUNT(*) AS BIGINT) AS nt FROM sym$bpeRounds GROUP BY wid),
       |dwords AS (SELECT doc_id, unnest(regexp_split_to_array(TRIM(LOWER(text)), '\\s+')) AS word
       |           FROM documents),
       |joined AS (SELECT d.doc_id, w.wc, t.nt, LEN(d.word) AS nc
       |           FROM (SELECT * FROM dwords WHERE LEN(word) > 0) d
       |           JOIN wtab w ON d.word = w.word
       |           JOIN wtok t ON w.wid = t.wid)
       |SELECT doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(nc) AS BIGINT) AS n_chars,
       |  CAST(SUM(nt) AS BIGINT) AS n_bpe_tokens,
       |  CAST(SUM(nc) AS DOUBLE) / CAST(SUM(nt) AS BIGINT) AS compression
       |FROM joined GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q113: C4 quality filters (Raffel et al. 2020 §2.2) --------------------
  // The corpus text is a flat token stream (no newlines, no
  // punctuation), so the query first synthesizes a deterministic
  // multi-line "page" per document — 8-token lines, md5-derived
  // terminal punctuation (25% of lines get none), md5-selected
  // javascript/lorem-ipsum/brace/blocklist injections — and then runs
  // the REAL C4 filter set (operators.TextAnalysis.c4*) on it. The
  // synthesis is replayed in the oracle with the standard 7-hex
  // md5→long pattern, so every keep verdict is hash-gated. Line
  // synthesis binds toks/nl as columns first (the q99/q103
  // unmaterialized-array lesson).

  def q113C4Filters(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val h = (key: org.apache.spark.sql.Column) =>
      conv(md5(key).substr(1, 7), 16, 10).cast("long")
    val toksed = docs(s, dir)
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("toks"))
      .withColumn("nl", floor((size(col("toks")) + lit(7)) / lit(8.0)).cast("int"))
    val lines = transform(
      sequence(lit(0), col("nl") - 1),
      li => {
        val hv = h(concat(col("doc_id").cast("string"), lit("#"), li.cast("string")))
        concat(
          array_join(slice(col("toks"), li * 8 + 1, lit(8)), " "),
          when(hv % 23 === 0, lit(" javascript")).otherwise(lit("")),
          element_at(array(lit("."), lit("!"), lit("?"), lit("")), (hv % 4).cast("int") + 1))
      })
    val docH = h(concat(col("doc_id").cast("string"), lit("#page")))
    val page = concat(
      array_join(lines, "\n"),
      when(docH % 17 === 0, lit("\nlorem ipsum dolor sit amet.")).otherwise(lit("")),
      when(docH % 19 === 0, lit("\nvar x = { a: 1 };")).otherwise(lit("")),
      when(docH % 13 === 0, lit("\nbig casino win now!")).otherwise(lit("")))
    toksed
      .select(col("doc_id"), page.as("page"))
      .select(col("doc_id") +: TextAnalysis.c4PageMetrics(col("page")): _*)
      .withColumn("keep", TextAnalysis.c4Keep())
      .orderBy("doc_id")
  }

  val q113Sql: String = {
    // 7-hex md5 → long, the q39 replay pattern
    def h7(key: String) =
      s"""list_reduce(list_transform(range(1, 8),
         |              ii -> CAST(strpos('0123456789abcdef', substr(md5($key), ii, 1)) - 1 AS BIGINT)),
         |              (a, x) -> a * 16 + x)""".stripMargin
    val hLine = h7("CAST(doc_id AS VARCHAR) || '#' || CAST(li AS VARCHAR)")
    val hPage = h7("CAST(doc_id AS VARCHAR) || '#page'")
    s"""WITH d AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
       |           FROM documents),
       |n AS (SELECT doc_id, toks, CAST(FLOOR((LEN(toks) + 7) / 8.0) AS INTEGER) AS nl FROM d),
       |ls AS (SELECT doc_id,
       |         list_transform(range(0, nl), li ->
       |           array_to_string(list_slice(toks, li * 8 + 1, li * 8 + 8), ' ')
       |           || CASE WHEN $hLine % 23 = 0 THEN ' javascript' ELSE '' END
       |           || (['.', '!', '?', ''])[CAST($hLine % 4 AS INTEGER) + 1]) AS lines
       |       FROM n),
       |pg AS (SELECT doc_id,
       |         array_to_string(lines, chr(10))
       |         || CASE WHEN $hPage % 17 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
       |         || CASE WHEN $hPage % 19 = 0 THEN chr(10) || 'var x = { a: 1 };' ELSE '' END
       |         || CASE WHEN $hPage % 13 = 0 THEN chr(10) || 'big casino win now!' ELSE '' END AS page
       |       FROM ls),
       |k AS (SELECT doc_id, page,
       |        list_filter(string_split(page, chr(10)), l ->
       |          regexp_matches(TRIM(l), '[.!?"]$$')
       |          AND LEN(list_filter(regexp_split_to_array(TRIM(l), '\\s+'), w -> LEN(w) > 0)) >= 5
       |          AND NOT contains(LOWER(l), 'javascript')) AS kl
       |      FROM pg),
       |m AS (SELECT doc_id,
       |        CAST(LEN(string_split(page, chr(10))) AS INTEGER) AS n_lines,
       |        CAST(LEN(kl) AS INTEGER) AS n_kept_lines,
       |        CAST(LEN(regexp_replace(COALESCE(array_to_string(kl, chr(10)), ''), '[^.!?]', '', 'g'))
       |             AS INTEGER) AS n_sentences,
       |        contains(LOWER(page), 'lorem ipsum') AS has_lorem,
       |        contains(page, '{') AS has_brace,
       |        LEN(list_filter(regexp_split_to_array(TRIM(LOWER(page)), '\\s+'),
       |              t -> t IN ('casino', 'viagra', 'lottery'))) > 0 AS has_blockword,
       |        CAST(LEN(COALESCE(array_to_string(kl, chr(10)), '')) AS INTEGER) AS cleaned_len
       |      FROM k)
       |SELECT doc_id, n_lines, n_kept_lines, n_sentences, has_lorem, has_brace, has_blockword,
       |  cleaned_len,
       |  (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace AND NOT has_blockword) AS keep
       |FROM m
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q114: portable Count-Min Sketch (Cormode & Muthukrishnan 2005) --------
  // The frequency member of the portable-sketch family (q79 KMV, q105
  // HLL, q109 priority sampling): every bucket derives from md5, so
  // DuckDB builds the IDENTICAL d=4 × w=256 sketch over the same token
  // stream and the estimates hash-gate directly — no tolerance band,
  // unlike q45's engine-private sketches. The never_under column pins
  // the CMS hard invariant (estimates cannot undercount) as data.
  private val cmsProbes: Seq[String] =
    Seq("batch", "scan", "data", "join", "filter", "vector", "window",
      "customer", "zz-absent-token")

  def q114PortableCms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.CountMin
    val toks = docs(s, dir)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("item"))
      .filter(length(col("item")) > 0)
    val counters = CountMin.counters(toks, col("item"), d = 4, w = 256)
    val probes = cmsProbes.toDF("item")
    val exactCounts = toks
      .filter(col("item").isInCollection(cmsProbes))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("exact_count"))
    CountMin
      .estimate(counters, probes, col("item"), d = 4, w = 256)
      .join(exactCounts, Seq("item"), "left")
      .select(
        col("item").as("token"),
        coalesce(col("exact_count"), lit(0L)).as("exact_count"),
        col("cms_est"),
        (col("cms_est") >= coalesce(col("exact_count"), lit(0L))).as("never_under"))
      .orderBy("token")
  }

  val q114Sql: String = {
    def h7(key: String) =
      s"""list_reduce(list_transform(range(1, 8),
         |              ii -> CAST(strpos('0123456789abcdef', substr(md5($key), ii, 1)) - 1 AS BIGINT)),
         |              (a, x) -> a * 16 + x)""".stripMargin
    val probeRows = cmsProbes.map(p => s"('$p')").mkString(",")
    s"""WITH toks AS (SELECT t AS item
       |              FROM (SELECT unnest(regexp_split_to_array(TRIM(LOWER(text)), '\\s+')) AS t
       |                    FROM documents)
       |              WHERE LEN(t) > 0),
       |rows4 AS (SELECT unnest(range(0, 4)) AS i),
       |cnt AS (SELECT CAST(i AS INTEGER) AS r,
       |          ${h7("CAST(i AS VARCHAR) || '#' || item")} % 256 AS b,
       |          CAST(COUNT(*) AS BIGINT) AS c
       |        FROM toks CROSS JOIN rows4
       |        GROUP BY 1, 2),
       |pr(item) AS (VALUES $probeRows),
       |pb AS (SELECT item, CAST(i AS INTEGER) AS r,
       |         ${h7("CAST(i AS VARCHAR) || '#' || item")} % 256 AS b
       |       FROM pr CROSS JOIN rows4),
       |est AS (SELECT item, MIN(COALESCE(c, 0)) AS cms_est
       |        FROM pb LEFT JOIN cnt USING (r, b) GROUP BY item),
       |ex AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS exact_count FROM toks
       |       WHERE item IN (SELECT item FROM pr) GROUP BY item)
       |SELECT pr.item AS token,
       |  COALESCE(ex.exact_count, 0) AS exact_count,
       |  est.cms_est,
       |  est.cms_est >= COALESCE(ex.exact_count, 0) AS never_under
       |FROM pr
       |JOIN est ON pr.item = est.item
       |LEFT JOIN ex ON pr.item = ex.item
       |ORDER BY token""".stripMargin
  }

  // ---- q119: deterministic split assignment + leakage audit ------------------
  // The bread-and-butter eval-hygiene op: every document lands in
  // train/val/test by a pure hash of its id (90/5/5 — reproducible,
  // no state, stable under corpus growth), and the audit counts docs
  // whose NEAR-DUPLICATE group straddles splits — the leakage a
  // random split silently allows. The group key is a 1-hash MinHash
  // (the minimum md5-hash over the doc's 3-shingles): near-duplicate
  // docs share their min shingle with probability ≈ their Jaccard
  // similarity, while unrelated docs don't — so the corpus's real
  // near-dup clusters (the q35 pairs) exercise the audit, where an
  // exact-text fingerprint would report all zeros here. Docs too
  // short to shingle fall back to a per-doc unique key (no grouping).
  // One hash + a window over the group key + one aggregation.
  def q119SplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val h = conv(md5(concat(lit("split#"), col("doc_id").cast("string"))).substr(1, 7), 16, 10)
      .cast("long") % 100
    val toks = split(trim(lower(col("text"))), "\\s+")
    val assigned = docs(s, dir)
      .select(col("doc_id"), toks.as("_toks"), when(h < 90, "train").when(h < 95, "val").otherwise("test").as("split"))
      .select(
        col("doc_id"),
        col("split"),
        coalesce(
          // guard: Spark's sequence(0, n) DESCENDS for n < 0 (DuckDB's
          // range is empty) — gate the shingle build on >= 3 tokens
          when(
            size(col("_toks")) >= 3,
            array_min(transform(
              transform(
                sequence(lit(0), size(col("_toks")) - 3),
                i => concat_ws(" ", slice(col("_toks"), i + 1, lit(3)))),
              g => conv(md5(g).substr(1, 7), 16, 10).cast("long")))),
          -col("doc_id") - 1).as("fp"))
    val spread = assigned
      .withColumn(
        "n_splits_of_group",
        size(collect_set(col("split")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("fp")))))
    spread
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("n_splits_of_group") > 1, 1)).as("n_leaked_docs"))
      .orderBy("split")
  }

  val q119Sql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks,
      |    list_reduce(list_transform(range(1, 8),
      |      ii -> CAST(strpos('0123456789abcdef',
      |              substr(md5('split#' || CAST(doc_id AS VARCHAR)), ii, 1)) - 1 AS BIGINT)),
      |      (a, x) -> a * 16 + x) % 100 AS h
      |  FROM documents),
      |a AS (SELECT doc_id,
      |    COALESCE(list_min(list_transform(
      |        list_transform(range(0, LEN(toks) - 2),
      |          i -> array_to_string(list_slice(toks, i + 1, i + 3), ' ')),
      |        g -> list_reduce(list_transform(range(1, 8),
      |               ii -> CAST(strpos('0123456789abcdef', substr(md5(g), ii, 1)) - 1 AS BIGINT)),
      |               (a, x) -> a * 16 + x))),
      |      -doc_id - 1) AS fp,
      |    CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split
      |  FROM t),
      |sp AS (SELECT doc_id, split,
      |         COUNT(DISTINCT split) OVER (PARTITION BY fp) AS n_splits_of_group
      |       FROM a)
      |SELECT split,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(CASE WHEN n_splits_of_group > 1 THEN 1 END) AS BIGINT) AS n_leaked_docs
      |FROM sp
      |GROUP BY split
      |ORDER BY split""".stripMargin

  // ---- q123: temperature-scaled mixture weighting (T = 2) --------------------
  // The OTHER published multi-source balancing scheme (the mT5 /
  // multilingual-LM recipe: sample stratum i with probability
  // ∝ n_i^(1/T)): UniMax (q106) waterfills a budget under per-stratum
  // epoch caps; temperature scaling smooths the raw proportions by a
  // power law. T = 2 is chosen deliberately — n^(1/2) = sqrt(n) is
  // the one power that is CORRECTLY ROUNDED in every engine (the q27
  // determinism rule: no pow/ln, sqrt is exact), so the whole
  // allocation hash-gates. The normalizer Σ sqrt(n_i) folds over the
  // strata list in (source, lang) order — a sort_array fold mirrored
  // by the oracle's list_reduce (the q118 pinned-fold pattern), never
  // a partition-ordered double sum. Integer allocations come from
  // floor(budget·w) plus largest-remainder top-up, so they sum to the
  // budget exactly (spec-pinned); the remainder ranking is a global
  // window over the ~|sources|·|langs| stratum aggregate — dimension-
  // bounded like q68/q106 (PlanSpec allowlist).
  def q123TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 100000L
    // lazy localCheckpoint: strata feeds the ssum fold AND the alloc
    // branch (whose result feeds leftover AND the final join) — unpinned,
    // the corpus scan + aggregation would re-derive once per branch
    // (the q110/q115 plan-replication hazard)
    val strata = docs(s, dir)
      .select(
        col("source"),
        col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .groupBy(col("source"), col("lang"))
      .agg(sum(col("n")).as("n_tokens"))
      .pinned
    // ordered fold: Σ sqrt(n) over strata sorted by (source, lang)
    val ssum = strata
      .agg(sort_array(collect_list(struct(col("source"), col("lang"), col("n_tokens"))))
        .as("xs"))
      .select(
        aggregate(
          col("xs"),
          lit(0.0),
          (acc, x) => acc + sqrt(x.getField("n_tokens").cast("double"))).as("ssum"))
    val alloc = strata
      .crossJoin(broadcast(ssum))
      .withColumn("weight", sqrt(col("n_tokens").cast("double")) / col("ssum"))
      .withColumn("alloc_floor", floor(lit(budget.toDouble) * col("weight")).cast("long"))
      .withColumn("rem", lit(budget.toDouble) * col("weight") - col("alloc_floor"))
      .pinned
    val leftover = alloc.agg((lit(budget) - sum(col("alloc_floor"))).as("lo"))
    val wRem = Window.orderBy(col("rem").desc, col("source"), col("lang"))
    alloc
      .crossJoin(broadcast(leftover))
      .withColumn("rn", row_number().over(wRem))
      .withColumn(
        "alloc_tokens",
        col("alloc_floor") + when(col("rn") <= col("lo"), 1L).otherwise(0L))
      .select(col("source"), col("lang"), col("n_tokens"), col("weight"), col("alloc_tokens"))
      .orderBy("source", "lang")
  }

  val q123Sql: String =
    """WITH d AS (SELECT source, lang,
      |             CAST(LEN(regexp_split_to_array(TRIM(text), '\s+')) AS BIGINT) AS n
      |           FROM documents),
      |strata AS (SELECT source, lang, CAST(SUM(n) AS BIGINT) AS n_tokens
      |           FROM d GROUP BY source, lang),
      |ssum AS (SELECT list_reduce(list_prepend(0.0,
      |             list_transform(list(n_tokens ORDER BY source, lang),
      |               x -> sqrt(CAST(x AS DOUBLE)))),
      |             (a, b) -> a + b) AS ssum
      |         FROM strata),
      |alloc AS (SELECT source, lang, n_tokens,
      |            sqrt(CAST(n_tokens AS DOUBLE)) / ssum AS weight,
      |            CAST(FLOOR(100000.0 * (sqrt(CAST(n_tokens AS DOUBLE)) / ssum)) AS BIGINT)
      |              AS alloc_floor,
      |            100000.0 * (sqrt(CAST(n_tokens AS DOUBLE)) / ssum)
      |              - FLOOR(100000.0 * (sqrt(CAST(n_tokens AS DOUBLE)) / ssum)) AS rem
      |          FROM strata CROSS JOIN ssum),
      |lo AS (SELECT 100000 - CAST(SUM(alloc_floor) AS BIGINT) AS lo FROM alloc),
      |rn AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source, lang) AS INTEGER)
      |              AS rn
      |       FROM alloc)
      |SELECT source, lang, n_tokens, weight,
      |  alloc_floor + CASE WHEN rn <= lo THEN 1 ELSE 0 END AS alloc_tokens
      |FROM rn CROSS JOIN lo
      |ORDER BY source, lang""".stripMargin

  // ---- q106: UniMax sampling-budget allocation (Chung et al. 2023) -----------
  // The published fair-sampling allocator for multi-source training
  // mixes: every (source, lang) stratum gets a uniform share of the
  // token budget, capped at epochCap·n_tokens (here 1 epoch), surplus
  // waterfilling into the uncapped strata. The waterline has a closed
  // form over the cap-ascending order — stratum r is capped iff
  // c_r·(S-r+1) ≤ B - cum_{r-1}, and that predicate is prefix-monotone
  // (f(r+1)-f(r) = (c_r-c_{r+1})(S-r) ≤ 0), so no iteration is needed:
  // one ranked window pass + one bounded aggregate. All the feasibility
  // math is exact integer arithmetic (the budget is an integer `div`);
  // only the final uniform share divides two exact longs in IEEE
  // double, so the whole allocation hash-matches the DuckDB replay.
  // The global windows run over the per-stratum AGGREGATE, bounded by
  // dimension cardinality (sources × langs), never by corpus size —
  // same argument as q68's nation rank (PlanSpec-pinned allowlist).
  // n_capped < S always: capping ALL strata would need B ≥ Σcaps, and
  // B = 0.6·Σcaps by construction, so the share division is total.
  def q106UnimaxAlloc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val strata = docs(s, dir)
      .select(
        col("source"),
        col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .groupBy(col("source"), col("lang"))
      .agg(sum(col("n")).as("n_tokens"))
    val tot = strata.agg(sum(col("n_tokens")).as("t_total"), count(lit(1)).as("n_strata"))
    val wOrd = Window.orderBy(col("n_tokens"), col("source"), col("lang"))
    val ranked = strata
      .crossJoin(broadcast(tot))
      .withColumn("budget", expr("(t_total * 6) div 10"))
      .withColumn("rank", row_number().over(wOrd))
      .withColumn(
        "cum",
        sum(col("n_tokens")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn(
        "capped",
        col("n_tokens") * (col("n_strata") - col("rank") + 1L) <=
          col("budget") - (col("cum") - col("n_tokens")))
    // Waterline totals via an unbounded frame over the SAME strata
    // rows — a second aggregate branch would re-scan the corpus (the
    // strata subtree is consumed twice); the full-frame window costs
    // one pass over the dimension-bounded aggregate instead.
    val wAll = Window
      .partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked
      .withColumn("cap_sum", sum(when(col("capped"), col("n_tokens")).otherwise(0L)).over(wAll))
      .withColumn("n_capped", sum(when(col("capped"), 1L).otherwise(0L)).over(wAll))
      .withColumn(
        "alloc",
        when(col("capped"), col("n_tokens").cast("double"))
          .otherwise(
            (col("budget") - col("cap_sum")).cast("double") / (col("n_strata") - col("n_capped"))))
      .select(
        col("source"),
        col("lang"),
        col("n_tokens"),
        col("rank"),
        col("capped"),
        col("alloc"),
        (col("alloc") / col("n_tokens")).as("epochs"))
      .orderBy("rank")
  }

  val q106Sql: String =
    """WITH t AS (SELECT source, lang,
      |             CAST(LEN(regexp_split_to_array(TRIM(text), '\s+')) AS BIGINT) AS n
      |           FROM documents),
      |strata AS (SELECT source, lang, CAST(SUM(n) AS BIGINT) AS n_tokens
      |           FROM t GROUP BY source, lang),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t_total,
      |          CAST(COUNT(*) AS BIGINT) AS n_strata FROM strata),
      |j AS (SELECT source, lang, n_tokens, t_total, n_strata,
      |        (t_total * 6) // 10 AS budget,
      |        CAST(ROW_NUMBER() OVER (ORDER BY n_tokens, source, lang) AS INTEGER) AS rank,
      |        CAST(SUM(n_tokens) OVER (ORDER BY n_tokens, source, lang
      |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |      FROM strata CROSS JOIN tot),
      |c AS (SELECT *,
      |        (n_tokens * (n_strata - rank + 1) <= budget - (cum - n_tokens)) AS capped
      |      FROM j),
      |f AS (SELECT *,
      |        CAST(SUM(CASE WHEN capped THEN n_tokens ELSE 0 END) OVER () AS BIGINT) AS cap_sum,
      |        CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS BIGINT) AS n_capped
      |      FROM c),
      |o AS (SELECT source, lang, n_tokens, rank, capped,
      |        CASE WHEN capped THEN CAST(n_tokens AS DOUBLE)
      |             ELSE CAST(budget - cap_sum AS DOUBLE) / (n_strata - n_capped) END AS alloc
      |      FROM f)
      |SELECT source, lang, n_tokens, rank, capped, alloc, alloc / n_tokens AS epochs
      |FROM o
      |ORDER BY rank""".stripMargin

  // ---- q108: content-defined chunking + chunk-level dedup (LBFS, Muthitacharoen
  // et al. 2001) ---------------------------------------------------------------
  // The storage-dedup primitive behind CDC systems: cut a document
  // into variable-size chunks at CONTENT-DEFINED boundaries (here:
  // after a 3-token window whose md5 ends in hex '0' — expected chunk
  // ≈ 16 tokens), so a shared passage chunks identically regardless of
  // where it sits in each document — exactly what fixed-size blocks
  // miss. Then chunk-content hashes group across the corpus: chunks
  // with n_copies ≥ 2 are the dedup hits. Scale shape: one row per
  // TOKEN (posexplode distributes giant docs across tasks instead of
  // folding per-doc in one lambda), boundary flags assign chunk ids
  // via an offset-frame running sum over the doc partition, the
  // (doc, chunk) groupBy rides the same doc partitioning, and only
  // chunk summaries shuffle by content hash. Chunk content is
  // reassembled position-sorted (collect_list is order-free;
  // sort_array pins it), so the hash is deterministic under any
  // partitioning.
  def q108CdcChunks(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -3)
    val toks = split(trim(lower(col("text"))), "\\s+")
    val perTok = docs(s, dir)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn(
        "cut",
        when(
          col("pos") <= col("n") - 3 &&
            substring(md5(concat_ws(" ", slice(col("toks"), col("pos") + 1, lit(3)))), 32, 1) === "0",
          1L).otherwise(0L))
      .select(col("doc_id"), col("pos"), col("tok"), col("cut"))
    val chunks = perTok
      .withColumn("chunk", coalesce(sum(col("cut")).over(w), lit(0L)))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(
        count(lit(1)).as("n_tokens"),
        md5(array_join(
          transform(sort_array(collect_list(struct(col("pos"), col("tok")))), s => s.getField("tok")),
          " ")).as("chunk_hash"))
    chunks
      .groupBy(col("chunk_hash"))
      .agg(
        count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("sample_doc"))
      .filter(col("n_copies") >= 2)
      .orderBy("chunk_hash")
  }

  val q108Sql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
      |           FROM documents),
      |p AS (SELECT doc_id, toks, LEN(toks) AS n,
      |        CAST(unnest(range(0, LEN(toks))) AS INTEGER) AS pos
      |      FROM t),
      |flagged AS (SELECT doc_id, pos, toks[pos + 1] AS tok,
      |        CASE WHEN pos <= n - 3
      |              AND substr(md5(toks[pos + 1] || ' ' || toks[pos + 2] || ' ' || toks[pos + 3]),
      |                         32, 1) = '0'
      |             THEN 1 ELSE 0 END AS cut
      |      FROM p),
      |assigned AS (SELECT doc_id, pos, tok,
      |        COALESCE(CAST(SUM(cut) OVER (PARTITION BY doc_id ORDER BY pos
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 3 PRECEDING) AS BIGINT), 0) AS chunk
      |      FROM flagged),
      |chunks AS (SELECT doc_id, chunk,
      |        CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |        md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
      |      FROM assigned GROUP BY doc_id, chunk)
      |SELECT chunk_hash,
      |  CAST(COUNT(*) AS BIGINT) AS n_copies,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(MIN(n_tokens) AS BIGINT) AS n_tokens,
      |  MIN(doc_id) AS sample_doc
      |FROM chunks
      |GROUP BY chunk_hash
      |HAVING COUNT(*) >= 2
      |ORDER BY chunk_hash""".stripMargin

  // ---- q129: distributed least-squares GD (linear scorer training) --------
  // The engine-side "fit a cheap linear scorer" primitive a curation
  // pipeline uses to distill an expensive teacher signal onto cheap
  // surface features (fastText-style quality filters are exactly such
  // linear models). Demonstrable target here: calibrate the corpus's
  // chars↔tokens relation — predict n_chars/1000 from
  // (1, n_tok/100, distinct-ratio, stopword-ratio), centered so plain
  // GD is well-conditioned (lr 0.85 sits under the 2/λmax ≈ 1.0
  // stability bound of the centered second-moment matrix; MSE drops
  // 0.108 → 0.0021 over the 8 rounds at sf0.01 — the trajectory is part
  // of the output and the oracle).
  //
  // Scale shape: each GD round is ONE map-side pass over the corpus —
  // a broadcast of the 1-row weight frame (BNLJ with a single-row
  // build side, PLANS.md-adjudicated), partial aggregation of the d+2
  // gradient/loss sums, no driver collect anywhere: the next round's
  // weights are a 1-row frame DERIVED from the previous aggregate, so
  // the whole T-round chain is a single declarative plan. Gradient and
  // loss sums go through Num.dsum (exact decimal) — bit-stable under
  // any partitioning and engine, which makes the TRAINED WEIGHTS
  // hash-comparable, not just the losses. Rounds unroll in the oracle
  // as CTEs (q111/q118 pattern).
  private val gdLr = 0.85
  private val gdRounds = 8

  def q129LinregGd(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Num
    val toks = split(trim(col("text")), "\\s+")
    val nTok = size(toks)
    val nStop = size(filter(toks, w => w.isInCollection(stopwords)))
    // The ratio features are pre-rounded to 4 decimals via integer-
    // scaled round(): raw quotients like 27/32 terminate at 5 decimals,
    // exactly on the DECIMAL(18,4) cast's tie boundary, where Spark
    // (shortest-string BigDecimal) and DuckDB (binary value) can round
    // apart. round()'s own ties (exact k.5 doubles) round half-away-
    // from-zero in BOTH engines, so the quantized ratio is bit-stable,
    // and every downstream dec() cast then sits far from a boundary.
    def ratio4(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      round(num.cast("double") * lit(10000.0) / den) / lit(10000.0)
    val feats = docs(s, dir)
      .select(
        lit(1.0).as("x0"),
        (nTok.cast("double") / lit(100.0) - lit(0.55)).as("x1"),
        (ratio4(size(array_distinct(toks)), nTok) - lit(0.46)).as("x2"),
        (lit(10.0) * ratio4(nStop, nTok) - lit(0.61)).as("x3"),
        (col("n_chars").cast("double") / lit(1000.0)).as("y"))
      .pinned
    val js = 0 to 3
    // GD rounds with the weights as DRIVER LITERALS (round-15
    // optimization, same rewrite as q131): each round is ONE
    // aggregation job over the pinned features — the previous 1-row-
    // weight-frame chain scheduled a broadcast-build plus a checkpoint
    // job per round and re-optimized a crossJoin plan each time. The
    // d+2 sums crossing the driver are a bounded sufficient statistic
    // (the KMeans per-iteration means-collect pattern), and the update
    // below is the exact IEEE op sequence of the old frame expression,
    // so weights, losses — and the oracle hash — are bit-identical.
    //
    // The residual is quantized to 4 decimals the same way the ratio
    // features are (integer-scaled round, identical half-away-from-
    // zero ties in both engines): a RAW double residual entering the
    // DECIMAL(18,4) cast would rest its cross-engine stability on no
    // residual ever having a shortest-string form terminating on a
    // .00005 boundary — true for this corpus but data-dependent.
    // Quantizing first makes the cast exact BY CONSTRUCTION.
    // dsumProduct, NOT dsum of the double product: the factors are
    // exactly representable at 4 decimals by construction, but their
    // DOUBLE product can land exactly on a .00005 tie, where Spark
    // (shortest-string BigDecimal) and DuckDB (binary-value) round
    // differently. Quantizing the factors and multiplying in decimal
    // keeps the whole sum exact.
    def zOf(ws: IndexedSeq[Double]) =
      js.map(j => lit(ws(j)) * col(s"x$j")).reduce(_ + _)
    var w: IndexedSeq[Double] = IndexedSeq.fill(js.size)(0.0)
    var trace = List.empty[(Int, String, Double)]
    for (t <- 1 to gdRounds) {
      val aggCols =
        js.map(j => Num.dsumProduct(col("r"), col(s"x$j")).as(s"g$j")) :+
          Num.dsumProduct(col("r"), col("r")).as("ssq") :+ count(lit(1)).as("n")
      val row = feats
        .withColumn("r", round((zOf(w) - col("y")) * lit(10000.0)) / lit(10000.0))
        .agg(aggCols.head, aggCols.tail: _*)
        .head()
      val n = row.getLong(js.size + 1)
      trace :+= ((t - 1, "mse", row.getDouble(js.size) / n))
      w = js.map(j => w(j) - gdLr * (2.0 * (row.getDouble(j) / n)))
      trace ++= js.map(j => (t, s"w$j", w(j)))
    }
    import s.implicits._
    val traced = trace.toDF("round", "item", "value")
    // the trained model's own loss: one more corpus pass under w_T
    val finalMse = feats
      .withColumn("r", round((zOf(w) - col("y")) * lit(10000.0)) / lit(10000.0))
      .agg((Num.dsumProduct(col("r"), col("r")) / count(lit(1))).as("v"))
      .select(lit(gdRounds).as("round"), lit("mse").as("item"), col("v").as("value"))
    traced.unionByName(finalMse).orderBy("round", "item")
  }

  val q129Sql: String = {
    val js = 0 to 3
    def dsumP(a: String, b: String) =
      s"CAST(CAST(SUM(CAST($a AS DECIMAL(18,4)) * CAST($b AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)"
    val rounds = (1 to gdRounds).map { t =>
      val p = s"w${t - 1}"
      s"""st$t AS (
         |  SELECT f.*, ROUND(((w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3) - f.y) * 10000.0) / 10000.0 AS r
         |  FROM feats f CROSS JOIN $p w),
         |g$t AS (
         |  SELECT ${js.map(j => s"${dsumP("r", s"x$j")} AS g$j").mkString(", ")},
         |         ${dsumP("r", "r")} AS ssq, COUNT(*) AS n
         |  FROM st$t),
         |w$t AS MATERIALIZED (
         |  SELECT ${js.map(j => s"w.w$j - $gdLr * (2.0 * (g.g$j / g.n)) AS w$j").mkString(", ")},
         |         g.ssq / g.n AS mse_prev
         |  FROM $p w CROSS JOIN g$t g)""".stripMargin
    }.mkString(",\n")
    val outRows = (1 to gdRounds).flatMap { t =>
      js.map(j =>
        s"SELECT $t AS round, 'w$j' AS item, w$j AS value FROM w$t") :+
        s"SELECT ${t - 1} AS round, 'mse' AS item, mse_prev AS value FROM w$t"
    }.mkString("\n  UNION ALL ")
    s"""WITH tk AS (
       |  SELECT n_chars, regexp_split_to_array(TRIM(text), '\\s+') AS toks FROM documents),
       |feats AS MATERIALIZED (
       |  SELECT 1.0 AS x0,
       |    CAST(LEN(toks) AS DOUBLE) / 100.0 - 0.55 AS x1,
       |    ROUND(CAST(LEN(list_distinct(toks)) AS DOUBLE) * 10000.0 / LEN(toks)) / 10000.0 - 0.46 AS x2,
       |    10.0 * (ROUND(CAST(LEN(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE) * 10000.0 / LEN(toks)) / 10000.0) - 0.61 AS x3,
       |    CAST(n_chars AS DOUBLE) / 1000.0 AS y
       |  FROM tk),
       |w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
       |$rounds,
       |stF AS (
       |  SELECT f.*, ROUND(((w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3) - f.y) * 10000.0) / 10000.0 AS r
       |  FROM feats f CROSS JOIN w$gdRounds w),
       |gF AS (SELECT ${dsumP("r", "r")} AS ssq, COUNT(*) AS n FROM stF),
       |rows AS (
       |  $outRows
       |  UNION ALL SELECT $gdRounds AS round, 'mse' AS item, ssq / n AS value FROM gF)
       |SELECT CAST(round AS INTEGER) AS round, item, value FROM rows
       |ORDER BY round, item""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q129_linreg_gd" -> (q129LinregGd _),
    "q108_cdc_chunks" -> (q108CdcChunks _),
    "q106_unimax_alloc" -> (q106UnimaxAlloc _),
    "q123_temperature_mix" -> (q123TemperatureMix _),
    "q104_bm25" -> (q104Bm25 _),
    "q132_streaming_postings" -> (q132StreamingPostings _),
    "q110_bm25_wand" -> (q110Bm25Wand _),
    "q122_rm3_expansion" -> (q122Rm3Expansion _),
    "q111_bpe_train" -> (q111BpeTrain _),
    "q112_bpe_encode" -> (q112BpeEncode _),
    "q113_c4_filters" -> (q113C4Filters _),
    "q114_portable_cms" -> (q114PortableCms _),
    "q119_split_leakage" -> (q119SplitLeakage _),
    "q103_gopher_rules" -> (q103GopherRules _),
    "q133_quality_classifier" -> (q133QualityClassifier _),
    "q93_adaptive_quality" -> (q93AdaptiveQuality _),
    "q95_length_batching" -> (q95LengthBatching _),
    "q89_dup_ngram_spans" -> (q89DupNgramSpans _),
    "q97_span_scrub" -> (q97SpanScrub _),
    "q90_sparse_docsim" -> (q90SparseDocsim _),
    "q91_fuzzy_editdist" -> (q91FuzzyEditdist _),
    "q84_sharded_pack" -> (q84ShardedPack _),
    "q83_mixture_sample" -> (q83MixtureSample _),
    "q77_novelty" -> (q77Novelty _),
    "q78_source_overlap" -> (q78SourceOverlap _),
    "q73_pack_spans" -> (q73PackSpans _),
    "q74_token_chunks" -> (q74TokenChunks _),
    "q67_lang_heavy_hitters" -> (q67LangHeavyHitters _),
    "q63_heavy_hitters" -> (q63HeavyHitters _),
    "q61_bigram_fluency" -> (q61BigramFluency _),
    "q59_histogram" -> (q59Histogram _),
    "q60_keywords" -> (q60Keywords _),
    "q30_dedup_exact" -> (q30DedupExact _),
    "q31_token_stats" -> (q31TokenStats _),
    "q32_text_quality" -> (q32TextQuality _),
    "q33_lang_profile" -> (q33LangProfile _),
    "q34_shingles" -> (q34Shingles _),
    "q46_repetition" -> (q46Repetition _),
    "q47_stratified_sample" -> (q47StratifiedSample _),
    "q48_scrub" -> (q48Scrub _),
    "q49_vocabulary" -> (q49Vocabulary _)
  )

  val oracles: Map[String, String] = Map(
    "q129_linreg_gd" -> q129Sql,
    "q108_cdc_chunks" -> q108Sql,
    "q106_unimax_alloc" -> q106Sql,
    "q123_temperature_mix" -> q123Sql,
    "q104_bm25" -> q104Sql,
    "q132_streaming_postings" -> q132Sql,
    "q110_bm25_wand" -> q110Sql,
    "q122_rm3_expansion" -> q122Sql,
    "q111_bpe_train" -> q111Sql,
    "q112_bpe_encode" -> q112Sql,
    "q113_c4_filters" -> q113Sql,
    "q114_portable_cms" -> q114Sql,
    "q119_split_leakage" -> q119Sql,
    "q103_gopher_rules" -> q103Sql,
    "q133_quality_classifier" -> q133Sql,
    "q93_adaptive_quality" -> q93Sql,
    "q95_length_batching" -> q95Sql,
    "q89_dup_ngram_spans" -> q89Sql,
    "q97_span_scrub" -> q97Sql,
    "q90_sparse_docsim" -> q90Sql,
    "q91_fuzzy_editdist" -> q91Sql,
    "q84_sharded_pack" -> q84Sql,
    "q83_mixture_sample" -> q83Sql,
    "q77_novelty" -> q77Sql,
    "q78_source_overlap" -> q78Sql,
    "q73_pack_spans" -> q73Sql,
    "q74_token_chunks" -> q74Sql,
    "q67_lang_heavy_hitters" -> q67Sql,
    "q63_heavy_hitters" -> q63Sql,
    "q61_bigram_fluency" -> q61Sql,
    "q59_histogram" -> q59Sql,
    "q60_keywords" -> q60Sql,
    "q30_dedup_exact" -> q30Sql,
    "q31_token_stats" -> q31Sql,
    "q32_text_quality" -> q32Sql,
    "q33_lang_profile" -> q33Sql,
    "q34_shingles" -> q34Sql,
    "q46_repetition" -> q46Sql,
    "q47_stratified_sample" -> q47Sql,
    "q48_scrub" -> q48Sql,
    "q49_vocabulary" -> q49Sql
  )
}
