package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.tables.Tables
import graft.operators.Pinned.PinOps

/** Training-data text pipeline, part 2: near-dup detection (MinHash+LSH,
  * SimHash, winnowing) and text analysis (language-ID, fingerprints) —
  * every stage oracle-checked bit-for-bit because all hashing is
  * engine-portable md5.
  */
object TextPipeline {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  // ---- q35: MinHash + LSH near-duplicate candidate pairs --------------------
  // 8 hash functions, 4 bands of 2 rows: collision prob J^2 per band — low
  // threshold so the synthetic corpus (shared vocabulary, no true dups)
  // still produces candidates to verify. Output: every candidate pair with
  // its exact Jaccard over 3-gram shingle sets.
  def q35MinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup
      // persistShingles=true: round 5 dropped the cache because the
      // PER-DOC shingle projection cost more to materialize than the
      // codegen kernels cost to recompute (6.7s vs 1.7s cold at
      // sf0.1). Since the pipeline now runs over DISTINCT texts, the
      // cached projection is the deduplicated one and the trade
      // reverses (round 7 re-measure: 1.5s vs 1.9s at sf0.1; sf1
      // inside the noise band). At 100 TB the equivalent remains a
      // staging table, not executor cache (SCALE.md).
      // dedupFirst: run LSH over distinct texts only and expand the
      // group pairs — output-identical (DedupSpec property), and on a
      // duplicate-heavy corpus every stage shrinks by the duplication
      // factor (sf1 soak: 50k docs but 4,992 distinct texts; 42s → see
      // SCALE.md). Adaptive: on a mostly-unique corpus the staging
      // window+expand is pure overhead, so the measured duplication
      // factor decides (TextGroups.adaptiveStaging).
      .minhashNearDups(docs(s, dir), idCol = "doc_id", textCol = "text", k = 3, numHashes = 8, bands = 4,
        persistShingles = true,
        dedupFirst = graft.operators.TextGroups.adaptiveStaging(docs(s, dir), col("text")))
      .orderBy("id1", "id2")

  /** Shared CTE chain computing the MinHash signatures + band rows of
    * q35 (`sh` shingle sets, `exploded` band hashes) — reused by the
    * q94 incremental oracle so both see identical signatures.
    */
  private val lshSigCte: String =
    """d AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks FROM documents),
      |sh AS (SELECT doc_id,
      |         CASE WHEN LEN(toks) >= 3
      |              THEN list_distinct(list_transform(range(0, LEN(toks) - 2),
      |                     i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
      |              ELSE [] END AS sh
      |       FROM d),
      |xs AS (SELECT doc_id,
      |         list_transform(sh, s -> list_reduce(list_transform(range(1, 16),
      |           ii -> CAST(strpos('0123456789abcdef', substr(md5(s), ii, 1)) - 1 AS BIGINT)),
      |           (a, x) -> a * 16 + x) % 1073741789) AS xs
      |       FROM sh WHERE LEN(sh) > 0),
      |sig AS (SELECT doc_id,
      |          list_transform(range(0, 8), i -> list_aggregate(
      |            list_transform(xs, x -> ((2*i + 1) * x + (i*i + i + 7)) % 1073741789), 'min')) AS sig
      |        FROM xs),
      |exploded AS (SELECT doc_id, band,
      |               md5(band || '|' || array_to_string(sig[band*2+1 : band*2+2], ',')) AS band_hash
      |             FROM (SELECT doc_id, sig, unnest(range(0, 4)) AS band FROM sig))""".stripMargin

  /** [[lshSigCte]] + the full candidate-pair CTE of q35 — reused
    * verbatim by the q51 clustering oracle so both queries see the
    * identical pair set.
    */
  private val lshPairsCte: String =
    s"""$lshSigCte,
      |pairs AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      |          FROM exploded a JOIN exploded b USING (band, band_hash)
      |          WHERE a.doc_id < b.doc_id)""".stripMargin

  val q35Sql: String =
    s"""WITH $lshPairsCte
      |SELECT id1, id2,
      |  CASE WHEN LEN(s1.sh) + LEN(s2.sh) - LEN(list_filter(s1.sh, x -> list_contains(s2.sh, x))) > 0
      |       THEN CAST(LEN(list_filter(s1.sh, x -> list_contains(s2.sh, x))) AS DOUBLE)
      |            / (LEN(s1.sh) + LEN(s2.sh) - LEN(list_filter(s1.sh, x -> list_contains(s2.sh, x))))
      |       ELSE 0.0 END AS jaccard
      |FROM pairs JOIN sh s1 ON id1 = s1.doc_id JOIN sh s2 ON id2 = s2.doc_id
      |ORDER BY id1, id2""".stripMargin

  // ---- q94: incremental near-dup (new batch vs corpus) -----------------------
  // The daily-ingestion form of q35: src0 (5% of the corpus) plays the
  // newly-crawled batch; output is every LSH candidate pair with at
  // least one src0 side, exact-Jaccard verified. Old-vs-old pairs are
  // never generated — at 100 TB that is the difference between pairing
  // a day's crawl against the corpus and re-pairing the corpus against
  // itself (Dedup.incrementalCandidatePairs has the bucket math; the
  // old side's band rows come from an ingest-time staging table in the
  // production form, SCALE.md).
  // dedupFirst: the incremental pipeline runs over distinct texts (a
  // group is "new" if any member is) and expands back — output-identical
  // (DedupSpec property), and on the duplicate-heavy sf1 soak every
  // stage shrinks by the duplication factor (12.2 s → 4-6 s measured
  // across runs in the host-noise band; SCALE.md).
  def q94IncrementalNeardup(s: SparkSession, dir: String): DataFrame =
    Dedup
      .incrementalNearDups(docs(s, dir), idCol = "doc_id", textCol = "text",
        isNew = col("source") === "src0", k = 3, numHashes = 8, bands = 4,
        dedupFirst = graft.operators.TextGroups.adaptiveStaging(docs(s, dir), col("text")))
      .orderBy("id1", "id2")

  // ---- q96: staged incremental near-dup (the production ingest path) --------
  // The same pairs as q94, but the corpus side comes from an
  // ingest-time STAGING TABLE (Dedup.stageNearDup: band rows + shingle
  // sets, computed once per doc ever) instead of being recomputed from
  // raw text — the form SCALE.md describes for daily crawl ingestion
  // at corpus scale. Here the "corpus" is the non-src0 documents
  // (staged) and the "batch" is src0 (computed fresh); output is
  // bit-identical to q94's recompute-everything form, so it shares
  // q94's oracle. Attests the staged path end-to-end: staging schema,
  // bucket union, old×old suppression, pre-materialized verify.
  def q96StagedNeardup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val (stagedBands, stagedSh) =
      Dedup.stageNearDup(d.filter(col("source") =!= "src0"), "doc_id", "text", 3, 8, 4)
    val (pairs, _) = Dedup.incrementalNearDupsStaged(
      stagedBands, stagedSh, d.filter(col("source") === "src0"), "doc_id", "text", 3, 8, 4)
    pairs.orderBy("id1", "id2")
  }

  // ---- q126: multi-day staged ingest replay ≡ one-shot recompute --------------
  // The quality gate on the whole incremental-dedup story: the corpus
  // arrives as FOUR daily batches (day = source index mod 4, ingested
  // in order), each day running incrementalNearDupsStaged against the
  // staging tables accumulated from the previous days and appending
  // its own staged rows — exactly the production loop SCALE.md
  // describes. The union of all four days' pair outputs must equal
  // the one-shot full-corpus recompute EXACTLY (the oracle replays the
  // q35 pair set): precision = recall = 1.0, pinned by hash equality,
  // not sampled. surfaced_in additionally pins WHEN each pair is
  // found — on the later member's ingest day, never before, never
  // twice (a duplicate emission or an old×old leak would break the
  // primary-key match). Staging tables are pinned once per day
  // ("written once at ingest"); nothing recomputes a previous day's
  // text.
  def q126StagedIngestReplay(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Pinned.PinOps
    val d = docs(s, dir)
    val day = d.select(
      col("doc_id"), col("text"),
      (substring(col("source"), 4, 10).cast("int") % 4).as("_day"))
    var stagedBands: DataFrame = null
    var stagedSh: DataFrame = null
    var acc: DataFrame = null
    for (b <- 0 until 4) {
      val batch = day.filter(col("_day") === b).select(col("doc_id"), col("text"))
      val (eb, es) =
        if (b == 0) Dedup.stageNearDup(batch.limit(0), "doc_id", "text", 3, 8, 4)
        else (stagedBands, stagedSh)
      val (pairs, (bb, bs)) =
        Dedup.incrementalNearDupsStaged(eb, es, batch, "doc_id", "text", 3, 8, 4)
      val tagged = pairs.select(col("id1"), col("id2"), lit(b).as("surfaced_in"), col("jaccard"))
      acc = if (acc == null) tagged else acc.unionByName(tagged)
      val (pb, ps) = (bb.pinned, bs.pinned)
      stagedBands = if (b == 0) pb else stagedBands.unionByName(pb)
      stagedSh = if (b == 0) ps else stagedSh.unionByName(ps)
    }
    acc.orderBy("id1", "id2")
  }

  val q126Sql: String =
    s"""WITH $lshPairsCte,
      |bat AS (SELECT doc_id, CAST(substr(source, 4) AS INTEGER) % 4 AS day FROM documents)
      |SELECT id1, id2,
      |  CAST(GREATEST(b1.day, b2.day) AS INTEGER) AS surfaced_in,
      |  CASE WHEN LEN(s1.sh) + LEN(s2.sh) - LEN(list_filter(s1.sh, x -> list_contains(s2.sh, x))) > 0
      |       THEN CAST(LEN(list_filter(s1.sh, x -> list_contains(s2.sh, x))) AS DOUBLE)
      |            / (LEN(s1.sh) + LEN(s2.sh) - LEN(list_filter(s1.sh, x -> list_contains(s2.sh, x))))
      |       ELSE 0.0 END AS jaccard
      |FROM pairs JOIN sh s1 ON id1 = s1.doc_id JOIN sh s2 ON id2 = s2.doc_id
      |JOIN bat b1 ON id1 = b1.doc_id JOIN bat b2 ON id2 = b2.doc_id
      |ORDER BY id1, id2""".stripMargin

  val q94Sql: String =
    s"""WITH $lshSigCte,
      |flag AS (SELECT doc_id, source = 'src0' AS is_new FROM documents),
      |pairs AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
      |            fa.is_new AS new1, fb.is_new AS new2
      |          FROM exploded a JOIN exploded b USING (band, band_hash)
      |          JOIN flag fa ON a.doc_id = fa.doc_id
      |          JOIN flag fb ON b.doc_id = fb.doc_id
      |          WHERE a.doc_id < b.doc_id AND (fa.is_new OR fb.is_new))
      |SELECT id1, id2, new1, new2,
      |  CASE WHEN LEN(s1.sh) + LEN(s2.sh) - LEN(list_filter(s1.sh, x -> list_contains(s2.sh, x))) > 0
      |       THEN CAST(LEN(list_filter(s1.sh, x -> list_contains(s2.sh, x))) AS DOUBLE)
      |            / (LEN(s1.sh) + LEN(s2.sh) - LEN(list_filter(s1.sh, x -> list_contains(s2.sh, x))))
      |       ELSE 0.0 END AS jaccard
      |FROM pairs JOIN sh s1 ON id1 = s1.doc_id JOIN sh s2 ON id2 = s2.doc_id
      |ORDER BY id1, id2""".stripMargin

  // ---- q36: SimHash document fingerprint -------------------------------------
  def q36Simhash(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      // kernel expression: one codegen'd call per row (values identical
      // to the declarative Dedup.simhash16, property-tested)
      .select(col("doc_id"), graft.expressions.TextHashExprs.simhash16(Dedup.tokens(col("text"))).as("simhash"))
      .orderBy("doc_id")

  val q36Sql: String =
    """WITH d AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks FROM documents),
      |b AS (SELECT doc_id,
      |        list_transform(range(0, 16), j ->
      |          CASE WHEN list_reduce(list_prepend(0, list_transform(toks,
      |                 t -> CASE WHEN substr(md5(t), j+1, 1) >= '8' THEN 1 ELSE -1 END)),
      |                 (a, x) -> a + x) > 0
      |               THEN 1 ELSE 0 END) AS bits
      |      FROM d)
      |SELECT doc_id,
      |  CAST(list_reduce(list_prepend(0, list_transform(list_zip(bits, range(0, 16)),
      |         p -> p[1] * (1 << p[2]))), (a, x) -> a + x) AS INTEGER) AS simhash
      |FROM b
      |ORDER BY doc_id""".stripMargin

  // ---- q37: winnowing fingerprints (k-gram=3, window=4) ----------------------
  // Memoized by distinct raw text (TextGroups) — pure text function.
  def q37Winnow(s: SparkSession, dir: String): DataFrame = {
    val fps = graft.expressions.TextHashExprs.winnow(Dedup.tokens(col("t")), k = 3, w = 4)
    graft.operators.TextGroups
      .perDoc(docs(s, dir), "doc_id", col("text")) { reps =>
        reps.select(
          col("gid"),
          size(fps).as("n_fingerprints"),
          array_min(fps).as("min_fp"),
          array_max(fps).as("max_fp")
        )
      }
      .orderBy("doc_id")
  }

  val q37Sql: String =
    """WITH d AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks FROM documents),
      |kh AS (SELECT doc_id,
      |         CASE WHEN LEN(toks) >= 3
      |              THEN list_transform(list_transform(range(0, LEN(toks) - 2),
      |                     i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]), s -> md5(s))
      |              ELSE [] END AS kh
      |       FROM d),
      |fp AS (SELECT doc_id,
      |         CASE WHEN LEN(kh) >= 4
      |              THEN list_distinct(list_transform(range(0, LEN(kh) - 3),
      |                     i -> list_aggregate(kh[i+1 : i+4], 'min')))
      |              WHEN LEN(kh) > 0 THEN [list_aggregate(kh, 'min')]
      |              ELSE [] END AS fps
      |       FROM kh)
      |SELECT doc_id,
      |  CAST(LEN(fps) AS INTEGER) AS n_fingerprints,
      |  list_aggregate(fps, 'min') AS min_fp,
      |  list_aggregate(fps, 'max') AS max_fp
      |FROM fp
      |ORDER BY doc_id""".stripMargin

  // ---- q38: language identification (indicator-word heuristic) ----------------
  def q38LangId(s: SparkSession, dir: String): DataFrame = {
    // Kernel: ONE pass over the token array for all languages; the
    // declarative per-language filter + argmax CASE chain re-evaluates
    // the hit counts ~15× per row (equality property-tested).
    val langs = TextAnalysis.indicators.map(_._1)
    // Scores memoized by distinct raw text (TextGroups); lang is a doc
    // attribute and joins back per doc.
    val scored = graft.operators.TextGroups
      // fanOutReps = false: one single-pass kernel per row — the
      // parallelism-floor repartition costs more than it saves here
      // (measured +0.2 s at sf0.1, round 15)
      .perDoc(docs(s, dir), "doc_id", col("text"), fanOutReps = false) { reps =>
        reps.select(
          col("gid"),
          graft.expressions.TextHashExprs.langScores(Dedup.tokens(col("t"))).as("scores"))
      }
    val staged = docs(s, dir).select(col("doc_id"), col("lang")).join(scored, "doc_id")
    val best = array_max(col("scores"))
    val pred = langs.zipWithIndex.foldRight(lit("und")) { case ((lang, i), elseCol) =>
      when(col("scores").getItem(i) > 0 && col("scores").getItem(i) === best, lang).otherwise(elseCol)
    }
    staged
      .select(
        Seq(col("doc_id"), col("lang"), pred.as("lang_pred")) ++
          langs.zipWithIndex.map { case (lang, i) => col("scores").getItem(i).as(s"score_$lang") }: _*
      )
      .orderBy("doc_id")
  }

  val q38Sql: String = {
    val scoreExprs = TextAnalysis.indicators
      .map { case (lang, words) =>
        s"CAST(LEN(list_filter(toks, t -> t IN (${words.map("'" + _ + "'").mkString(",")}))) AS INTEGER) AS score_$lang"
      }
      .mkString(",\n        ")
    val best = TextAnalysis.indicators.map { case (l, _) => s"score_$l" }.mkString("GREATEST(", ", ", ")")
    val cases = TextAnalysis.indicators
      .map { case (l, _) => s"WHEN score_$l > 0 AND score_$l = $best THEN '$l'" }
      .mkString(" ")
    s"""WITH d AS (SELECT doc_id, lang, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks FROM documents),
       |scored AS (SELECT doc_id, lang,
       |        $scoreExprs
       |      FROM d)
       |SELECT doc_id, lang, CASE $cases ELSE 'und' END AS lang_pred,
       |       score_de, score_en, score_es, score_fr, score_zh
       |FROM scored
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q39: document fingerprints (canonical md5 + positional rolling hash) ---
  // Memoized by distinct raw text (TextGroups) — pure text function.
  def q39Fingerprints(s: SparkSession, dir: String): DataFrame = {
    val toks = Dedup.tokens(col("t"))
    graft.operators.TextGroups
      .perDoc(docs(s, dir), "doc_id", col("text")) { reps =>
        reps.select(
          col("gid"),
          TextAnalysis.canonicalFingerprint(col("t")).as("canon_fp"),
          // kernel form of TextAnalysis.rollingHash (equality property-tested)
          graft.expressions.TextHashExprs.rollingHash(toks).as("rolling_hash")
        )
      }
      .orderBy("doc_id")
  }

  val q39Sql: String =
    """WITH d AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks FROM documents),
      |v AS (SELECT doc_id, array_to_string(toks, ' ') AS canon,
      |        list_transform(list_zip(toks, range(0, LEN(toks))), p ->
      |          list_reduce(list_transform(range(1, 8), ii ->
      |            CAST(strpos('0123456789abcdef', substr(md5(p[2] || '@' || p[1]), ii, 1)) - 1 AS BIGINT)),
      |            (a, x) -> a * 16 + x)) AS vals
      |      FROM d)
      |SELECT doc_id, md5(canon) AS canon_fp,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), vals),
      |    (acc, x) -> (acc * 31 + x) % 1073741789) AS rolling_hash
      |FROM v
      |ORDER BY doc_id""".stripMargin

  // ---- q51: near-duplicate clustering (LSH pairs → connected components) -------
  // The dedup DECISION stage: candidate pairs become per-doc cluster ids
  // (min doc_id of the component — keep that doc, drop the rest of the
  // cluster). Distributed min-label propagation; the oracle replays the
  // same pair set through a recursive CTE. Only clustered docs appear.
  def q51NearDupClusters(s: SparkSession, dir: String): DataFrame =
    // dedupFirst: band + pair + CC over distinct texts, expand group
    // labels — output-identical (DedupSpec), graph shrinks by the
    // corpus duplication factor before the iterative CC loop.
    // Adaptive by the measured duplication factor.
    Dedup
      .nearDupComponents(docs(s, dir), idCol = "doc_id", textCol = "text", k = 3, numHashes = 8, bands = 4,
        dedupFirst = graft.operators.TextGroups.adaptiveStaging(docs(s, dir), col("text")))
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
      .orderBy("doc_id")

  /** [[lshPairsCte]] + the recursive connected-components CTEs ending
    * in `clusters(doc_id, cluster_id)` — min-label propagation over
    * the LSH candidate pairs, factored once so q51/q64/q124's oracles
    * can never see divergent cluster labels (the lshSigCte argument
    * one level up).
    */
  private val ccClustersCte: String =
    s"""$lshPairsCte,
      |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
      |          UNION ALL
      |          SELECT id2, id1 FROM pairs),
      |reach AS (
      |  SELECT src AS id, src AS comp FROM edges
      |  UNION
      |  SELECT e.dst AS id, r.comp AS comp
      |  FROM reach r JOIN edges e ON r.id = e.src
      |  WHERE r.comp < e.dst
      |),
      |clusters AS (SELECT id AS doc_id, MIN(comp) AS cluster_id FROM reach GROUP BY id)""".stripMargin

  val q51Sql: String =
    s"""WITH RECURSIVE $ccClustersCte
      |SELECT doc_id, cluster_id
      |FROM clusters
      |ORDER BY doc_id""".stripMargin

  // ---- q124: canonical representative selection by QUALITY policy -------------
  // q64 keeps each near-dup cluster's MIN doc_id (first-arrival); a
  // production corpus keeps the BEST copy — crawled duplicates differ
  // in truncation and boilerplate, so the canonical pick is the member
  // with the most tokens (ties to the lower id). One rank window per
  // cluster over the CC labels (cluster count ≪ corpus, members per
  // cluster small), then a conditional aggregate — no second scan. The
  // oracle replays the full LSH → connected-components build (the
  // q51/q64 recursive-CTE template) and the same argmax.
  def q124CanonicalSelect(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val clusters = Dedup
      .nearDupComponents(d, idCol = "doc_id", textCol = "text", k = 3, numHashes = 8, bands = 4,
        dedupFirst = graft.operators.TextGroups.adaptiveStaging(d, col("text")))
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
    val toks = d.select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("cluster_id")).orderBy(col("n_tokens").desc, col("doc_id"))
    clusters
      .join(toks, "doc_id")
      .withColumn("rn", row_number().over(w))
      .groupBy(col("cluster_id"))
      .agg(
        count(lit(1)).as("n_members"),
        max(when(col("rn") === 1, col("doc_id"))).as("kept_doc_id"),
        max(when(col("rn") === 1, col("n_tokens"))).as("kept_n_tokens"))
      .filter(col("n_members") >= 2)
      .orderBy("cluster_id")
  }

  val q124Sql: String =
    s"""WITH RECURSIVE $ccClustersCte,
      |toks AS (SELECT doc_id,
      |           CAST(LEN(regexp_split_to_array(TRIM(text), '\\s+')) AS BIGINT) AS n_tokens
      |         FROM documents),
      |ranked AS (SELECT cluster_id, c.doc_id, n_tokens,
      |             ROW_NUMBER() OVER (PARTITION BY cluster_id
      |               ORDER BY n_tokens DESC, c.doc_id) AS rn
      |           FROM clusters c JOIN toks USING (doc_id))
      |SELECT cluster_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_members,
      |  MAX(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc_id,
      |  MAX(CASE WHEN rn = 1 THEN n_tokens END) AS kept_n_tokens
      |FROM ranked
      |GROUP BY cluster_id
      |HAVING COUNT(*) >= 2
      |ORDER BY cluster_id""".stripMargin

  // ---- q64: end-to-end corpus curation -------------------------------------------
  // The composed flow a corpus build actually runs, as ONE plan:
  //   1. quality gate: repetition (dup-bigram fraction) + length;
  //   2. near-dup dedup decision: of each LSH cluster keep the min
  //      doc_id (ConnectedComponents over candidate pairs);
  //   3. reproducible stratified sample: hash-ordered top-10 per lang.
  // Every stage is individually oracle-checked (q46/q51/q47); this
  // checks their composition bit-for-bit.
  def q64Curation(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // Text metrics memoized by distinct text (TextGroups); lang is a
    // doc attribute, not a text function, so it joins back per doc.
    val textMetrics = graft.operators.TextGroups
      .perDoc(d, "doc_id", lower(trim(col("text")))) { reps =>
        val toks = split(col("t"), "\\s+")
        val nTok = size(toks)
        val nBi = greatest(nTok - 1, lit(0))
        val nDist = when(nTok >= 2, size(graft.expressions.TextHashExprs.shingleSet(toks, 2))).otherwise(lit(0))
        reps.select(
          col("gid"),
          nTok.as("n_tokens"),
          when(nBi > 0, (nBi - nDist).cast("double") / nBi).otherwise(lit(0.0)).as("dup_fraction"))
      }
    val metrics = d.select(col("doc_id"), col("lang")).join(textMetrics, "doc_id")

    val clusters = Dedup
      .nearDupComponents(d, idCol = "doc_id", textCol = "text", k = 3, numHashes = 8, bands = 4,
        dedupFirst = graft.operators.TextGroups.adaptiveStaging(d, col("text")))
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))

    val kept = metrics
      .join(clusters, Seq("doc_id"), "left_outer")
      .filter(
        col("dup_fraction") < 0.6 && col("n_tokens") >= 20 &&
          (col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      )

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    kept
      .select(col("doc_id"), col("lang"), row_number().over(w).as("rk"))
      .filter(col("rk") <= 10)
      .orderBy("lang", "rk")
  }

  val q64Sql: String =
    s"""WITH RECURSIVE $ccClustersCte,
      |metrics AS (
      |  SELECT doc_id, lang,
      |    CAST(LEN(toks) AS INTEGER) AS n_tokens,
      |    CASE WHEN LEN(toks) >= 2 AND LEN(toks) - 1 > 0
      |         THEN CAST((LEN(toks) - 1) - LEN(list_distinct(list_transform(range(0, LEN(toks) - 1),
      |                i -> toks[i+1] || ' ' || toks[i+2]))) AS DOUBLE) / (LEN(toks) - 1)
      |         ELSE 0.0 END AS dup_fraction
      |  FROM (SELECT doc_id, lang, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
      |        FROM documents) x),
      |kept AS (
      |  SELECT m.doc_id, m.lang
      |  FROM metrics m LEFT JOIN clusters c ON m.doc_id = c.doc_id
      |  WHERE m.dup_fraction < 0.6 AND m.n_tokens >= 20
      |    AND (c.cluster_id IS NULL OR c.cluster_id = m.doc_id)),
      |ranked AS (
      |  SELECT doc_id, lang,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
      |  FROM kept)
      |SELECT doc_id, lang, rk FROM ranked WHERE rk <= 10
      |ORDER BY lang, rk""".stripMargin

  // ---- q65: decontamination (train/benchmark n-gram overlap) ----------------------
  // Flag corpus docs sharing >= 10% of their 3-gram shingles with a
  // held-out set (here: the French docs stand in for the benchmark).
  // Scale shape: the benchmark's DISTINCT shingle set is the small side
  // (broadcast); the corpus side explodes shingles map-side, joins, and
  // re-aggregates per doc — no corpus self-join, no cross product.
  def q65Decontamination(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val bench = d
      .filter(col("lang") === "fr")
      .select(explode(graft.expressions.TextHashExprs.shingleSet(Dedup.tokens(col("text")), 3)).as("s"))
      .distinct()
    // Memoized by distinct text (TextGroups): per-doc overlap against
    // the broadcast benchmark set is a pure function of the text.
    graft.operators.TextGroups
      .perDoc(d.filter(col("lang") =!= "fr"), "doc_id", lower(trim(col("text")))) { reps =>
        val sh = reps.select(
          col("gid"),
          graft.expressions.TextHashExprs.shingleSet(split(col("t"), "\\s+"), 3).as("sh"))
        val overlap = sh
          .select(col("gid"), explode(col("sh")).as("s"))
          .join(broadcast(bench), "s")
          .groupBy(col("gid"))
          .agg(count(lit(1)).as("n_overlap"))
        sh
          .select(col("gid"), size(col("sh")).as("n_shingles"))
          // <3-token docs have an empty shingle set: without this guard
          // overlap_frac is 0/0 (NULL here, NaN under DuckDB's IEEE
          // division, which sorts ABOVE the threshold) — same guard q80
          // applies on both sides.
          .filter(col("n_shingles") > 0)
          .join(overlap, Seq("gid"), "left_outer")
          .select(
            col("gid"),
            col("n_shingles"),
            coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
            (coalesce(col("n_overlap"), lit(0L)).cast("double") / col("n_shingles")).as("overlap_frac")
          )
          .filter(col("overlap_frac") >= 0.1)
      }
      .orderBy("doc_id")
  }

  val q65Sql: String =
    """WITH d AS (SELECT doc_id, lang, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks FROM documents),
      |sh AS (SELECT doc_id, lang,
      |         CASE WHEN LEN(toks) >= 3
      |              THEN list_distinct(list_transform(range(0, LEN(toks) - 2),
      |                     i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
      |              ELSE [] END AS sh
      |       FROM d),
      |bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE lang = 'fr'),
      |corp AS (SELECT doc_id, sh FROM sh WHERE lang <> 'fr'),
      |ce AS (SELECT doc_id, unnest(sh) AS s FROM corp),
      |m AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
      |      FROM ce JOIN bench USING (s) GROUP BY doc_id)
      |SELECT c.doc_id,
      |  CAST(LEN(c.sh) AS INTEGER) AS n_shingles,
      |  COALESCE(m.n_overlap, 0) AS n_overlap,
      |  CAST(COALESCE(m.n_overlap, 0) AS DOUBLE) / LEN(c.sh) AS overlap_frac
      |FROM corp c LEFT JOIN m USING (doc_id)
      |WHERE LEN(c.sh) > 0
      |  AND CAST(COALESCE(m.n_overlap, 0) AS DOUBLE) / LEN(c.sh) >= 0.1
      |ORDER BY doc_id""".stripMargin

  // ---- q80: bloom-filter decontamination (bounded-memory q65) ---------------------
  // q65 broadcasts the benchmark's exact shingle set — at 100 TB that
  // set is itself huge. The bounded alternative: a 65536-bit bloom
  // filter (2 md5-derived positions per shingle) built from the
  // benchmark, stored as a DISTINCT-positions table (≤ 65536 rows no
  // matter how big the benchmark grows), and corpus shingles tested by
  // two successive semi-joins against it. Positions come from disjoint
  // 60-bit md5 slices, so the filter AND its false positives are
  // engine-identical — the approximation itself is oracle-checked.
  def q80BloomDecontamination(s: SparkSession, dir: String): DataFrame = {
    val m = 65536
    // Kernel positions: one digest-to-long call instead of
    // md5 → hex string → substr → conv parse (equality with the conv
    // form is property-tested; the DuckDB oracle keeps that form).
    def p1(c: org.apache.spark.sql.Column) = graft.expressions.TextHashExprs.md5Slice60(c, 0) % m
    def p2(c: org.apache.spark.sql.Column) = graft.expressions.TextHashExprs.md5Slice60(c, 15) % m
    val d = docs(s, dir)
    val benchBits = d
      .filter(col("lang") === "fr")
      .select(explode(graft.expressions.TextHashExprs.shingleSet(Dedup.tokens(col("text")), 3)).as("s"))
      .select(explode(array(p1(col("s")), p2(col("s")))).as("bit"))
      .distinct()
    // Memoized by distinct text (TextGroups): the bloom probes are a
    // pure function of the text against the broadcast bit set.
    graft.operators.TextGroups
      .perDoc(d.filter(col("lang") =!= "fr"), "doc_id", lower(trim(col("text")))) { reps =>
        val sh = reps.select(
          col("gid"),
          graft.expressions.TextHashExprs.shingleSet(split(col("t"), "\\s+"), 3).as("sh"))
        val hits = sh
          .select(col("gid"), explode(col("sh")).as("s"))
          .select(col("gid"), p1(col("s")).as("b1"), p2(col("s")).as("b2"))
          .join(broadcast(benchBits.select(col("bit").as("b1"))), Seq("b1"), "left_semi")
          .join(broadcast(benchBits.select(col("bit").as("b2"))), Seq("b2"), "left_semi")
          .groupBy(col("gid"))
          .agg(count(lit(1)).as("n_hits"))
        sh
          .select(col("gid"), size(col("sh")).as("n_shingles"))
          .filter(col("n_shingles") > 0)
          .join(hits, Seq("gid"), "left_outer")
          .select(
            col("gid"),
            col("n_shingles"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            (coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_shingles")).as("hit_frac")
          )
          .filter(col("hit_frac") >= 0.1)
      }
      .orderBy("doc_id")
  }

  val q80Sql: String =
    """WITH d AS (SELECT doc_id, lang, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks FROM documents),
      |sh AS (SELECT doc_id, lang,
      |         CASE WHEN LEN(toks) >= 3
      |              THEN list_distinct(list_transform(range(0, LEN(toks) - 2),
      |                     i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
      |              ELSE [] END AS sh
      |       FROM d),
      |be AS (SELECT unnest(sh) AS s FROM sh WHERE lang = 'fr'),
      |bbits AS (
      |  SELECT DISTINCT unnest([
      |    list_reduce(list_transform(range(1, 16),
      |      ii -> CAST(strpos('0123456789abcdef', substr(md5(s), ii, 1)) - 1 AS BIGINT)),
      |      (a, x) -> a * 16 + x) % 65536,
      |    list_reduce(list_transform(range(16, 31),
      |      ii -> CAST(strpos('0123456789abcdef', substr(md5(s), ii, 1)) - 1 AS BIGINT)),
      |      (a, x) -> a * 16 + x) % 65536]) AS bit
      |  FROM be),
      |ce AS (SELECT doc_id,
      |         list_reduce(list_transform(range(1, 16),
      |           ii -> CAST(strpos('0123456789abcdef', substr(md5(s), ii, 1)) - 1 AS BIGINT)),
      |           (a, x) -> a * 16 + x) % 65536 AS b1,
      |         list_reduce(list_transform(range(16, 31),
      |           ii -> CAST(strpos('0123456789abcdef', substr(md5(s), ii, 1)) - 1 AS BIGINT)),
      |           (a, x) -> a * 16 + x) % 65536 AS b2
      |       FROM (SELECT doc_id, unnest(sh) AS s FROM sh WHERE lang <> 'fr')),
      |m AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
      |      FROM ce
      |      WHERE b1 IN (SELECT bit FROM bbits) AND b2 IN (SELECT bit FROM bbits)
      |      GROUP BY doc_id)
      |SELECT c.doc_id,
      |  CAST(LEN(c.sh) AS INTEGER) AS n_shingles,
      |  COALESCE(m.n_hits, 0) AS n_hits,
      |  CAST(COALESCE(m.n_hits, 0) AS DOUBLE) / LEN(c.sh) AS hit_frac
      |FROM (SELECT doc_id, sh FROM sh WHERE lang <> 'fr' AND LEN(sh) > 0) c
      |LEFT JOIN m USING (doc_id)
      |WHERE CAST(COALESCE(m.n_hits, 0) AS DOUBLE) / LEN(c.sh) >= 0.1
      |ORDER BY doc_id""".stripMargin

  // ---- q99: DSIR-style importance-weighted data selection ---------------------
  // Xie et al. 2023 (arXiv:2302.03169): hashed-ngram importance weights
  // against a target domain (source = 'src0' stands in for "the
  // high-quality domain"), then keep the 100 most target-like docs.
  // All-integer scoring (graft.operators.ImportanceWeights): the
  // per-bucket likelihood-ratio score is a fixed-point integer and the
  // per-doc weight a decimal-exact sum, so weights AND the selection
  // hash-compare against DuckDB. Shape: 256-row model broadcast,
  // map-side scoring, TakeOrdered top-N — no global sort, no
  // driver-side loop.
  def q99DsirSelect(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val perDoc = graft.operators.ImportanceWeights
      // fused fit+score: ONE gram pass over the corpus (spec-pinned
      // identical to the modular bucketScores->score composition)
      .fitScore(d, col("doc_id"), col("text"), col("source") === "src0", buckets = 256)
      // micro-unit weights stay far inside BIGINT at any catalog sf
      // (the operator's decimal(38,0) is the no-overflow general form;
      // narrowing here gives the oracle a clean int64 = int64 schema)
      .withColumn("w_units", col("w_units").cast("long"))
      // tiny (one row per doc); both the top-N and the flag join read it
      .pinned
    val top = perDoc
      .orderBy(col("w_units").desc, col("id"))
      .limit(100)
      .select(col("id").as("_sel"))
    perDoc
      .join(top, col("id") === col("_sel"), "left_outer")
      .select(
        col("id").as("doc_id"),
        col("n_grams"),
        col("w_units"),
        col("_sel").isNotNull.as("selected"))
      .orderBy("doc_id")
  }

  val q99Sql: String =
    """WITH tk AS (SELECT doc_id, source, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
      |            FROM documents),
      |g0 AS (SELECT doc_id, source,
      |         unnest(list_concat(toks,
      |           list_transform(range(0, LEN(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2]))) AS gram
      |       FROM tk),
      |g AS (SELECT doc_id, source, substr(md5(gram), 1, 2) AS bucket FROM g0),
      |pb AS (SELECT bucket,
      |         CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS HUGEINT) AS ct,
      |         CAST(COUNT(*) AS HUGEINT) AS cr
      |       FROM g GROUP BY bucket),
      |tot AS (SELECT SUM(ct) AS tot_t, SUM(cr) AS tot_r FROM pb),
      |sc AS (SELECT bucket,
      |         (2 * (ct + 1) * (tot_r + 256) * 1000000 + (cr + 1) * (tot_t + 256))
      |           // (2 * (cr + 1) * (tot_t + 256)) AS units
      |       FROM pb CROSS JOIN tot),
      |dc AS (SELECT doc_id, bucket, CAST(COUNT(*) AS HUGEINT) AS cnt FROM g GROUP BY doc_id, bucket),
      |pd AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
      |              CAST(SUM(CAST(cnt * units AS DECIMAL(28,0))) AS BIGINT) AS w_units
      |       FROM dc JOIN sc USING (bucket) GROUP BY doc_id),
      |top AS (SELECT doc_id FROM pd ORDER BY w_units DESC, doc_id LIMIT 100)
      |SELECT pd.doc_id, n_grams, w_units, top.doc_id IS NOT NULL AS selected
      |FROM pd LEFT JOIN top ON pd.doc_id = top.doc_id
      |ORDER BY pd.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q99_dsir_select" -> (q99DsirSelect _),
    "q80_bloom_decontamination" -> (q80BloomDecontamination _),
    "q65_decontamination" -> (q65Decontamination _),
    "q64_curation" -> (q64Curation _),
    "q124_canonical_select" -> (q124CanonicalSelect _),
    "q35_minhash_lsh" -> (q35MinhashLsh _),
    "q94_incremental_neardup" -> (q94IncrementalNeardup _),
    "q96_staged_neardup" -> (q96StagedNeardup _),
    "q126_staged_ingest_replay" -> (q126StagedIngestReplay _),
    "q36_simhash" -> (q36Simhash _),
    "q37_winnow" -> (q37Winnow _),
    "q38_lang_id" -> (q38LangId _),
    "q39_fingerprints" -> (q39Fingerprints _),
    "q51_neardup_clusters" -> (q51NearDupClusters _)
  )

  val oracles: Map[String, String] = Map(
    "q99_dsir_select" -> q99Sql,
    "q80_bloom_decontamination" -> q80Sql,
    "q65_decontamination" -> q65Sql,
    "q64_curation" -> q64Sql,
    "q124_canonical_select" -> q124Sql,
    "q35_minhash_lsh" -> q35Sql,
    "q94_incremental_neardup" -> q94Sql,
    "q96_staged_neardup" -> q94Sql, // bit-identical to q94 by design
    "q126_staged_ingest_replay" -> q126Sql,
    "q36_simhash" -> q36Sql,
    "q37_winnow" -> q37Sql,
    "q38_lang_id" -> q38Sql,
    "q39_fingerprints" -> q39Sql,
    "q51_neardup_clusters" -> q51Sql
  )
}
