package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Pinned.PinOps

/** Near-duplicate detection for large text corpora: MinHash + LSH,
  * SimHash, n-gram Jaccard, and winnowing fingerprints.
  *
  * Everything is built from codegen'd Catalyst expressions (array
  * higher-order functions over md5) — no UDFs, no driver-side loops —
  * and all hashing is engine-portable (md5 of UTF-8 text, compared
  * lexicographically), so every stage can be verified against an
  * external SQL oracle bit-for-bit.
  *
  * Scale design (the point of the exercise):
  *   - signatures are one narrow projection per doc — map-side only;
  *   - LSH banding turns the O(n²) pair space into groupBy(band, hash)
  *     buckets — one shuffle of (doc_id, band_hash), pairs only form
  *     inside buckets (standard MinHash-LSH, Broder '97 / MMDS ch.3);
  *   - the verify stage joins candidate pairs back to shingle sets —
  *     two hash joins, each a fraction of the corpus.
  *
  * go-fish has no dedup surface at all (SURVEY §2.8); this is part of
  * the training-data-pipeline extension mandated by the build brief.
  */
object Dedup {

  /** Whitespace tokens of normalized text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Ordered k-gram shingles (with duplicates — winnowing needs order). */
  def orderedShingles(toks: Column, k: Int): Column =
    when(
      size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k), i => array_join(slice(toks, i + 1, lit(k)), " "))
    ).otherwise(array().cast("array<string>"))

  /** Distinct k-gram shingle set (the MinHash/Jaccard universe). */
  def shingles(toks: Column, k: Int): Column = array_distinct(orderedShingles(toks, k))

  /** Prime modulus for the universal-hash family (largest prime < 2^30,
    * so a*x+b stays well under 2^63 on any engine).
    */
  val HashP: Long = 1073741789L

  /** Base shingle hash: the first 15 hex digits of md5 (60 bits) reduced
    * mod [[HashP]]. ONE md5 per shingle — the `n` MinHash functions are
    * then derived with cheap integer arithmetic ([[minhashSignature]]),
    * the classic universal-hashing construction (h_i = a_i·x+b_i mod p).
    * Engine-portable: md5 + hex→int + mod exist everywhere.
    */
  def baseHashes(shingleSet: Column): Column =
    transform(shingleSet, s => conv(md5(s).substr(1, 15), 16, 10).cast("long") % HashP)

  /** MinHash signature over pre-computed base hashes: element i is
    * min over shingles of (a_i·x + b_i) mod p with a_i = 2i+1 (odd),
    * b_i = i² + i + 7 — fixed, engine-portable constants.
    *
    * IMPORTANT: materialize `baseHashes` in its own projection (its own
    * `select`) before calling this, or Catalyst's CollapseProject will
    * inline the md5 pass once per hash function.
    */
  def minhashSignature(baseHashCol: Column, n: Int): Column =
    transform(
      sequence(lit(0), lit(n - 1)),
      i => array_min(transform(baseHashCol, x => ((lit(2L) * i + 1) * x + (i * i + i + 7)) % HashP))
    )

  /** LSH band hashes: split the signature into `bands` equal bands and
    * hash each band; docs sharing any (band_index, band_hash) become
    * candidate pairs. rows = signature length / bands.
    */
  def bandHashes(signature: Column, bands: Int, rows: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b =>
        md5(
          concat(
            b.cast("string"),
            lit("|"),
            array_join(transform(slice(signature, b * rows + 1, lit(rows)), _.cast("string")), ",")
          )
        )
    )

  /** Docs → (id, band, band_hash) long form, one row per band — the
    * shuffle-side of LSH bucketing.
    */
  def explodeBands(df: DataFrame, idCol: String, textCol: String, k: Int, numHashes: Int, bands: Int): DataFrame = {
    // Kernel expressions (graft.expressions, codegen'd single-call-per-row)
    // compute the same values as the declarative shingles/baseHashes/
    // minhashSignature composition — equality is property-tested.
    // Docs with no shingles have no signature (min of an empty set) and
    // must not bucket together — drop them before banding.
    // fanOut: the shingle+minhash kernels (one md5 per shingle) are the
    // LSH family's per-row hot stage — floor the scan's parallelism
    // (identity when the input is already parallel; round 15).
    TextGroups.fanOut(df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol), graft.expressions.TextHashExprs.shingleSet(tokens(col(textCol)), k).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .select(
        col(idCol),
        posexplode(
          bandHashes(graft.expressions.TextHashExprs.minhashSig(col("_sh"), numHashes), bands, numHashes / bands)
        ).as(Seq("band", "band_hash"))
      )
  }

  /** Candidate pairs (id1 < id2) from LSH bucket collisions.
    *
    * Shape matters here: a naive self-join of the bands relation would
    * execute the whole signature pipeline twice (Spark only reuses
    * common subplans across join sides at identical exchanges, which
    * aliasing defeats). Instead, ONE shuffle groups ids per (band,
    * band_hash) bucket and pairs are exploded from each bucket's sorted
    * id list — signatures are computed exactly once, and the output is
    * identical to the join form.
    *
    * `maxBucketSize` is the standard LSH skew guard for corpus scale: a
    * bucket of b ids emits b·(b−1)/2 pairs, so one degenerate bucket
    * (empty docs, boilerplate) can emit quadratically many pairs. Docs
    * in an over-limit bucket are near-identical to thousands of others
    * and will still pair in their other bands. Default keeps every
    * bucket (exact LSH semantics — what the oracle checks).
    */
  def candidatePairs(bandsDf: DataFrame, idCol: String, maxBucketSize: Int = Int.MaxValue): DataFrame =
    bandsDf
      .groupBy(col("band"), col("band_hash"))
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)
      .select(
        explode(
          flatten(
            transform(
              col("ids"),
              (x, i) => transform(slice(col("ids"), i + 2, size(col("ids"))), y => array(x, y))
            )
          )
        ).as("p")
      )
      .select(element_at(col("p"), 1).as("id1"), element_at(col("p"), 2).as("id2"))
      .distinct()

  /** Incremental candidate pairs: LSH bucket collisions restricted to
    * pairs with at least one NEW side — the daily-ingestion form of
    * [[candidatePairs]]. `bandsDf` must carry a boolean `newCol`
    * alongside the id.
    *
    * The point at corpus scale: when a batch of b new docs lands on a
    * corpus of N docs, re-running full LSH pairs the corpus against
    * itself — O(N²/buckets) pairs that were already known. Here each
    * bucket splits into its new and old members and emits only
    * new×new (i<j) and new×old pairs, so the output (and the explode
    * work) is proportional to the NEW batch's collisions; buckets with
    * no new member are dropped before any pair forms. The old side's
    * band rows are recomputed in this offline form, but in production
    * they come from a staging table written once at ingest (SCALE.md) —
    * the relation shape here is exactly that table's.
    */
  def incrementalCandidatePairs(
      bandsDf: DataFrame,
      idCol: String,
      newCol: String,
      maxBucketSize: Int = Int.MaxValue
  ): DataFrame = {
    def pair(a: Column, b: Column, aNew: Boolean, bNew: Boolean): Column =
      struct(
        a.getField("i").as("id1"),
        b.getField("i").as("id2"),
        lit(aNew).as("new1"),
        lit(bNew).as("new2")
      )
    bandsDf
      .groupBy(col("band"), col("band_hash"))
      // struct sorts by its first field, so the id order of candidatePairs
      // is preserved and i<j slices stay id-ordered. The flag coalesces
      // null→old HERE, not just in the incrementalNearDups wrapper: a
      // null flag would fail BOTH bucket-slice predicates below and
      // silently unpair the doc.
      .agg(
        sort_array(collect_set(struct(col(idCol).as("i"), coalesce(col(newCol), lit(false)).as("n"))))
          .as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)
      .select(
        filter(col("ids"), x => x.getField("n")).as("nw"),
        filter(col("ids"), x => !x.getField("n")).as("ol")
      )
      .filter(size(col("nw")) > 0)
      .select(
        explode(
          concat(
            // new × new: both sorted, emit i<j
            flatten(
              transform(
                col("nw"),
                (x, i) => transform(slice(col("nw"), i + 2, size(col("nw"))), y => pair(x, y, aNew = true, bNew = true))
              )
            ),
            // new × old: exactly |new|·|old| pairs, ordered by id per pair —
            // the old×old quadratic term never materializes
            flatten(
              transform(
                col("nw"),
                x =>
                  transform(
                    col("ol"),
                    y =>
                      when(x.getField("i") < y.getField("i"), pair(x, y, aNew = true, bNew = false))
                        .otherwise(pair(y, x, aNew = false, bNew = true))
                  )
              )
            )
          )
        ).as("p")
      )
      .select(col("p.id1"), col("p.id2"), col("p.new1"), col("p.new2"))
      .distinct()
  }

  /** Incremental MinHash-LSH near-dup: near-duplicate pairs of a NEW
    * document batch against the existing corpus (and within the batch),
    * with exact Jaccard verification — [[minhashNearDups]] restricted so
    * old-vs-old pairs are never generated. `isNew` is a boolean column
    * expression (e.g. `col("source") === "src0"` or an ingest-date
    * predicate); a NULL flag means OLD (coalesced to false — a doc of
    * unknown provenance must not be silently unpaired, which is what a
    * null would otherwise do to both bucket sides).
    *
    * Output: (id1, id2, new1, new2, jaccard), id1 < id2, at least one
    * side new. Identical to filtering the full pair set on the new flag
    * (DedupSpec pins the property) at a fraction of the cost.
    *
    * `verifyCandidatesOnly` restricts the verify-join shingle relation
    * to candidate ids first (same knob and trade-off as
    * [[minhashNearDups]]): at the design point — a small batch against
    * a huge corpus — the candidate neighborhood is a fraction of the
    * corpus and this saves two full-corpus shingle passes; on small
    * corpora the extra candidate-id job costs more than it saves, so it
    * is opt-in. (In production the corpus side's shingles and band rows
    * come from an ingest-time staging table either way.)
    *
    * `dedupFirst` composes the incremental restriction with the
    * exact-dedup-first staging of [[minhashNearDups]]: the LSH pipeline
    * runs over DISTINCT texts (grouping rule owned by
    * [[TextGroups.prelude]]), a text group counting as NEW if ANY of
    * its docs is new (so every group a new doc touches pairs), and doc
    * pairs expand from group pairs with per-doc flags, keeping only
    * pairs with a new side. Output-identical to the direct form
    * (identical texts share signatures, so a cross-group doc pair
    * collides iff its rep pair does, and within-group pairs of
    * shingle-eligible text always collide at Jaccard 1.0 — DedupSpec
    * pins the equality); on a duplicate-heavy corpus every stage
    * shrinks by the duplication factor (the sf1 soak: 12.2 s → see
    * SCALE.md).
    *
    * `dedupFirst` rejects a finite `maxBucketSize`: under staging the
    * cap would count buckets in distinct TEXTS while the direct form
    * counts DOCS (and within-group pairs would bypass it entirely), so
    * the two forms would diverge exactly where the guard matters. Pair
    * output over massive duplicate groups is inherently quadratic —
    * cap-style damping belongs to the direct form; at that scale the
    * cluster form ([[nearDupComponents]]) is the right output shape.
    */
  def incrementalNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isNew: Column,
      k: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.0,
      maxBucketSize: Int = Int.MaxValue,
      verifyCandidatesOnly: Boolean = false,
      dedupFirst: Boolean = false
  ): DataFrame = {
    if (dedupFirst) {
      require(
        maxBucketSize == Int.MaxValue,
        "dedupFirst counts buckets in distinct texts, not docs, and within-group pairs bypass " +
          "the cap — a finite maxBucketSize would silently diverge from the direct form. " +
          "Use the direct form for cap damping, or nearDupComponents for massive duplicate groups."
      )
      val internal = Seq("gid", "mid", "t", "_new", "_anyNew")
      require(
        !internal.contains(idCol) && !internal.contains(textCol),
        s"idCol/textCol must not be one of ${internal.mkString(", ")} (internal staging names)"
      )
      // Eligibility (token count >= k) is a function of the text, so
      // filtering before grouping leaves groups/gids unchanged while
      // every downstream stage carries only docs that can ever pair.
      // The grouping rule (rep = min id per distinct text) is owned by
      // TextGroups.prelude; flags rejoin by id, group-any-new by gid.
      val flagged = df
        .select(col(idCol), col(textCol), coalesce(isNew.cast("boolean"), lit(false)).as("_new"))
        .filter(size(tokens(col(textCol))) >= k)
      val (members0, reps0) = TextGroups.prelude(flagged, idCol, col(textCol))
      val memberFlags = members0.join(flagged.select(col(idCol), col("_new")), idCol)
      val groupNew = memberFlags.groupBy("gid").agg(max(col("_new")).as("_anyNew"))
      val reps = reps0
        .join(groupNew, "gid")
        .select(col("gid").as(idCol), col("t").as(textCol), col("_anyNew"))
      val members = memberFlags.select(col("gid"), col(idCol).as("mid"), col("_new").as("mNew"))
      // Rep-level incremental pairing (rep flag = group-any-new). A doc
      // pair with a new side lives in a group pair with a new side, so
      // no rep pair is missed; rep-level new1/new2 are group flags and
      // are recomputed per doc below. Barrier: one row per colliding
      // text pair — stops Catalyst re-running the Jaccard projection
      // once per expanded DOC pair (the minhashNearDups idiom).
      val repPairs = incrementalNearDups(
        reps, idCol, textCol, col("_anyNew"), k, numHashes, bands, threshold,
        maxBucketSize, verifyCandidatesOnly, dedupFirst = false)
        .pinned
      val cross = repPairs
        .join(members.select(col("gid").as("g1"), col("mid").as("a"), col("mNew").as("an")), col("id1") === col("g1"))
        .join(members.select(col("gid").as("g2"), col("mid").as("b"), col("mNew").as("bn")), col("id2") === col("g2"))
        .filter(col("an") || col("bn"))
        .select(
          least(col("a"), col("b")).as("id1"),
          greatest(col("a"), col("b")).as("id2"),
          when(col("a") < col("b"), col("an")).otherwise(col("bn")).as("new1"),
          when(col("a") < col("b"), col("bn")).otherwise(col("an")).as("new2"),
          col("jaccard")
        )
      // Within-group pairs: identical eligible texts always collide at
      // Jaccard exactly 1.0; keep only new-involving ones.
      val within = members.as("x")
        .join(members.as("y"), col("x.gid") === col("y.gid") && col("x.mid") < col("y.mid"))
        .filter(col("x.mNew") || col("y.mNew"))
        .select(
          col("x.mid").as("id1"),
          col("y.mid").as("id2"),
          col("x.mNew").as("new1"),
          col("y.mNew").as("new2"),
          lit(1.0).as("jaccard")
        )
        .filter(col("jaccard") >= threshold)
      return cross.unionByName(within)
    }
    val sh = df
      .select(
        col(idCol),
        coalesce(isNew.cast("boolean"), lit(false)).as("_new"),
        graft.expressions.TextHashExprs.shingleSet(tokens(col(textCol)), k).as("sh")
      )
      .filter(size(col("sh")) > 0)
    val bandsDf = sh
      .select(
        col(idCol),
        col("_new"),
        posexplode(
          bandHashes(graft.expressions.TextHashExprs.minhashSig(col("sh"), numHashes), bands, numHashes / bands)
        ).as(Seq("band", "band_hash"))
      )
    val pairsPlain = incrementalCandidatePairs(bandsDf, idCol, "_new", maxBucketSize)
    // localCheckpoint when the pairs feed three consumers (the id filter
    // + both verify joins), exactly as in minhashNearDups.
    val pairs = if (verifyCandidatesOnly) pairsPlain.pinned else pairsPlain
    val verifySh =
      if (verifyCandidatesOnly) {
        val candidateIds = pairs
          .select(explode(array(col("id1"), col("id2"))).as(idCol))
          .distinct()
        df.join(candidateIds, idCol)
          .select(col(idCol), graft.expressions.TextHashExprs.shingleSet(tokens(col(textCol)), k).as("sh"))
      } else sh.select(col(idCol), col("sh"))
    pairs
      .join(verifySh.select(col(idCol).as("id1"), col("sh").as("sh1")), "id1")
      .join(verifySh.select(col(idCol).as("id2"), col("sh").as("sh2")), "id2")
      .select(col("id1"), col("id2"), col("new1"), col("new2"), jaccard(col("sh1"), col("sh2")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Ingest-time staging relations for a document batch — the rows
    * [[incrementalNearDups]] recomputes for the OLD side on every run,
    * computed ONCE when the documents first arrive:
    *
    *   - bands:    (idCol, band, band_hash) — the LSH bucket relation
    *   - shingles: (idCol, sh)              — the exact-verify relation
    *
    * Append both to per-corpus staging tables at ingest (partition by
    * ingest date; bucket the bands table by band_hash to co-locate the
    * incremental join). Docs with fewer than k tokens have no shingles
    * and are absent from both — they can never pair.
    *
    * The (k, numHashes, bands) parameters are part of the staged
    * data's identity: rows staged under different parameters must
    * never mix (hashes would be incomparable). They are therefore
    * STAMPED into the output schema as column metadata on `band_hash`
    * and `sh` — parquet preserves it end-to-end, and
    * [[incrementalNearDupsStaged]] refuses a staged table whose stamp
    * does not match the query's parameters (conf drift between ingest
    * and query would otherwise yield silently wrong/missing pairs).
    */
  def stageNearDup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4
  ): (DataFrame, DataFrame) = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.lsh.k", k.toLong)
      .putLong("graft.lsh.numHashes", numHashes.toLong)
      .putLong("graft.lsh.bands", bands.toLong)
      .build()
    val sh = df
      .select(
        col(idCol),
        graft.expressions.TextHashExprs.shingleSet(tokens(col(textCol)), k).as("sh", meta))
      .filter(size(col("sh")) > 0)
    val bandsDf = sh.select(
      col(idCol),
      posexplode(
        bandHashes(graft.expressions.TextHashExprs.minhashSig(col("sh"), numHashes), bands, numHashes / bands)
      ).as(Seq("band", "band_hash"))
    )
    (
      bandsDf.withColumn("band_hash", col("band_hash").as("band_hash", meta)),
      sh
    )
  }

  /** Fail loudly when a staged relation's parameter stamp disagrees
    * with the querying parameters. Relations without a stamp (staged
    * by something other than [[stageNearDup]]) pass — the parameter
    * match is then the caller's documented obligation.
    */
  private def assertStagedParams(
      df: DataFrame,
      colName: String,
      k: Int,
      numHashes: Int,
      bands: Int
  ): Unit =
    df.schema.find(_.name == colName).map(_.metadata).foreach { m =>
      if (m.contains("graft.lsh.k")) {
        val staged =
          (m.getLong("graft.lsh.k"), m.getLong("graft.lsh.numHashes"), m.getLong("graft.lsh.bands"))
        require(
          staged == ((k.toLong, numHashes.toLong, bands.toLong)),
          s"staged table was built with (k, numHashes, bands)=$staged but this query uses " +
            s"($k, $numHashes, $bands) — band hashes and jaccards would be incomparable"
        )
      }
    }

  /** Incremental near-dup of a NEW batch against a PREVIOUSLY STAGED
    * corpus — the production form of [[incrementalNearDups]], where
    * the corpus side's band rows and shingle sets come from
    * [[stageNearDup]] output written at ingest instead of being
    * recomputed from raw text. Only the batch's own staging rows are
    * computed here (and returned, so the caller appends them to the
    * staging tables after consuming the pairs — making the next day's
    * run incremental over today's).
    *
    * Output pairs: (id1, id2, new1, new2, jaccard), at least one side
    * in the batch, identical to
    * `incrementalNearDups(corpus ∪ batch, isNew = in-batch, …)`
    * (DedupSpec pins the equality). Batch ids must be disjoint from
    * staged ids — id identity is what makes the old×old restriction
    * sound (enforce upstream; ingest pipelines that re-deliver a doc
    * should exact-dedup first).
    *
    * Scale shape: one narrow map over the batch, one band shuffle of
    * (staged ∪ batch) bucket rows — buckets with no batch member drop
    * before any pair forms — and two verify joins against the
    * pre-materialized shingle relation. Nothing recomputes corpus
    * text; the corpus contributes only its staged bytes.
    */
  def incrementalNearDupsStaged(
      stagedBands: DataFrame,
      stagedShingles: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.0,
      maxBucketSize: Int = Int.MaxValue
  ): (DataFrame, (DataFrame, DataFrame)) = {
    assertStagedParams(stagedBands, "band_hash", k, numHashes, bands)
    assertStagedParams(stagedShingles, "sh", k, numHashes, bands)
    val (batchBands, batchSh) = stageNearDup(batch, idCol, textCol, k, numHashes, bands)
    val allBands = stagedBands
      .select(col(idCol), col("band"), col("band_hash"), lit(false).as("_new"))
      .unionByName(batchBands.select(col(idCol), col("band"), col("band_hash"), lit(true).as("_new")))
    val pairs = incrementalCandidatePairs(allBands, idCol, "_new", maxBucketSize)
    val verifySh = stagedShingles
      .select(col(idCol), col("sh"))
      .unionByName(batchSh.select(col(idCol), col("sh")))
    val verified = pairs
      .join(verifySh.select(col(idCol).as("id1"), col("sh").as("sh1")), "id1")
      .join(verifySh.select(col(idCol).as("id2"), col("sh").as("sh2")), "id2")
      .select(col("id1"), col("id2"), col("new1"), col("new2"), jaccard(col("sh1"), col("sh2")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    (verified, (batchBands, batchSh))
  }

  /** Near-duplicate clusters: ConnectedComponents over the LSH
    * candidate-pair graph, as (id, component) with component = the
    * minimum id in the cluster.
    *
    * `dedupFirst` runs banding + pairing + CC over DISTINCT texts only
    * and expands group labels back to doc ids — output-identical:
    * identical texts always collide (same signatures), so a group's
    * members are pairwise-connected and its representative gid (the
    * group's min id) carries the component. Labels are preserved
    * exactly because CC labels components by min id and the min id of
    * an expanded component IS the min gid of its rep-graph component.
    * Docs appear in the output iff they appear in the direct pair
    * graph: members of a shingle-eligible group of >=2 (they collide
    * within the group), or members of a singleton group whose rep
    * collided with another rep.
    */
  def nearDupComponents(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      numHashes: Int,
      bands: Int,
      dedupFirst: Boolean = false
  ): DataFrame = {
    if (!dedupFirst) {
      val pairs = candidatePairs(explodeBands(df, idCol, textCol, k, numHashes, bands), idCol)
      return graft.operators.ConnectedComponents(pairs, "id1", "id2")
    }
    // Eligibility (token count >= k ⟺ shingle set nonempty) is a
    // function of the text, so filtering BEFORE grouping leaves the
    // groups/gids unchanged while every downstream consumer carries
    // only docs that can ever enter the pair graph.
    val elig = df
      .filter(size(tokens(col(textCol))) >= k)
      .select(col(idCol), col(textCol))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(textCol)
    val withGid = elig.withColumn("gid", min(col(idCol)).over(w))
    val reps = withGid.filter(col(idCol) === col("gid")).select(col("gid").as(idCol), col(textCol))
    val members = withGid.select(col("gid"), col(idCol).as("_mid"))
    val repPairs = candidatePairs(explodeBands(reps, idCol, textCol, k, numHashes, bands), idCol)
    val cc = graft.operators.ConnectedComponents(repPairs, "id1", "id2")
    val eligibleSizes = withGid
      .groupBy("gid")
      .agg(count(lit(1)).as("_gsz"))
    val gidComp = eligibleSizes
      .join(cc.select(col("id").as("gid"), col("component")), Seq("gid"), "left_outer")
      .filter(col("_gsz") >= 2 || col("component").isNotNull)
      .select(col("gid"), coalesce(col("component"), col("gid")).as("component"))
    members
      .join(gidComp, "gid")
      .select(col("_mid").as("id"), col("component"))
  }

  /** Pick the band count for a target Jaccard threshold: with b bands
    * of r = n/b rows, the LSH S-curve crosses ~50% collision chance at
    * J ≈ (1/b)^(1/r) (MMDS ch.3). Returns the divisor of `numHashes`
    * whose threshold is closest to the target — SCALE.md's "banding
    * chosen from the target threshold" knob made executable.
    */
  def chooseBanding(numHashes: Int, targetJaccard: Double): Int = {
    require(numHashes > 0 && targetJaccard > 0 && targetJaccard < 1)
    val divisors = (1 to numHashes).filter(numHashes % _ == 0)
    divisors.minBy { b =>
      val r = numHashes / b
      math.abs(math.pow(1.0 / b, 1.0 / r) - targetJaccard)
    }
  }

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(s1: Column, s2: Column): Column =
    when(
      size(array_union(s1, s2)) > 0,
      size(array_intersect(s1, s2)).cast("double") / size(array_union(s1, s2))
    ).otherwise(lit(0.0))

  /** Full MinHash-LSH near-dup pipeline: candidate pairs with their
    * exact Jaccard, at or above `threshold`. One narrow map stage, one
    * bucket shuffle, two verify joins — no O(n²) stage anywhere.
    */
  def minhashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.0,
      persistShingles: Boolean = true,
      /** Tokenize only candidate docs in the verify stage. Worth it when
        * |candidates| << corpus (the 100 TB regime — saves two full
        * corpus tokenization passes); on small corpora the extra
        * candidate-id broadcast job costs more than it saves (measured
        * +0.9s at sf0.1), so it is opt-in.
        */
      verifyCandidatesOnly: Boolean = false,
      /** Collapse exact-duplicate texts to one representative and run
        * the whole LSH pipeline over DISTINCT texts only, expanding
        * group pairs back to doc pairs at the end. Output-identical to
        * the direct form: identical texts have identical shingle sets,
        * hence identical signatures and band buckets, so (a) every
        * cross-group doc pair collides iff its representative pair
        * collides and shares its exact Jaccard, and (b) every
        * within-group pair (of shingle-eligible text) collides with
        * Jaccard exactly 1.0. Near-dup corpora repeat texts heavily
        * (the sf1 soak holds 4,992 distinct texts across 50k docs), so
        * every stage — shingling, banding, the bucket shuffle, the
        * verify joins — shrinks by the duplication factor; the standard
        * exact-dedup-before-near-dup composition of production
        * pipelines. Costs one extra full-text shuffle (the grouping),
        * so it is opt-in like the other staging knobs.
        */
      dedupFirst: Boolean = false
  ): DataFrame = {
    if (dedupFirst) {
      // Drop shingle-ineligible docs BEFORE grouping: eligibility
      // (token count >= k ⟺ shingle set nonempty) is a function of
      // the text, so every group is all-eligible or all-ineligible and
      // the grouping/gids are unchanged — but the grouping window and
      // both expansion sides now carry only docs that can ever pair.
      val elig = df
        .filter(size(tokens(col(textCol))) >= k)
        .select(col(idCol), col(textCol))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(textCol)
      val withGid = elig.withColumn("gid", min(col(idCol)).over(w))
      val reps = withGid
        .filter(col(idCol) === col("gid"))
        .select(col("gid").as(idCol), col(textCol))
      val members = withGid.select(col("gid"), col(idCol).as("mid"))
      val repPairs = minhashNearDups(
        reps, idCol, textCol, k, numHashes, bands, threshold,
        persistShingles, verifyCandidatesOnly, dedupFirst = false)
        // Barrier: stops Catalyst collapsing the exact-Jaccard
        // projection above the expansion joins (which would re-run the
        // set intersection once per DOC pair instead of once per text
        // pair, and ship both shingle arrays with every expanded row).
        // One row per colliding text pair — tiny.
        .pinned
      val cross = repPairs
        .join(members.select(col("gid").as("g1"), col("mid").as("a")), col("id1") === col("g1"))
        .join(members.select(col("gid").as("g2"), col("mid").as("b")), col("id2") === col("g2"))
        .select(
          least(col("a"), col("b")).as("id1"),
          greatest(col("a"), col("b")).as("id2"),
          col("jaccard"))
      // Within-group pairs: identical eligible texts always collide
      // with Jaccard exactly 1.0.
      val within = members.as("x")
        .join(members.as("y"), col("x.gid") === col("y.gid") && col("x.mid") < col("y.mid"))
        .select(col("x.mid").as("id1"), col("y.mid").as("id2"), lit(1.0).as("jaccard"))
        .filter(col("jaccard") >= threshold)
      return cross.unionByName(within)
    }
    // Shingle sets feed three consumers (banding, both verify sides) —
    // persist so tokenization+shingling runs once. MEMORY_AND_DISK:
    // spills instead of OOMing when the corpus outgrows executor memory.
    // With the codegen'd kernels, recomputing can beat the persist
    // barrier on small corpora — benchmark both on your data.
    val shPlain = df
      .select(col(idCol), graft.expressions.TextHashExprs.shingleSet(tokens(col(textCol)), k).as("sh"))
      .filter(size(col("sh")) > 0)
    val sh =
      if (persistShingles) shPlain.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else shPlain
    val bandsDf = sh
      .select(
        col(idCol),
        posexplode(
          bandHashes(graft.expressions.TextHashExprs.minhashSig(col("sh"), numHashes), bands, numHashes / bands)
        ).as(Seq(
          "band",
          "band_hash"
        ))
      )
    // localCheckpoint when the candidate pairs feed three consumers
    // (the id filter below + both verify joins): the band pipeline +
    // bucket shuffle then run exactly once.
    val pairs =
      if (verifyCandidatesOnly) candidatePairs(bandsDf, idCol).pinned
      else candidatePairs(bandsDf, idCol)
    // Candidate-only verify: the id filter joins the raw corpus BEFORE
    // the shingle projection, so the two verify sides tokenize
    // |candidates| docs, not the corpus twice.
    val verifySh =
      if (verifyCandidatesOnly) {
        val candidateIds = pairs
          .select(explode(array(col("id1"), col("id2"))).as(idCol))
          .distinct()
        // No broadcast hint: a pathological corpus can produce an id set
        // past the broadcast limit — let AQE pick broadcast vs shuffle
        // from the runtime size.
        df.join(candidateIds, idCol)
          .select(col(idCol), graft.expressions.TextHashExprs.shingleSet(tokens(col(textCol)), k).as("sh"))
      } else sh
    pairs
      .join(verifySh.select(col(idCol).as("id1"), col("sh").as("sh1")), "id1")
      .join(verifySh.select(col(idCol).as("id2"), col("sh").as("sh2")), "id2")
      .select(col("id1"), col("id2"), jaccard(col("sh1"), col("sh2")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Per-token md5 array — materialize this in its own projection, then
    * feed [[simhash16FromHashes]], so each token is hashed once instead
    * of once per bit.
    */
  def tokenMd5s(toks: Column): Column = transform(toks, t => md5(t))

  /** 16-bit SimHash over pre-hashed tokens: bit j is set iff the count
    * of tokens whose j-th md5 hex digit has its top bit set exceeds the
    * count of those that don't (Charikar '02, hex-digit form so the
    * same expression runs on any engine with md5 + substring).
    * Tokens carry multiplicity, matching the weighted original.
    */
  def simhash16FromHashes(hs: Column): Column = {
    val bits = transform(
      sequence(lit(0), lit(15)),
      j =>
        when(
          aggregate(
            hs,
            lit(0),
            (acc, h) => acc + when(h.substr(j + 1, lit(1)) >= "8", 1).otherwise(-1)
          ) > 0,
          1
        ).otherwise(0)
    )
    aggregate(zip_with(bits, sequence(lit(0), lit(15)), (b, j) => (b * pow(lit(2.0), j)).cast("int")), lit(0), _ + _)
  }

  /** One-expression convenience form (tests, tiny inputs); production
    * paths should stage [[tokenMd5s]] separately.
    */
  def simhash16(toks: Column): Column = simhash16FromHashes(tokenMd5s(toks))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken '03): hash every
    * ordered k-gram, slide a window of `w` hashes, keep each window's
    * min — the classic local document fingerprint set.
    */
  def winnowFingerprints(toks: Column, k: Int, w: Int): Column = {
    val kh = transform(orderedShingles(toks, k), s => md5(s))
    when(
      size(kh) >= w,
      array_distinct(transform(sequence(lit(0), size(kh) - w), i => array_min(slice(kh, i + 1, lit(w)))))
    ).otherwise(array_distinct(when(size(kh) > 0, array(array_min(kh))).otherwise(array().cast("array<string>"))))
  }
}
