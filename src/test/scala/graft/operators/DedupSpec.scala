package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different text with no overlap at all whatsoever"),
    (4L, "the quick brown fox jumps over the lazy dog") // exact dup of 1
  )

  test("exact duplicates always collide in every LSH band") {
    val df = docs.toDF("doc_id", "text")
    val pairs = Dedup
      .minhashNearDups(df, "doc_id", "text", k = 3, numHashes = 8, bands = 4)
      .as[(Long, Long, Double)]
      .collect()
      .map(p => (p._1, p._2) -> p._3)
      .toMap
    pairs((1L, 4L)) shouldBe 1.0 // identical shingle sets
  }

  test("near-duplicates score high, disjoint docs never pair at threshold 1.0") {
    val df = docs.toDF("doc_id", "text")
    val all = Dedup
      .minhashNearDups(df, "doc_id", "text", k = 3, numHashes = 8, bands = 4)
      .as[(Long, Long, Double)]
      .collect()
    all.find(p => p._1 == 1L && p._2 == 2L).foreach(_._3 should be > 0.5)
    // exact-threshold pipeline keeps only true duplicates
    val exact = Dedup.minhashNearDups(df, "doc_id", "text", 3, 8, 4, threshold = 1.0)
    exact.as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSeq shouldBe Seq((1L, 4L))
  }

  test("candidate-only verify produces identical pairs and scores") {
    val df = docs.toDF("doc_id", "text")
    def sortedPairs(candOnly: Boolean) = Dedup
      .minhashNearDups(df, "doc_id", "text", 3, 8, 4, persistShingles = false,
        verifyCandidatesOnly = candOnly)
      .orderBy("id1", "id2")
      .as[(Long, Long, Double)]
      .collect()
      .toSeq
    sortedPairs(true) shouldBe sortedPairs(false)
  }

  test("dedupFirst produces identical pairs and scores on a duplicate-heavy corpus") {
    // heavy exact duplication + near-dups + shingle-ineligible shorties
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text with no overlap at all whatsoever"),
      (4L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (5L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (6L, "the quick brown fox jumps over the lazy cat"), // dup of 2
      (7L, "too short"), // below shingle k — never pairs
      (8L, "too short"), // exact dup of 7, still never pairs
      (9L, "completely different text with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    def sortedPairs(dedup: Boolean) = Dedup
      .minhashNearDups(corpus, "doc_id", "text", 3, 8, 4, persistShingles = false,
        dedupFirst = dedup)
      .orderBy("id1", "id2")
      .as[(Long, Long, Double)]
      .collect()
      .toSeq
    val direct = sortedPairs(false)
    direct.nonEmpty shouldBe true
    sortedPairs(true) shouldBe direct
  }

  test("incremental near-dup equals the full pair set filtered to new-involving pairs") {
    // mixed corpus: near-dup cluster spanning old+new, old-only dup pair
    // (must NOT appear), new-only pair, shingle-ineligible shorties
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", false),
      (2L, "the quick brown fox jumps over the lazy cat", false),
      (3L, "completely different text with no overlap at all whatsoever", false),
      (4L, "the quick brown fox jumps over the lazy dog", true), // new dup of old 1
      (5L, "completely different text with no overlap at all whatsoever", false), // old-old pair with 3
      (6L, "the quick brown fox jumps over the lazy dog", true), // new dup of 1 and 4
      (7L, "too short", true),
      (8L, "some entirely unrelated words nobody else uses anywhere here", true)
    ).toDF("doc_id", "text", "is_new")
    def incremental(dedup: Boolean) = Dedup
      .incrementalNearDups(corpus, "doc_id", "text", col("is_new"), 3, 8, 4,
        dedupFirst = dedup)
      .orderBy("id1", "id2")
      .as[(Long, Long, Boolean, Boolean, Double)]
      .collect()
      .toSeq
    val incr = incremental(false)
    val newIds = Set(4L, 6L, 7L, 8L)
    val full = Dedup
      .minhashNearDups(corpus.drop("is_new"), "doc_id", "text", 3, 8, 4, persistShingles = false)
      .orderBy("id1", "id2")
      .as[(Long, Long, Double)]
      .collect()
      .toSeq
    val expected = full
      .filter { case (a, b, _) => newIds(a) || newIds(b) }
      .map { case (a, b, j) => (a, b, newIds(a), newIds(b), j) }
    incr shouldBe expected
    // the full set really contains old-old pairs (3,5 are exact dups), so
    // the equality above proves the incremental form dropped them
    full.exists { case (a, b, _) => !newIds(a) && !newIds(b) } shouldBe true
    incr.exists { case (a, b, _, _, _) => (a, b) == (3L, 5L) } shouldBe false
    // dedupFirst staging is output-identical — the corpus has a text
    // group spanning old and new docs (1,4,6) plus old-only and
    // new-only groups, exercising every expansion branch
    incremental(true) shouldBe incr
    // both pair classes are exercised
    incr.exists { case (_, _, n1, n2, _) => n1 && n2 } shouldBe true
    incr.exists { case (_, _, n1, n2, _) => n1 ^ n2 } shouldBe true
    // ...and dedupFirst composes with candidate-only verify
    Dedup
      .incrementalNearDups(corpus, "doc_id", "text", col("is_new"), 3, 8, 4,
        dedupFirst = true, verifyCandidatesOnly = true)
      .orderBy("id1", "id2")
      .as[(Long, Long, Boolean, Boolean, Double)]
      .collect()
      .toSeq shouldBe incr
  }

  test("incremental dedupFirst rejects a finite bucket cap and reserved column names") {
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog", true))
      .toDF("doc_id", "text", "is_new")
    // text-count vs doc-count bucket semantics would silently diverge
    intercept[IllegalArgumentException] {
      Dedup.incrementalNearDups(corpus, "doc_id", "text", col("is_new"), 3, 8, 4,
        maxBucketSize = 100, dedupFirst = true)
    }.getMessage should include("maxBucketSize")
    val renamed = corpus.withColumnRenamed("doc_id", "gid")
    intercept[IllegalArgumentException] {
      Dedup.incrementalNearDups(renamed, "gid", "text", col("is_new"), 3, 8, 4,
        dedupFirst = true)
    }.getMessage should include("gid")
  }

  test("incremental near-dup: null flag means old; candidate-only verify is identical") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", false),
      (2L, "the quick brown fox jumps over the lazy cat", true),
      (3L, "the quick brown fox jumps over the lazy dog", false),
      (4L, "some entirely unrelated words nobody else uses anywhere here", true)
    ).toDF("doc_id", "text", "is_new")
    def run(flag: org.apache.spark.sql.Column, candOnly: Boolean) = Dedup
      .incrementalNearDups(corpus, "doc_id", "text", flag, 3, 8, 4,
        verifyCandidatesOnly = candOnly)
      .orderBy("id1", "id2")
      .as[(Long, Long, Boolean, Boolean, Double)]
      .collect()
      .toSeq
    val base = run(col("is_new"), candOnly = false)
    base.nonEmpty shouldBe true
    // doc 3's flag nulled out: null coalesces to old (false) — its
    // baseline flag — so the result is unchanged, not silently unpaired
    val nulled = when(col("doc_id") === 3L, lit(null).cast("boolean")).otherwise(col("is_new"))
    run(nulled, candOnly = false) shouldBe base
    run(col("is_new"), candOnly = true) shouldBe base
  }

  test("stageNearDup emits the stable staging-table schema (on-disk contract)") {
    // These relations are written to per-corpus parquet tables at
    // ingest and read back across engine versions — the column names
    // and types are a FORMAT, not an implementation detail.
    val d = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val (b, sh) = Dedup.stageNearDup(d, "doc_id", "text", 3, 8, 4)
    b.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq shouldBe
      Seq(("doc_id", "bigint"), ("band", "int"), ("band_hash", "string"))
    sh.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq shouldBe
      Seq(("doc_id", "bigint"), ("sh", "array<string>"))
    // a doc below the shingle width is absent from BOTH relations
    val (b2, sh2) = Dedup.stageNearDup(
      Seq((2L, "too short")).toDF("doc_id", "text"), "doc_id", "text", 3, 8, 4)
    b2.count() shouldBe 0L
    sh2.count() shouldBe 0L
  }

  test("staged incremental near-dup equals the recompute-everything form, day over day") {
    val day0 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs today"),
      (3L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val day1 = Seq(
      (10L, "the quick brown fox jumps over the lazy cat"),
      (11L, "entirely novel words matching nothing else at all")
    ).toDF("doc_id", "text")
    val day2 = Seq(
      (20L, "the quick brown fox jumps over the lazy dog"),
      (21L, "pack my box with five dozen liquor jugs tonight")
    ).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("id1", "id2")
      .as[(Long, Long, Boolean, Boolean, Double)]
      .collect()
      .toSeq

    // Day 1: batch vs staged day-0 corpus == recompute over day0 ∪ day1
    val (b0, s0) = Dedup.stageNearDup(day0, "doc_id", "text", 3, 8, 4)
    val (pairs1, (b1, s1)) =
      Dedup.incrementalNearDupsStaged(b0, s0, day1, "doc_id", "text", 3, 8, 4)
    val ids1 = Set(10L, 11L)
    norm(pairs1) shouldBe norm(
      Dedup.incrementalNearDups(day0.unionByName(day1), "doc_id", "text",
        col("doc_id").isin(ids1.toSeq: _*), 3, 8, 4))

    // Day 2: the appended staging tables make yesterday's batch OLD
    val (pairs2, _) = Dedup.incrementalNearDupsStaged(
      b0.unionByName(b1), s0.unionByName(s1), day2, "doc_id", "text", 3, 8, 4)
    val ids2 = Set(20L, 21L)
    val expected2 = Dedup.incrementalNearDups(
      day0.unionByName(day1).unionByName(day2), "doc_id", "text",
      col("doc_id").isin(ids2.toSeq: _*), 3, 8, 4)
    norm(pairs2) shouldBe norm(expected2)
    // sanity: day-2 exact dup of doc 1/3 pairs against the old corpus
    norm(pairs2).exists { case (a, b, n1, n2, j) => a == 1L && b == 20L && !n1 && n2 && j == 1.0 } shouldBe true
  }

  test("staged incremental near-dup honors threshold and maxBucketSize like the direct form") {
    val old = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "pack my box with five dozen liquor jugs today")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy cat"),
      (11L, "pack my box with five dozen liquor jugs today")
    ).toDF("doc_id", "text")
    val (b, sh) = Dedup.stageNearDup(old, "doc_id", "text", 3, 8, 4)
    def staged(threshold: Double, cap: Int) = Dedup
      .incrementalNearDupsStaged(b, sh, batch, "doc_id", "text", 3, 8, 4, threshold, cap)
      ._1
      .orderBy("id1", "id2")
      .as[(Long, Long, Boolean, Boolean, Double)]
      .collect()
      .toSeq
    def direct(threshold: Double, cap: Int) = Dedup
      .incrementalNearDups(old.unionByName(batch), "doc_id", "text",
        col("doc_id") >= 10L, 3, 8, 4, threshold, cap)
      .orderBy("id1", "id2")
      .as[(Long, Long, Boolean, Boolean, Double)]
      .collect()
      .toSeq
    staged(0.9, Int.MaxValue) shouldBe direct(0.9, Int.MaxValue)
    staged(0.9, Int.MaxValue).map(_._5).foreach(_ should be >= 0.9)
    // a bucket cap of 2 drops the 3-doc dog-text bucket in BOTH forms
    staged(0.0, 2) shouldBe direct(0.0, 2)
    staged(0.0, 2).size should be < staged(0.0, Int.MaxValue).size
  }

  test("staged tables carry their LSH parameter stamp; a mismatched query fails loudly") {
    val old = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val batch = Seq((10L, "the quick brown fox jumps over the lazy cat")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_stamp").toString
    val (b, sh) = Dedup.stageNearDup(old, "doc_id", "text", 3, 8, 4)
    // the stamp survives a parquet round trip (the production path)
    b.write.parquet(s"$dir/bands"); sh.write.parquet(s"$dir/shingles")
    val (rb, rsh) = (spark.read.parquet(s"$dir/bands"), spark.read.parquet(s"$dir/shingles"))
    rb.schema.find(_.name == "band_hash").get.metadata.getLong("graft.lsh.numHashes") shouldBe 8L
    // matching parameters run; any drifted parameter is refused
    Dedup.incrementalNearDupsStaged(rb, rsh, batch, "doc_id", "text", 3, 8, 4)._1.count()
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalNearDupsStaged(rb, rsh, batch, "doc_id", "text", 3, 16, 4)
    }
    e.getMessage should include("incomparable")
    intercept[IllegalArgumentException] {
      Dedup.incrementalNearDupsStaged(rb, rsh, batch, "doc_id", "text", 4, 8, 4)
    }
    // an unstamped relation (external staging) stays a caller obligation
    val bare = rb.select(col("doc_id"), col("band"),
      col("band_hash").as("band_hash", org.apache.spark.sql.types.Metadata.empty))
    Dedup.incrementalNearDupsStaged(bare, rsh, batch, "doc_id", "text", 3, 8, 4)._1.count()
  }

  test("incrementalCandidatePairs coalesces a null flag to old at the kernel level") {
    // Direct call with a synthetic band relation (the production
    // staging table's shape, where the flag column can be nullable).
    // A null flag must behave as OLD inside the kernel itself — not
    // just in the incrementalNearDups wrapper — or a direct caller's
    // doc fails BOTH bucket-slice predicates and silently unpairs.
    val bands = Seq(
      (1L, 0, 42L, Some(true)),
      (2L, 0, 42L, None: Option[Boolean]),
      (3L, 0, 42L, Some(false))
    ).toDF("id", "band", "band_hash", "is_new")
    val pairs = Dedup
      .incrementalCandidatePairs(bands, "id", "is_new")
      .orderBy("id1", "id2")
      .as[(Long, Long, Boolean, Boolean)]
      .collect()
      .toSeq
    // doc 2 (null flag) pairs as OLD against new doc 1; the old×old
    // pair (2,3) still never forms
    pairs shouldBe Seq((1L, 2L, true, false), (1L, 3L, true, false))
  }

  test("dedupFirst respects the score threshold across within-group pairs") {
    val corpus = Seq(
      (1L, "aa bb cc dd ee ff gg hh"),
      (2L, "aa bb cc dd ee ff gg hh"),
      (3L, "aa bb cc dd ee ff gg zz")
    ).toDF("doc_id", "text")
    val exact = Dedup
      .minhashNearDups(corpus, "doc_id", "text", 3, 8, 4, threshold = 1.0,
        persistShingles = false, dedupFirst = true)
      .orderBy("id1", "id2")
      .as[(Long, Long, Double)]
      .collect()
      .toSeq
    exact shouldBe Seq((1L, 2L, 1.0))
  }

  test("nearDupComponents dedupFirst matches the direct clustering exactly") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text with no overlap at all whatsoever"),
      (4L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (5L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (6L, "the quick brown fox jumps over the lazy cat"), // dup of 2
      (7L, "too short"),
      (8L, "too short"), // dup of 7 but shingle-ineligible: not in the graph
      (9L, "completely different text with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    def clusters(dedup: Boolean) = Dedup
      .nearDupComponents(corpus, "doc_id", "text", 3, 8, 4, dedupFirst = dedup)
      .orderBy("id")
      .as[(Long, Long)]
      .collect()
      .toSeq
    val direct = clusters(false)
    direct.nonEmpty shouldBe true
    clusters(true) shouldBe direct
  }

  test("jaccard is exact") {
    // |{b,c}| / |{a,b,c,d}| = 0.5
    val out = spark
      .range(1)
      .select(Dedup.jaccard(typedLit(Seq("a", "b", "c")), typedLit(Seq("b", "c", "d"))).as("j"))
      .as[Double]
      .head()
    out shouldBe 0.5
  }

  test("simhash of identical docs is identical; of disjoint docs differs") {
    val df = docs.toDF("doc_id", "text")
    val sh = df
      .select(col("doc_id"), Dedup.simhash16(Dedup.tokens(col("text"))).as("s"))
      .as[(Long, Int)]
      .collect()
      .toMap
    sh(1L) shouldBe sh(4L)
    sh(1L) should not be sh(3L)
    sh.values.foreach { v => v should be >= 0; v should be <= 65535 }
  }

  test("winnow fingerprints of a shifted document overlap (the winnowing guarantee)") {
    val base = "one two three four five six seven eight nine ten eleven twelve"
    val shifted = "zero " + base
    val df = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val fps = df
      .select(col("doc_id"), Dedup.winnowFingerprints(Dedup.tokens(col("text")), k = 3, w = 4).as("f"))
      .as[(Long, Seq[String])]
      .collect()
      .toMap
    // shared long substring ⇒ shared window minima
    fps(1L).toSet.intersect(fps(2L).toSet) should not be empty
  }

  test("docs with fewer tokens than k produce no shingles and never pair") {
    val df = Seq((1L, "hi"), (2L, "hi"), (3L, "yo")).toDF("doc_id", "text")
    Dedup.minhashNearDups(df, "doc_id", "text", 3, 8, 4).count() shouldBe 0
  }

  test("chooseBanding tracks the LSH S-curve threshold") {
    // 128 hashes: high thresholds want many rows per band (few bands),
    // low thresholds want many bands.
    Dedup.chooseBanding(128, 0.9) should be < Dedup.chooseBanding(128, 0.3)
    // b=16,r=8 → (1/16)^(1/8) ≈ 0.707; nearest divisor choice for 0.7.
    Dedup.chooseBanding(128, 0.7) shouldBe 16
    // Always a divisor.
    for (t <- Seq(0.1, 0.5, 0.9)) (128 % Dedup.chooseBanding(128, t)) shouldBe 0
  }

  test("max bucket size drops only the degenerate bucket's pairs") {
    // Five identical docs all land in one bucket per band (10 pairs);
    // capping at 4 removes them while a small distinct pair elsewhere
    // must survive.
    val clones = (1L to 5L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val pairDocs = Seq(
      (10L, "one two three four five six seven"),
      (11L, "one two three four five six eight")
    )
    val df = (clones ++ pairDocs).toDF("doc_id", "text")
    val bands = Dedup.explodeBands(df, "doc_id", "text", 3, 8, 4)
    val uncapped = Dedup.candidatePairs(bands, "doc_id").count()
    val capped = Dedup
      .candidatePairs(bands, "doc_id", maxBucketSize = 4)
      .as[(Long, Long)]
      .collect()
    uncapped shouldBe 11 // 10 clone pairs + 1 near-dup pair
    capped.toSet shouldBe Set((10L, 11L))
  }
}
