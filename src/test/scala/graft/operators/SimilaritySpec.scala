package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0, 0.0, 0.0), 0),
    (1L, Seq(0.9, 0.1, 0.0), 0), // near 0
    (2L, Seq(0.0, 1.0, 0.0), 1),
    (3L, Seq(0.0, 0.9, 0.1), 1), // near 2
    (4L, Seq(-1.0, 0.0, 0.0), 0) // opposite of 0
  ).toDF("vec_id", "emb", "cell")

  test("brute-force top-k finds the true nearest neighbor") {
    val q = vecs.filter(col("vec_id") === 0).select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val c = vecs.select(col("vec_id").as("nid"), col("emb").as("nemb"))
    val top = Similarity
      .bruteForceTopK(q, c, k = 2)
      .select("rank", "nid")
      .as[(Int, Long)]
      .collect()
      .toMap
    top(1) shouldBe 1L // cos(v0, v1) highest
    top(2) shouldBe 2L // orthogonal beats antipodal
  }

  test("cell-restricted top-k only searches within the cell") {
    val q = vecs
      .filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"), col("cell"))
    val c = vecs.select(col("vec_id").as("nid"), col("emb").as("nemb"), col("cell"))
    val nids = Similarity.cellTopK(q, c, k = 10).select("nid").as[Long].collect().toSet
    nids shouldBe Set(1L, 4L) // cell 0 only, self excluded
  }

  test("sign-LSH puts identical vectors in the same bucket, antipodal in different ones") {
    val b = Similarity
      .signLshBuckets(
        Seq((0L, Seq(1.0, 2.0, 3.0)), (1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(-1.0, -2.0, -3.0)))
          .toDF("id", "e"),
        "id",
        "e",
        planes = 8,
        dims = 3
      )
      .as[(Long, Int)]
      .collect()
      .toMap
    b(0L) shouldBe b(1L)
    b(0L) should not be b(2L)
  }

  test("embeddingDims reads the width from the first non-empty row") {
    val df = Seq(
      (1L, Seq.empty[Double]), // empty rows don't decide the width
      (2L, Seq(0.1, 0.2, 0.3, 0.4))
    ).toDF("id", "e")
    Similarity.embeddingDims(df, "e") shouldBe 4
    Similarity.embeddingDims(df.filter(col("id") === 1L), "e") shouldBe 0
  }

  test("sign-LSH bucketing is deterministic across runs") {
    def run() =
      Similarity
        .signLshBuckets(Seq((7L, Seq(0.3, -0.2, 0.9, 0.1))).toDF("id", "e"), "id", "e", 8, 4)
        .as[(Long, Int)]
        .head()
    run() shouldBe run()
  }

  test("kernel dot product is bit-identical to the declarative fold") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 50).map(i => (i.toLong, Seq.fill(64)(rng.nextGaussian()), Seq.fill(64)(rng.nextGaussian())))
    val df = rows.toDF("id", "a", "b")
    val both = df
      .select(
        Similarity.dot(col("a"), col("b")).as("fast"),
        Similarity.dotDeclarative(col("a"), col("b")).as("slow")
      )
      .as[(Double, Double)]
      .collect()
    both.foreach { case (f, s) => f shouldBe s } // exact, not approximate
  }

  test("cosine of a vector with itself is 1") {
    val out = Seq((1L, Seq(3.0, 4.0))).toDF("id", "e")
      .select(Similarity.cosine(col("e"), col("e")).as("c"))
      .as[Double]
      .head()
    out shouldBe 1.0 +- 1e-12
  }

  // ---- ANN recall gates ------------------------------------------------
  // Retrieval QUALITY, not just plan shape: the approximate tiers must
  // recover the brute-force truth when the data has neighbor structure.
  // (On isotropic data — like the synthetic embeddings table — single-
  // probe recall is intrinsically ≈ the probed fraction of the corpus;
  // a bound there would measure the data, not the index. Clustered data
  // is where an IVF/LSH index has something to find.)

  /** Deterministic uniform in [0,1) from md5 — no RNG state, same trick
    * as Similarity.planeComponent.
    */
  private def u(s: String): Double = {
    val dig = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Integer.toUnsignedLong(java.nio.ByteBuffer.wrap(dig).getInt).toDouble / 4294967295.0
  }

  /** 8 well-separated clusters × 60 points in 16 dims, hash-noise. */
  private lazy val clustered = {
    val rows = for { k <- 0 until 8; i <- 0 until 60 } yield {
      val emb = (0 until 16).map { d =>
        (u(s"c:$k:$d") * 2 - 1) * 10.0 + (u(s"p:$k:$i:$d") * 2 - 1) * 0.5
      }
      ((k * 60 + i).toLong, emb)
    }
    rows.toDF("id", "emb")
  }

  private def recallAtK(approx: org.apache.spark.sql.DataFrame, truth: Map[Long, Set[Long]], k: Int): Double = {
    val got = approx
      .select(col("qid"), col("nid"))
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    val per = truth.map { case (q, t) => got.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / k }
    per.sum / per.size
  }

  test("cellNearDups dedupFirst is bit-identical on a duplicate-heavy table") {
    // duplicate vectors within and across cells, plus near-dups
    val dup = Seq(
      (0L, Seq(1.0, 0.0, 0.2), 0),
      (1L, Seq(1.0, 0.0, 0.2), 0), // exact dup of 0, same cell
      (2L, Seq(1.0, 0.0, 0.2), 0), // exact dup of 0, same cell
      (3L, Seq(0.9, 0.1, 0.2), 0), // near-dup, same cell
      (4L, Seq(1.0, 0.0, 0.2), 1), // same vector, DIFFERENT cell — never pairs with 0-2
      (5L, Seq(0.0, 1.0, 0.0), 1),
      (6L, Seq(0.0, 1.0, 0.0), 1), // exact dup of 5
      // multi-probe shape: ids 0 and 1 ALSO land in cell 1 — their
      // duplicate group recurs per cell, and expansion must stay
      // per-(cell, group), not multiply across the cells it recurs in
      (0L, Seq(1.0, 0.0, 0.2), 1),
      (1L, Seq(1.0, 0.0, 0.2), 1)
    ).toDF("id", "emb", "cell")
    def run(dedup: Boolean) = Similarity
      .cellNearDups(dup, threshold = 0.3, dedupFirst = dedup)
      .orderBy("cell", "id1", "id2")
      .as[(Int, Long, Long, Double)]
      .collect()
      .toSeq
    val direct = run(false)
    direct.nonEmpty shouldBe true
    // bit-identical, including the self-cosine of duplicate groups
    // (computed through the same dot/norm expression, not lit(1.0))
    run(true) shouldBe direct
  }

  test("recall gate: trained-IVF (k-means cells) recovers >=0.9 of brute-force truth") {
    val k = 5
    val q = clustered.filter(col("id") % 37 === 0).select(col("id").as("qid"), col("emb").as("qemb"))
    val c = clustered.select(col("id").as("nid"), col("emb").as("nemb"))
    val truth = Similarity
      .bruteForceTopK(q, c, k)
      .select(col("qid"), col("nid"))
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (qq, xs) => qq -> xs.map(_._2).toSet }

    val centroids = KMeans.fit(clustered, idCol = "id", embCol = "emb", k = 8, iters = 5)
    val cells = KMeans.assign(clustered, "emb", centroids)
    val qc = cells.filter(col("id") % 37 === 0).select(col("id").as("qid"), col("cell"), col("emb").as("qemb"))
    val cc = cells.select(col("id").as("nid"), col("cell"), col("emb").as("nemb"))
    val ivf = Similarity.cellTopK(qc, cc, k)
    recallAtK(ivf, truth, k) should be >= 0.9
  }

  test("multi-probe IVF: nprobe=1 equals single assignment; probing every cell is exact") {
    val k = 5
    val centroids = KMeans.fit(clustered, idCol = "id", embCol = "emb", k = 8, iters = 5)
    val cells = KMeans.assign(clustered, "emb", centroids)
    // nprobe=1 degenerates to the plain nearest-cell assignment
    KMeans
      .assignProbes(clustered, "emb", centroids, 1)
      .select("id", "cell")
      .as[(Long, Int)]
      .collect()
      .sorted
      .toSeq shouldBe cells.select("id", "cell").as[(Long, Int)].collect().sorted.toSeq

    val truth = Similarity
      .bruteForceTopK(
        clustered.filter(col("id") % 37 === 0).select(col("id").as("qid"), col("emb").as("qemb")),
        clustered.select(col("id").as("nid"), col("emb").as("nemb")),
        k)
      .select(col("qid"), col("nid"))
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    val cc = cells.select(col("id").as("nid"), col("cell"), col("emb").as("nemb"))
    def ivfAt(nprobe: Int) = Similarity.cellTopK(
      KMeans
        .assignProbes(clustered.filter(col("id") % 37 === 0), "emb", centroids, nprobe)
        .select(col("id").as("qid"), col("cell"), col("emb").as("qemb")),
      cc,
      k)
    // probing all k cells searches the whole corpus: exact recall, and
    // no duplicate (qid, nid) pairs (a neighbor lives in ONE home cell)
    val full = ivfAt(8)
    recallAtK(full, truth, k) shouldBe 1.0
    full.groupBy("qid", "nid").count().filter(col("count") > 1).count() shouldBe 0L
    // recall is monotone in nprobe
    recallAtK(ivfAt(2), truth, k) should be >= recallAtK(ivfAt(1), truth, k)
  }

  test("recall gate: sign-LSH buckets recover >=0.7 of brute-force truth") {
    val k = 5
    val q = clustered.filter(col("id") % 37 === 0).select(col("id").as("qid"), col("emb").as("qemb"))
    val c = clustered.select(col("id").as("nid"), col("emb").as("nemb"))
    val truth = Similarity
      .bruteForceTopK(q, c, k)
      .select(col("qid"), col("nid"))
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (qq, xs) => qq -> xs.map(_._2).toSet }

    val buckets = Similarity.signLshBuckets(clustered, idCol = "id", embCol = "emb", planes = 8, dims = 16)
    val cells = clustered.join(buckets, "id").withColumnRenamed("bucket", "cell")
    val qc = cells.filter(col("id") % 37 === 0).select(col("id").as("qid"), col("cell"), col("emb").as("qemb"))
    val cc = cells.select(col("id").as("nid"), col("cell"), col("emb").as("nemb"))
    val lsh = Similarity.cellTopK(qc, cc, k)
    recallAtK(lsh, truth, k) should be >= 0.7
  }

  // ---- semDedup -------------------------------------------------------------

  /** Unit vector at `deg` degrees in the plane — cos(a, b) is exactly
    * the cosine of the angle between them.
    */
  private def at(deg: Double) = {
    val r = math.toRadians(deg)
    Seq(math.cos(r), math.sin(r))
  }

  test("semDedup keeps the earliest member and drops later in-cell near-dups") {
    // 0 and 1 are 20 degrees apart (cos ~0.94 >= 0.9); 2 is orthogonal.
    val df = Seq(
      (0L, at(0), 0),
      (1L, at(20), 0),
      (2L, at(90), 0)
    ).toDF("id", "emb", "cell")
    val out = Similarity
      .semDedup(df, threshold = 0.9)
      .select("id", "kept", "n_dups_earlier")
      .as[(Long, Boolean, Long)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap
    out(0L) shouldBe ((true, 0L))
    out(1L) shouldBe ((false, 1L))
    out(2L) shouldBe ((true, 0L))
  }

  test("semDedup is greedy by id order: a doc drops for an earlier neighbor even if that neighbor dropped") {
    // 0~1 (20 deg) and 1~2 (20 deg) but 0!~2 (40 deg, cos ~0.766 < 0.9):
    // 1 drops for 0, and 2 STILL drops (its earlier neighbor 1 matched),
    // the paper's fixed-ordering greedy semantics.
    val df = Seq(
      (0L, at(0), 0),
      (1L, at(20), 0),
      (2L, at(40), 0)
    ).toDF("id", "emb", "cell")
    val kept = Similarity
      .semDedup(df, threshold = 0.9)
      .filter(col("kept"))
      .select("id")
      .as[Long]
      .collect()
      .toSet
    kept shouldBe Set(0L)
  }

  test("semDedup never pairs across cells") {
    val df = Seq(
      (0L, at(0), 0),
      (1L, at(0), 1) // identical vector, different cell
    ).toDF("id", "emb", "cell")
    Similarity
      .semDedup(df, threshold = 0.9)
      .filter(col("kept"))
      .count() shouldBe 2L
  }

  test("semDedup dedupFirst staging is output-identical") {
    // duplicate vectors present so the staged path actually collapses
    val df = Seq(
      (0L, at(0), 0),
      (1L, at(0), 0),
      (2L, at(20), 0),
      (3L, at(90), 0),
      (4L, at(90), 0)
    ).toDF("id", "emb", "cell")
    val direct = Similarity.semDedup(df, threshold = 0.9, dedupFirst = false)
    val staged = Similarity.semDedup(df, threshold = 0.9, dedupFirst = true)
    val key = Seq("id", "cell", "n_dups_earlier", "kept")
    direct.select(key.head, key.tail: _*).except(staged.select(key.head, key.tail: _*)).count() shouldBe 0L
    staged.select(key.head, key.tail: _*).except(direct.select(key.head, key.tail: _*)).count() shouldBe 0L
  }
}
