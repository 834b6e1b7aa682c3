package graft.operators

import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // Three well-separated 2-D clumps around (0,0), (10,0), (0,10).
  private val clusters = Seq(
    (0L, Seq(0.1, 0.0)), (1L, Seq(-0.1, 0.1)), (2L, Seq(0.0, -0.1)),
    (10L, Seq(10.1, 0.0)), (11L, Seq(9.9, 0.1)), (12L, Seq(10.0, -0.1)),
    (20L, Seq(0.0, 10.1)), (21L, Seq(0.1, 9.9)), (22L, Seq(-0.1, 10.0))
  )

  test("separated clumps get distinct cells and tight centroids") {
    val df = clusters.toDF("id", "emb")
    val centroids = KMeans.fit(df, "id", "emb", k = 3, iters = 5)
    val assigned = KMeans.assign(df, "emb", centroids).select("id", "cell").as[(Long, Int)].collect().toMap

    // Same-clump vectors share a cell; different clumps differ.
    assigned(0L) shouldBe assigned(1L)
    assigned(0L) shouldBe assigned(2L)
    assigned(10L) shouldBe assigned(11L)
    assigned(20L) shouldBe assigned(21L)
    Set(assigned(0L), assigned(10L), assigned(20L)).size shouldBe 3

    // Each clump's centroid sits at its mean (within rounding).
    val c0 = centroids(assigned(0L))
    math.abs(c0(0)) should be < 0.05
    math.abs(c0(1)) should be < 0.05
    val c10 = centroids(assigned(10L))
    math.abs(c10(0) - 10.0) should be < 0.05
  }

  test("fit is deterministic across partitionings") {
    val df1 = clusters.toDF("id", "emb").repartition(1)
    val df8 = clusters.toDF("id", "emb").repartition(8)
    KMeans.fit(df1, "id", "emb", 3, 4) shouldBe KMeans.fit(df8, "id", "emb", 3, 4)
  }

  test("dedupVectors fit is bit-identical on a duplicate-heavy corpus") {
    // duplicate vectors with uneven multiplicities across clumps —
    // the weighted mean must reproduce the direct mean EXACTLY
    val dups = clusters ++ Seq(
      (30L, Seq(0.1, 0.0)), (31L, Seq(0.1, 0.0)), (32L, Seq(0.1, 0.0)), // ×4 total
      (33L, Seq(10.1, 0.0)), // ×2 total
      (34L, Seq(0.0, 10.1)), (35L, Seq(0.0, 10.1)) // ×3 total
    )
    val df = dups.toDF("id", "emb")
    val direct = KMeans.fit(df, "id", "emb", k = 3, iters = 4)
    val deduped = KMeans.fit(df, "id", "emb", k = 3, iters = 4, dedupVectors = true)
    deduped shouldBe direct
  }

  test("kernel nearestCell == declarative argmin form") {
    val df = clusters.toDF("id", "emb")
    val cents = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(0.0, 10.0), Seq(0.05, 0.0))
    val both = df.select(
      KMeans.nearestCell(org.apache.spark.sql.functions.col("emb"), cents).as("fast"),
      KMeans.nearestCellDeclarative(org.apache.spark.sql.functions.col("emb"), cents).as("slow")
    )
    both.as[(Int, Int)].collect().foreach { case (f, s) => f shouldBe s }
  }

  test("ragged embedding lengths fail fast with a clear error") {
    val ragged = Seq((0L, Seq(0.0, 0.0)), (1L, Seq(1.0)), (2L, Seq(2.0, 2.0))).toDF("id", "emb")
    val e = intercept[IllegalArgumentException] {
      KMeans.fit(ragged, "id", "emb", k = 2, iters = 1)
    }
    e.getMessage should include("ragged embedding lengths")
  }

  test("empty cells keep their previous centroid") {
    // k = 4 over 3 clumps: one centroid ends up empty and must persist.
    val df = clusters.toDF("id", "emb")
    val centroids = KMeans.fit(df, "id", "emb", k = 4, iters = 3)
    centroids.size shouldBe 4
    centroids.foreach(c => c.size shouldBe 2)
  }

  test("driver-side nearestCells matches assignProbes for every vector and nprobe") {
    val df = clusters.toDF("id", "emb")
    val centroids = KMeans.fit(df, "id", "emb", k = 3, iters = 2)
    val vecs = df.as[(Long, Seq[Double])].collect()
    for (nprobe <- 1 to 3) {
      val dfProbes = KMeans
        .assignProbes(df, "emb", centroids, nprobe)
        .select("id", "cell")
        .as[(Long, Int)]
        .collect()
        .groupBy(_._1)
        .map { case (id, xs) => id -> xs.map(_._2).toSet }
      vecs.foreach { case (id, emb) =>
        KMeans.nearestCells(emb, centroids, nprobe).toSet shouldBe dfProbes(id)
      }
    }
  }
}
