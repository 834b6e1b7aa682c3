package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProductQuantSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0, 0.0, 10.0, 0.0)),
    (1L, Seq(0.9, 0.1, 10.1, -0.1)),
    (2L, Seq(-1.0, 0.0, -10.0, 0.0)),
    (3L, Seq(-0.9, -0.1, -9.9, 0.1))
  ).toDF("id", "emb")

  test("dims must split evenly into subspaces") {
    val e = intercept[IllegalArgumentException] {
      ProductQuant.fitCodebooks(vecs, "id", "emb", dims = 4, m = 3, k = 2, iters = 1)
    }
    e.getMessage should include("subspaces")
  }

  test("fitCodebooks equals per-subspace KMeans.fit bit-for-bit (both dedup modes)") {
    // fitCodebooks must reproduce the split fits' codebooks EXACTLY —
    // decimal means, lowest-id init, empty-cell carry — on a corpus
    // with duplicate slices and an empty-ish cell. (Round 15 tried a
    // fused single-loop variant behind this invariant and reverted it
    // on measurement; the pin stays so any future rewrite is held to
    // the same bit-equality bar.)
    val rnd = new scala.util.Random(11)
    val rows = (0L until 40L).map { id =>
      val base = if (id % 3 == 0) Seq(1.0, 2.0, -1.0, 0.5, 9.0, 9.0) // repeated slice values
      else Seq.fill(6)(rnd.nextDouble() * 4 - 2)
      (id, base)
    }
    val df = rows.toDF("id", "emb")
    for (dedup <- Seq(false, true)) {
      val got = ProductQuant.fitCodebooks(
        df, "id", "emb", dims = 6, m = 3, k = 4, iters = 3, dedupVectors = dedup)
      val split = (0 until 3).map { s =>
        val sl = df.select(
          col("id").as("_pqid"),
          slice(col("emb"), lit(s * 2 + 1), lit(2)).as("_pqes"))
        KMeans.fit(sl, "_pqid", "_pqes", k = 4, iters = 3, dedupVectors = dedup)
      }
      got.map(_.map(_.map(java.lang.Double.doubleToLongBits))) shouldBe
        split.map(_.map(_.map(java.lang.Double.doubleToLongBits)))
    }
  }

  test("m=1 reduces to plain k-means: codes match assign, sq_err is the true distance") {
    val cbs = ProductQuant.fitCodebooks(vecs, "id", "emb", dims = 4, m = 1, k = 2, iters = 2)
    cbs.size shouldBe 1
    val direct = KMeans
      .assign(vecs.select(col("id"), col("emb")), "emb", cbs.head)
      .select("id", "cell")
      .as[(Long, Int)]
      .collect()
      .toMap
    val enc = ProductQuant.encode(vecs, "id", "emb", cbs)
    val codes = enc.select("id", "code").as[(Long, Int)].collect().toMap
    codes shouldBe direct
    // hand-check one reconstruction error against the codebook
    val rows = enc.select("id", "code", "sq_err").as[(Long, Int, Double)].collect()
    val byId = vecs.as[(Long, Seq[Double])].collect().toMap
    rows.foreach { case (id, code, err) =>
      val c = cbs.head(code)
      val expected = byId(id).zip(c).foldLeft(0.0) { case (a, (x, y)) => a + (x - y) * (x - y) }
      err shouldBe expected
    }
  }

  test("ADC is exact on a zero-residual corpus (vectors sit on codebook centroids)") {
    // 2 subspaces x 2 codes; the 4 vectors enumerate the centroid
    // combinations, so after the fit every reconstruction is exact and
    // ADC distance == true squared L2.
    val combos = Seq(
      (0L, Seq(0.0, 0.0, 10.0, 10.0)),
      (1L, Seq(0.0, 0.0, -10.0, -10.0)),
      (2L, Seq(5.0, 5.0, 10.0, 10.0)),
      (3L, Seq(5.0, 5.0, -10.0, -10.0))
    )
    val df = combos.toDF("id", "emb")
    val cbs = ProductQuant.fitCodebooks(df, "id", "emb", dims = 4, m = 2, k = 2, iters = 2)
    val enc = ProductQuant.encode(df, "id", "emb", cbs)
    // zero residual: the fit recovered the points exactly
    enc.agg(max(col("sq_err"))).head.getDouble(0) shouldBe 0.0
    val adc = ProductQuant
      .adcTopK(combos, enc.select("id", "sub", "code"), cbs, k = 3)
      .select("qid", "nid", "adc_dist")
      .as[(Long, Long, Double)]
      .collect()
    def sqd(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val byId = combos.toMap
    adc.foreach { case (q, n, d) => d shouldBe sqd(byId(q), byId(n)) }
    adc.length shouldBe 4 * 3
  }

  test("ADC ranking is complete and deterministically tie-broken") {
    val df = vecs
    val cbs = ProductQuant.fitCodebooks(df, "id", "emb", dims = 4, m = 2, k = 2, iters = 2)
    val enc = ProductQuant.encode(df, "id", "emb", cbs).select("id", "sub", "code")
    val qs = Seq((0L, Seq(1.0, 0.0, 10.0, 0.0)))
    val out = ProductQuant.adcTopK(qs, enc, cbs, k = 10).select("rank", "nid").as[(Int, Long)].collect()
    out.map(_._1).sorted shouldBe Seq(1, 2, 3) // 3 non-self neighbors
    // vectors 0 and 1 share codes in every subspace -> equal ADC dist;
    // the tie breaks by nid, and the near cluster outranks the far one
    out.toMap.apply(1) shouldBe 1L
  }

  test("adcTopKDf is byte-identical to the driver-Seq adcTopK on the same query set") {
    val df = vecs
    val cbs = ProductQuant.fitCodebooks(df, "id", "emb", dims = 4, m = 2, k = 2, iters = 2)
    val enc = ProductQuant.encode(df, "id", "emb", cbs).select("id", "sub", "code")
    val qseq = Seq(
      (0L, Seq(1.0, 0.0, 10.0, 0.0)),
      (2L, Seq(-1.0, 0.0, -10.0, 0.0)),
      (7L, Seq(0.3, -0.2, 4.5, 1.1)) // off-corpus query exercises non-centroid tables
    )
    val seqOut = ProductQuant
      .adcTopK(qseq, enc, cbs, k = 10)
      .orderBy("qid", "rank")
      .as[(Long, Int, Long, Double)]
      .collect()
    val dfOut = ProductQuant
      .adcTopKDf(qseq.toDF("qid", "qemb"), "qid", "qemb", enc, cbs, k = 10)
      .orderBy("qid", "rank")
      .as[(Long, Int, Long, Double)]
      .collect()
    // exact equality including the doubles: the executor-side table
    // fold replays the driver fold bit-for-bit
    dfOut shouldBe seqOut
  }

  test("adcTopKDf scales to a 10k-query batch with no driver-side table build") {
    val df = vecs
    val cbs = ProductQuant.fitCodebooks(df, "id", "emb", dims = 4, m = 2, k = 2, iters = 2)
    val enc = ProductQuant.encode(df, "id", "emb", cbs).select("id", "sub", "code")
    // 10k synthetic queries generated IN SPARK — the query embeddings
    // never exist on the driver, which is the point of the Df form
    val queries = spark
      .range(100L, 10100L)
      .select(
        col("id").as("qid"),
        transform(
          sequence(lit(0), lit(3)),
          d => ((col("id") % 13 + d * 7) % 9 - lit(4)).cast("double")).as("qemb"))
    val out = ProductQuant.adcTopKDf(queries, "qid", "qemb", enc, cbs, k = 2)
    out.count() shouldBe 10000L * 2 // every query ranks 2 of the 4 corpus vectors
    // and the plan's only local-relation leaf is the m·k codebook, not
    // a |Q|-sized literal
    val leaves = out.queryExecution.optimizedPlan.collectLeaves()
    val localRows = leaves.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l.data.size
    }
    assert(localRows.forall(_ <= 4), s"driver-built literal leaked into the plan: $localRows")
  }

  test("subspaces quantize independently: clear 2-cluster structure recovers per subspace") {
    val cbs = ProductQuant.fitCodebooks(vecs, "id", "emb", dims = 4, m = 2, k = 2, iters = 2)
    cbs.size shouldBe 2
    val enc = ProductQuant
      .encode(vecs, "id", "emb", cbs)
      .select("id", "sub", "code")
      .as[(Long, Int, Int)]
      .collect()
    enc.length shouldBe 8 // 4 vectors x 2 subspaces
    // vectors 0,1 cluster together and 2,3 together in BOTH subspaces
    val bySub = enc.groupBy(_._2)
    for ((_, rows) <- bySub) {
      val m = rows.map(r => r._1 -> r._3).toMap
      m(0L) shouldBe m(1L)
      m(2L) shouldBe m(3L)
      m(0L) should not be m(2L)
    }
  }
}
