package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The IVFADC index (fit / search / searchDf): the many-query
  * DataFrame search must be byte-identical to the driver-Seq form,
  * and retrieval QUALITY is gated — recall@5 against exact
  * squared-L2 truth (ADC's own metric), with the classic
  * nprobe-monotonicity property. Floors are calibrated on the
  * clustered fixture and pinned so a codebook/probe change can't
  * silently degrade retrieval.
  */
class IvfadcSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic uniform in [0,1) from md5 — no RNG state (same
    * trick as SimilaritySpec / Similarity.planeComponent).
    */
  private def u(s: String): Double = {
    val dig = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Integer.toUnsignedLong(java.nio.ByteBuffer.wrap(dig).getInt).toDouble / 4294967295.0
  }

  /** Hierarchical fixture: 8 well-separated coarse clusters (scale
    * 10) × 6 subclusters (scale 2) × 10 points (noise 0.1) in 16
    * dims. The coarse tier is what IVF routes on; the SUBcluster tier
    * is neighbor structure at a scale the residual PQ codes can
    * resolve — a flat cluster-plus-noise fixture would make
    * in-cell ranking pure quantization noise and measure nothing.
    */
  private lazy val rows: Seq[(Long, Seq[Double])] =
    for { k <- 0 until 8; g <- 0 until 6; i <- 0 until 10 } yield {
      val emb = (0 until 16).map { d =>
        (u(s"c:$k:$d") * 2 - 1) * 10.0 +
          (u(s"g:$k:$g:$d") * 2 - 1) * 2.0 +
          (u(s"p:$k:$g:$i:$d") * 2 - 1) * 0.1
      }
      ((k * 60 + g * 10 + i).toLong, emb: Seq[Double])
    }
  private lazy val clustered = rows.toDF("id", "emb")
  private lazy val qseq = rows.filter(_._1 % 37 == 0)

  private lazy val index =
    Ivfadc.fit(clustered, "id", "emb", coarseK = 8, coarseIters = 5, m = 4, pqK = 16, pqIters = 3)

  /** Exact squared-L2 top-k (self excluded) — ADC's own metric, so
    * the gate measures quantization loss, not metric mismatch.
    */
  private def l2Truth(k: Int): Map[Long, Set[Long]] = {
    val all = rows
    qseq.map { case (q, qe) =>
      q -> all
        .filter(_._1 != q)
        .map { case (n, ne) =>
          (ne.zip(qe).foldLeft(0.0) { case (a, (x, y)) => a + (x - y) * (x - y) }, n)
        }
        .sorted
        .take(k)
        .map(_._2)
        .toSet
    }.toMap
  }

  private def recallAtK(
      approx: org.apache.spark.sql.DataFrame, truth: Map[Long, Set[Long]], k: Int): Double = {
    val got = approx
      .select(col("qid"), col("nid"))
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    val per = truth.map { case (q, t) => got.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / k }
    per.sum / per.size
  }

  test("searchDf is byte-identical to the driver-Seq search (incl. off-corpus queries)") {
    val qs = qseq :+ (9001L, (0 until 16).map(d => u(s"x:$d") * 4 - 2): Seq[Double])
    val a = Ivfadc
      .search(index, qs, nprobe = 2, k = 5)
      .orderBy("qid", "rank")
      .as[(Long, Int, Long, Int, Double)]
      .collect()
    val b = Ivfadc
      .searchDf(index, qs.toDF("qid", "qemb"), "qid", "qemb", nprobe = 2, k = 5)
      .orderBy("qid", "rank")
      .as[(Long, Int, Long, Int, Double)]
      .collect()
    a.nonEmpty shouldBe true
    b shouldBe a
  }

  test("many-query smoke: 10k queries stay in the DataFrame (no driver-side table build)") {
    val nQ = 10000
    // queries generated IN SPARK from a range — the driver never holds
    // them. emb[d] = md5-unit("Q:qid:d") * 4 - 2, an expression with an
    // exact Scala twin below (same IEEE op order).
    val qdf = spark
      .range(nQ)
      .select(
        col("id").as("qid"),
        transform(
          sequence(lit(0), lit(15)),
          d =>
            conv(
              md5(concat(lit("Q:"), col("id").cast("string"), lit(":"), d.cast("string")))
                .substr(1, 8), 16, 10).cast("double") / lit(4294967295.0) * lit(4.0) - lit(2.0))
          .as("qemb"))
    val res = Ivfadc.searchDf(index, qdf, "qid", "qemb", nprobe = 2, k = 5)
    // (b) plan shape: query rows flow from the Range source; the only
    // local relations are the broadcast model tables (codebook entries,
    // coarse centroids — model-sized, never |Q|-sized)
    val plan = res.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    plan should include("Range (0, 10000")
    "LocalTableScan".r.findAllMatchIn(plan).size should be <= 2
    // every query returns a full top-5 (the index covers the space)
    val counts = res.groupBy("qid").count().select("count").distinct().as[Long].collect()
    res.count() shouldBe nQ * 5L
    counts.toSeq shouldBe Seq(5L)
    // (a) sampled byte-equality vs the driver-Seq search: rebuild the
    // same md5-unit embeddings in Scala for 9 sampled qids
    val sample = (0 until 9).map(i => (i * 1111 + 7).toLong)
    val qseq2 = sample.map { qid =>
      (qid, (0 until 16).map(d => u(s"Q:$qid:$d") * 4.0 - 2.0): Seq[Double])
    }
    val a = Ivfadc
      .search(index, qseq2, nprobe = 2, k = 5)
      .orderBy("qid", "rank")
      .as[(Long, Int, Long, Int, Double)]
      .collect()
    val b = res
      .filter(col("qid").isInCollection(sample))
      .orderBy("qid", "rank")
      .as[(Long, Int, Long, Int, Double)]
      .collect()
    a.length shouldBe 45
    b shouldBe a
  }

  test("recall gate: nprobe=2 probed ADC recovers the L2 truth; recall is monotone in nprobe") {
    val k = 5
    val truth = l2Truth(k)
    // Quantized distances TIE across a subcluster (mates share the
    // code vector), so recall@5 against exact truth@5 is intrinsically
    // capped near 5/9 when the 9 mates are interchangeable under the
    // codes — measured 0.52 at pin time. The sharper quality gate is
    // CONTAINMENT: everything returned must come from the true
    // neighborhood (truth@9 = the subcluster mates); that catches a
    // broken codebook or probe routing, which recall-with-ties can't
    // distinguish from tie noise.
    val truth9 = l2Truth(9)
    def at(nprobe: Int) = recallAtK(Ivfadc.search(index, qseq, nprobe, k), truth, k)
    val r1 = at(1); val r2 = at(2); val r8 = at(8)
    info(s"ivfadc recall@5: nprobe=1 -> $r1, nprobe=2 -> $r2, nprobe=8 -> $r8")
    r2 should be >= 0.45
    r2 should be >= r1
    r8 should be >= r2
    val contained = recallAtK(Ivfadc.search(index, qseq, nprobe = 2, k), truth9, k)
    info(s"ivfadc containment (top-5 within L2 truth@9): $contained")
    contained should be >= 0.8
  }

  test("save/load round-trips the index bit-exactly; search off the loaded index is byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfadc_idx").toString
    Ivfadc.save(index, dir)
    val loaded = Ivfadc.load(spark, dir)
    // model literals round-trip exactly (JSON shortest-repr doubles)
    loaded.dims shouldBe index.dims
    loaded.coarse shouldBe index.coarse
    loaded.codebooks shouldBe index.codebooks
    // staged halves hold the same rows; loaded enc additionally
    // carries its cell partition column (what makes the probed-search
    // join partition-prunable), and every row's cell matches the
    // cells table's assignment
    loaded.cells.orderBy("id").collect() shouldBe index.cells.orderBy("id").collect()
    loaded.enc.select("id", "sub", "code").orderBy("id", "sub").collect() shouldBe
      index.enc.orderBy("id", "sub").collect()
    loaded.enc.join(index.cells.withColumnRenamed("cell", "_c"), "id")
      .filter(col("cell") =!= col("_c")).count() shouldBe 0L
    // the physical layout is cell-partitioned for BOTH staged halves
    new java.io.File(s"$dir/enc").listFiles.map(_.getName).count(_.startsWith("cell=")) should be > 1
    new java.io.File(s"$dir/cells").listFiles.map(_.getName).count(_.startsWith("cell=")) should be > 1
    // search results off the loaded index are byte-identical — and the
    // loaded plan reads the staged parquet, not a recomputed fit
    val a = Ivfadc.search(index, qseq, nprobe = 2, k = 5)
      .orderBy("qid", "rank").as[(Long, Int, Long, Int, Double)].collect()
    val res = Ivfadc.search(loaded, qseq, nprobe = 2, k = 5)
    res.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode) should
      include("Scan parquet")
    res.orderBy("qid", "rank").as[(Long, Int, Long, Int, Double)].collect() shouldBe a
  }

  /** Every FileSourceScan in the final (post-AQE) physical tree. */
  private def fileScans(
      p: org.apache.spark.sql.execution.SparkPlan
  ): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec        => fileScans(q.plan)
    case s: org.apache.spark.sql.execution.FileSourceScanExec             => Seq(s)
    case other => other.children.flatMap(fileScans)
  }

  test("loaded-index probed search reads ONLY the probed cells' enc files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfadc_prune").toString
    Ivfadc.save(index, dir)
    val loaded = Ivfadc.load(spark, dir)
    val cellDirs = new java.io.File(s"$dir/enc").listFiles.filter(_.getName.startsWith("cell="))
    cellDirs.length shouldBe 8 // the fixture populates every coarse cell
    def parquetFiles(d: java.io.File): Int =
      d.listFiles.count(f => f.getName.endsWith(".parquet"))
    val totalEncFiles = cellDirs.map(parquetFiles).sum
    val maxFilesPerCell = cellDirs.map(parquetFiles).max

    def assertPruned(out: org.apache.spark.sql.DataFrame, label: String): Unit = {
      out.collect()
      val encScans = fileScans(out.queryExecution.executedPlan)
        .filter(_.relation.location.rootPaths.exists(_.toString.contains("ivfadc_prune")))
        .filter(_.schema.fieldNames.contains("code")) // the enc scan, not cells
      withClue(s"$label: ") {
        encScans should not be empty
        // the probe filter reaches the scan as a PARTITION filter …
        encScans.foreach(s => s.partitionFilters should not be empty)
        // … and listing-time pruning means a 1-query nprobe=2 search
        // reads at most 2 cells' files, never the whole corpus layout
        val filesRead = encScans.map(_.metrics("numFiles").value).sum
        filesRead should be <= (2L * maxFilesPerCell)
        filesRead should be < totalEncFiles.toLong
      }
    }
    val q = Seq(qseq.head)
    assertPruned(Ivfadc.search(loaded, q, nprobe = 2, k = 3), "driver-Seq search")
    assertPruned(
      Ivfadc.searchDf(loaded, q.toDF("qid", "emb"), "qid", "emb", nprobe = 2, k = 3),
      "searchDf")
    // pruning is an optimization, not a semantics change: results off
    // the pruned loaded index equal the in-memory fit index's
    Ivfadc.search(loaded, q, nprobe = 2, k = 3)
      .orderBy("qid", "rank").as[(Long, Int, Long, Int, Double)].collect() shouldBe
      Ivfadc.search(index, q, nprobe = 2, k = 3)
        .orderBy("qid", "rank").as[(Long, Int, Long, Int, Double)].collect()
  }

  test("save ships the fit-time staleness baseline; driftCheck flags a drifted batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfadc_stale").toString
    Ivfadc.save(index, dir, Some(rows.toDF("id", "emb")), "id", "emb")
    // the baseline is staged WITH the index — no caller bookkeeping
    val baseline = spark.read.parquet(s"$dir/staleness")
    baseline.filter(col("cell").isNull).head().getAs[Long]("n_vectors") shouldBe 480L
    val loaded = Ivfadc.load(spark, dir)

    // a batch from the fit distribution (a corpus sample): not drifted
    val fresh = rows.filter(_._1 % 3 == 0).toDF("id", "emb")
    val ok = Ivfadc.driftCheck(loaded, dir, fresh, "id", "emb")
    ok.filter(col("cell").isNull).head().getAs[Boolean]("drifted") shouldBe false
    ok.filter(col("cell").isNotNull && col("drifted")).count() shouldBe 0L

    // a constant shift the frozen model never saw: rollup row flags,
    // and the flag decomposes to per-cell evidence
    val shifted = rows.map { case (id, e) => (id, e.map(_ + 3.0)) }.toDF("id", "emb")
    val bad = Ivfadc.driftCheck(loaded, dir, shifted, "id", "emb")
    bad.filter(col("cell").isNull).head().getAs[Boolean]("drifted") shouldBe true
    bad.filter(col("cell").isNotNull && col("drifted")).count() should be > 0L
  }

  test("re-save without fitVectors deletes the old baseline; a foreign stamped baseline fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfadc_refit").toString
    Ivfadc.save(index, dir, Some(rows.toDF("id", "emb")), "id", "emb")

    // a refit under different parameters is a different quantizer
    val refit = Ivfadc.fit(
      clustered, "id", "emb", coarseK = 4, coarseIters = 3, m = 4, pqK = 8, pqIters = 2)
    Ivfadc.modelId(refit) should not be Ivfadc.modelId(index)

    // a SAME-model re-persist without fitVectors (the append()-then-
    // save maintenance path) keeps its own valid baseline…
    Ivfadc.save(index, dir)
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "staleness")) shouldBe true
    Ivfadc.driftCheck(Ivfadc.load(spark, dir), dir, clustered, "id", "emb")
      .filter(col("cell").isNull).head().getAs[Boolean]("drifted") shouldBe false

    // …but re-saving the REFIT index over the same dir WITHOUT
    // fitVectors must remove the old model's baseline — driftCheck
    // then finds no baseline at all rather than silently gauging
    // against the wrong quantizer (the ADVICE-r11 hazard)
    Ivfadc.save(refit, dir)
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "staleness")) shouldBe false
    val loadedRefit = Ivfadc.load(spark, dir)
    // the model round-trips bit-identically, so so does its identity
    Ivfadc.modelId(loadedRefit) shouldBe Ivfadc.modelId(refit)
    an[Exception] should be thrownBy
      Ivfadc.driftCheck(loadedRefit, dir, clustered, "id", "emb").collect()

    // a stamped baseline restored from a DIFFERENT model's save (old
    // backup copied into the dir) fails the identity check loudly
    val dirA = java.nio.file.Files.createTempDirectory("graft_ivfadc_foreign").toString
    Ivfadc.save(index, dirA, Some(rows.toDF("id", "emb")), "id", "emb")
    Ivfadc.save(refit, dir, Some(clustered), "id", "emb")
    spark.read.parquet(s"$dirA/staleness")
      .write.mode("overwrite").parquet(s"$dir/staleness")
    val err = intercept[IllegalArgumentException] {
      Ivfadc.driftCheck(Ivfadc.load(spark, dir), dir, clustered, "id", "emb")
    }
    err.getMessage should include("different model")
  }

  test("an UNSTAMPED baseline is rejected loudly, not silently gauged against (r12 verdict #6)") {
    // save() has stamped every baseline since round 12, so a baseline
    // without model_id can only be a pre-stamp artifact or one staged
    // outside save() — both foreign to the loaded model's evidence.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfadc_unstamped").toString
    Ivfadc.save(index, dir, Some(rows.toDF("id", "emb")), "id", "emb")
    val stripped = spark.read.parquet(s"$dir/staleness").drop("model_id").localCheckpoint(true)
    stripped.write.mode("overwrite").parquet(s"$dir/staleness")
    val err = intercept[IllegalArgumentException] {
      Ivfadc.driftCheck(Ivfadc.load(spark, dir), dir, clustered, "id", "emb")
    }
    err.getMessage should include("no model_id stamp")
  }

  test("append ingests a new batch frozen-model: byte-identical to fit-encode, searches see both") {
    // fit on the first 7 coarse clusters only; cluster 7 is the "new
    // crawl batch" ingested by append against the frozen model
    val oldRows = rows.filter(_._1 < 420)
    val newRows = rows.filter(_._1 >= 420)
    val partial = Ivfadc.fit(
      oldRows.toDF("id", "emb"), "id", "emb",
      coarseK = 8, coarseIters = 5, m = 4, pqK = 16, pqIters = 3)
    val appended = Ivfadc.append(partial, newRows.toDF("id", "emb"), "id", "emb")
    // the model is untouched
    appended.coarse shouldBe partial.coarse
    appended.codebooks shouldBe partial.codebooks
    // appended rows carry exactly the (cell, codes) the frozen model
    // assigns: re-derive them directly from the model halves
    val direct = Ivfadc.append(
      partial.copy(
        cells = partial.cells.limit(0),
        enc = partial.enc.limit(0)),
      newRows.toDF("id", "emb"), "id", "emb")
    appended.cells.filter(col("id") >= 420).orderBy("id").collect() shouldBe
      direct.cells.orderBy("id").collect()
    appended.enc.filter(col("id") >= 420).orderBy("id", "sub").collect() shouldBe
      direct.enc.orderBy("id", "sub").collect()
    // a query anchored in the new batch finds new-batch neighbors
    // through the SAME scoring path as old vectors
    val q = Seq((9002L, rows.find(_._1 == 425).get._2))
    val hits = Ivfadc.search(appended, q, nprobe = 2, k = 5)
      .select(col("nid")).as[Long].collect()
    hits.count(_ >= 420) should be >= 4 // the new cluster dominates its own neighborhood
    // old corpus is untouched rows-wise
    appended.cells.count() shouldBe 480
    appended.enc.count() shouldBe 480 * 4
  }

  test("compact drops deleted ids from both halves; searches never return a deleted id") {
    val deleted = Seq(5L, 17L, 301L).toDF("id")
    val compacted = Ivfadc.compact(index, deleted, "id")
    // model untouched; staged halves lose exactly the deleted rows
    compacted.coarse shouldBe index.coarse
    compacted.codebooks shouldBe index.codebooks
    compacted.cells.count() shouldBe (index.cells.count() - 3)
    compacted.enc.count() shouldBe (index.enc.count() - 3 * 4)
    compacted.cells.filter(col("id").isin(5L, 17L, 301L)).count() shouldBe 0L
    // a search that DID return a deleted id before can't after — and
    // survivors keep their relative order (scoring is unchanged)
    val q = Seq((9100L, rows.find(_._1 == 5).get._2))
    val before = Ivfadc.search(index, q, nprobe = 2, k = 5)
      .select(col("nid")).as[Long].collect()
    before should contain(5L)
    val after = Ivfadc.search(compacted, q, nprobe = 2, k = 5)
      .select(col("nid")).as[Long].collect()
    after should not contain 5L
    after.filter(before.contains) shouldBe before.filter(after.contains)
    // the composition survives the staged round-trip: compact -> save
    // -> load keeps the cell-partitioned layout and the row drop
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfadc_compact").toString
    Ivfadc.save(compacted, dir)
    val reloaded = Ivfadc.load(spark, dir)
    reloaded.enc.filter(col("id").isin(5L, 17L, 301L)).count() shouldBe 0L
    reloaded.enc.count() shouldBe compacted.enc.count()
  }

  test("stalenessReport: fit-corpus baseline is reproduced; a drifted batch reads strictly worse") {
    val base = Ivfadc.stalenessReport(index, rows.toDF("id", "emb"), "id", "emb")
    val whole = base.filter(col("cell").isNull).head()
    whole.getAs[Long]("n_vectors") shouldBe 480L
    // the whole-batch mean equals the fit-time encode error exactly:
    // stalenessReport replays fit's encode half on the same vectors
    val fitErr = ProductQuant
      .encode(
        Ivfadc.residuals(index, rows.toDF("id", "emb"), "id", "emb"),
        "id", "e", index.codebooks)
      .groupBy(col("id")).agg(sum(col("sq_err")).as("e"))
      .agg(avg(col("e"))).head().getDouble(0)
    whole.getAs[Double]("mean_sq_err") shouldBe fitErr +- 1e-9
    // per-cell rows cover every populated cell and sum to the total
    val perCell = base.filter(col("cell").isNotNull)
    perCell.agg(sum(col("n_vectors"))).head().getLong(0) shouldBe 480L
    // drift: shift every vector by a constant the model never saw —
    // the frozen quantizer reconstructs it strictly worse
    val drifted = rows.map { case (id, e) => (id, e.map(_ + 0.9)) }.toDF("id", "emb")
    val dWhole = Ivfadc.stalenessReport(index, drifted, "id", "emb")
      .filter(col("cell").isNull).head()
    dWhole.getAs[Double]("mean_sq_err") should be > whole.getAs[Double]("mean_sq_err")
  }

  test("recall gate: flat PQ-ADC (q101's path, no coarse tier) recovers the L2 truth") {
    val k = 5
    // absolute-vector PQ needs enough codes to resolve subclusters
    // (8 clusters × 6 subclusters = 48 per-subspace patterns)
    val cbs = ProductQuant.fitCodebooks(clustered, "id", "emb", dims = 16, m = 4, k = 64, iters = 3)
    val enc = ProductQuant.encode(clustered, "id", "emb", cbs).select("id", "sub", "code")
    val adc = ProductQuant.adcTopK(qseq, enc, cbs, k)
    val r = recallAtK(adc, l2Truth(k), k)
    val contained = recallAtK(adc, l2Truth(9), k)
    info(s"pq-adc recall@5 -> $r, containment in truth@9 -> $contained")
    r should be >= 0.45
    contained should be >= 0.8
  }
}
