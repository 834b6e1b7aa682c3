package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Pinned.PinOps

/** IVFADC (Jegou et al. 2011, §V): the production ANN index. A
  * trained coarse quantizer routes each vector to a cell; the
  * RESIDUAL to the cell centroid is product-quantized; a query
  * searches only its `nprobe` nearest cells with per-cell ADC tables
  * built from its own residual. Candidate work scales with
  * nprobe·(N/cells)·m — never cross-cell, never the raw embeddings.
  *
  * Extracted from q102's inline pipeline (the query keeps its exact
  * arithmetic — coarse fit with decimal sums, elementwise residual
  * subtraction, fixed-subspace-order ADC sums — so the refactor is
  * hash-invariant vs the DuckDB replay). Two search forms:
  *
  *  - [[search]]: the q40-style driver-Seq query contract — right for
  *    a handful of oracle-gated queries; tables built on the driver.
  *  - [[searchDf]]: the many-query form — queries stay a DataFrame,
  *    probe selection and per-(query, cell) residual tables are
  *    computed in executors against the broadcast model (coarse
  *    centroids + codebooks, a few KB of literals), so a 10⁵–10⁶
  *    query batch never funnels through the driver. Bit-equality
  *    with [[search]] is spec-pinned (IvfadcSpec).
  */
object Ivfadc {

  /** A fitted index. `cells` (id, cell) and `enc` (id, sub, code —
    * plus cell once [[load]]ed from the cell-partitioned staged
    * table) are the persisted halves at production scale; `coarse`
    * and `codebooks` are the model — driver literals, like every
    * quantizer here. [[save]]/[[load]] are the offline/online split:
    * fit once, persist, then any number of search sessions load the
    * staged tables without touching the raw embeddings again.
    */
  final case class Index(
      coarse: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]],
      cells: DataFrame,
      enc: DataFrame,
      dims: Int)

  /** Persist a fitted index under `dir`: the two data-sized halves as
    * parquet, BOTH partitioned by cell — `cells/` natively, `enc/` by
    * joining each row's cell on before the write. Cell-partitioned
    * enc is what makes the staged index probe-prunable end to end: a
    * loaded index's enc carries the cell column, [[score]] then joins
    * candidates on (cell, sub, code) directly (no corpus-wide id-join
    * to re-attach cells), and dynamic partition pruning restricts the
    * enc scan to the probed cells' files instead of the whole encoded
    * corpus. The model (coarse centroids + codebooks + dims) is one
    * small JSON file. Doubles round-trip exactly: the JSON writer
    * prints the shortest decimal that parses back to the same IEEE
    * bits, so a loaded index is bit-identical to the fitted one
    * (spec-pinned).
    */
  def save(index: Index, dir: String): Unit = save(index, dir, None)

  /** As [[save]], additionally writing the index's FIT-TIME staleness
    * baseline under `$dir/staleness` when the fit vectors are passed:
    * [[stalenessReport]] over the corpus the model was trained on,
    * staged next to the index so every future ingest batch has the
    * reference to drift-check against ([[driftCheck]]) without the
    * caller having to remember to snapshot it. Pass the SAME
    * (idCol, embCol) frame the index was [[fit]] on.
    *
    * The baseline is stamped with [[modelId]] and, when `fitVectors`
    * is None, an existing `$dir/staleness` is KEPT only if its stamp
    * matches this index's model (a same-model re-persist, e.g. after
    * [[append]]) and deleted otherwise — so re-saving a refit index
    * over an old dir can never leave a previous quantizer's baseline
    * in place for [[driftCheck]] to silently gauge against (it either
    * finds no baseline, or a stamped one it verifies).
    */
  def save(
      index: Index,
      dir: String,
      fitVectors: Option[DataFrame],
      idCol: String = "id",
      embCol: String = "e"): Unit = {
    index.cells.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
    withCell(index).write.mode("overwrite").partitionBy("cell").parquet(s"$dir/enc")
    val spark = index.enc.sparkSession
    import spark.implicits._
    val model = ModelJson(index.dims, index.coarse, index.codebooks)
    // one-row dataset → one small JSON file next to the staged tables
    Seq(model).toDS().coalesce(1).write.mode("overwrite").json(s"$dir/model")
    fitVectors match {
      case Some(v) =>
        stalenessReport(index, v, idCol, embCol)
          .withColumn("model_id", lit(modelId(index)))
          .write.mode("overwrite").parquet(s"$dir/staleness")
      case None =>
        // Delete a staged baseline ONLY if it is not verifiably this
        // model's: a routine re-persist of the SAME model (e.g. after
        // append()) must not destroy its own valid baseline, but a
        // REFIT saved over an old dir must not leave the previous
        // quantizer's in place. Unstamped or unreadable baselines are
        // deleted too — a loud missing-baseline beats a wrong verdict.
        val p = new org.apache.hadoop.fs.Path(s"$dir/staleness")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) {
          val sameModel =
            try {
              val baseline = spark.read.parquet(s"$dir/staleness")
              baseline.columns.contains("model_id") && {
                val expected = modelId(index)
                val found =
                  baseline.select(col("model_id")).distinct().collect().map(_.getString(0))
                found.nonEmpty && found.forall(_ == expected)
              }
            } catch { case scala.util.control.NonFatal(_) => false }
          if (!sameModel) { fs.delete(p, true); () }
        }
    }
  }

  /** Deterministic identity of the model half — MD5 over dims plus the
    * IEEE-754 bits of every coarse-centroid and codebook coordinate in
    * declaration order. Two indexes share a modelId iff they quantize
    * identically, so a staleness baseline stamped with it is
    * verifiably the LOADED model's baseline (the re-save-over-old-dir
    * hazard [[save]] documents).
    */
  def modelId(index: Index): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(8)
    def put(d: Double): Unit = {
      buf.clear()
      buf.putLong(java.lang.Double.doubleToLongBits(d))
      md.update(buf.array())
    }
    buf.clear(); buf.putLong(index.dims.toLong); md.update(buf.array())
    index.coarse.foreach(_.foreach(put))
    index.codebooks.foreach(_.foreach(_.foreach(put)))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Batch-vs-baseline drift gauge — the executable maintenance loop:
    * run each ingest batch's [[stalenessReport]] against the fit-time
    * baseline [[save]]d under `$dir/staleness` and flag cells whose
    * mean reconstruction error grew past `ratioThreshold`×. One row
    * per cell either side touched, plus the rollup row (cell = null =
    * whole batch vs whole fit corpus). `drifted` is the decision bit:
    *   - batch error ratio > threshold → true (distribution drift or
    *     a stale cell — refit, the pinned policy);
    *   - the batch routes vectors into a cell the fit corpus never
    *     exercised → true (the model has no evidence there);
    *   - a baseline cell the batch never touched → false (nothing
    *     new to judge).
    * Sketch-sized: both sides are ≤ cells+1 rows; the only data-sized
    * work is the batch encode inside stalenessReport.
    */
  def driftCheck(
      index: Index,
      dir: String,
      batch: DataFrame,
      idCol: String,
      embCol: String,
      ratioThreshold: Double = 2.0): DataFrame = {
    val spark = index.enc.sparkSession
    val baseline = spark.read.parquet(s"$dir/staleness")
    // The baseline must be verifiably THIS model's: a refit index
    // re-saved over an old dir without fitVectors deletes the stale
    // baseline (save's None arm), but a baseline staged by some other
    // writer / an older copy restored into the dir would gauge drift
    // against a different quantizer — fail loudly instead of
    // verdicting wrong. Since round 12 save() always stamps, so an
    // UNSTAMPED baseline is itself a foreign artifact (pre-stamp era
    // or hand-staged) and is rejected the same way, closing the
    // silent pre-stamp blind spot (round-12 verdict #6).
    require(
      baseline.columns.contains("model_id"),
      s"staleness baseline at $dir/staleness has no model_id stamp (pre-stamp era or " +
        "staged outside save()) — refit and re-save with fitVectors to restage it")
    val expected = modelId(index)
    // sketch-sized read: the baseline is ≤ cells+1 rows
    val found = baseline.select(col("model_id")).distinct().collect().map(_.getString(0))
    require(
      found.forall(_ == expected),
      s"staleness baseline at $dir/staleness was written by a different model " +
        s"(baseline model_id ${found.mkString(",")}, loaded index $expected) — " +
        "refit and re-save with fitVectors to restage it")
    driftJoin(
      baseline.drop("model_id"),
      stalenessReport(index, batch, idCol, embCol),
      ratioThreshold)
  }

  /** The compare/flag half of [[driftCheck]], on two report frames
    * directly — (cell, n_vectors, mean_sq_err) each, rollup row
    * included. Public so callers holding both reports (q127's
    * oracle-gated drift query; a monitoring job diffing two batches)
    * reuse the exact decision logic the staged-baseline path runs.
    */
  def driftJoin(
      baselineReport: DataFrame,
      batchReport: DataFrame,
      ratioThreshold: Double): DataFrame = {
    val baseline = baselineReport.select(
      col("cell").as("_bcell"),
      col("n_vectors").as("baseline_n"),
      col("mean_sq_err").as("baseline_mean_sq_err"))
    val rep = batchReport.select(
      col("cell").as("_rcell"),
      col("n_vectors").as("batch_n"),
      col("mean_sq_err").as("batch_mean_sq_err"))
    baseline
      // null-safe on cell: the rollup rows (cell null) pair up too
      .join(rep, baseline("_bcell") <=> rep("_rcell"), "full_outer")
      .select(
        coalesce(col("_bcell"), col("_rcell")).as("cell"),
        col("baseline_n"),
        col("baseline_mean_sq_err"),
        col("batch_n"),
        col("batch_mean_sq_err"),
        (col("batch_mean_sq_err") / col("baseline_mean_sq_err")).as("err_ratio"))
      .withColumn(
        "drifted",
        when(col("batch_n").isNull, lit(false))
          .when(col("baseline_mean_sq_err").isNull, lit(true))
          .otherwise(col("err_ratio") > ratioThreshold))
  }

  /** Load a [[save]]d index. The staged halves come back as plain
    * parquet scans — enc keeps its cell partition column, so a probed
    * search's (cell, sub, code) join partition-prunes BOTH tables
    * instead of recomputing the fit; the model literals come back
    * bit-identical.
    */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Index = {
    import spark.implicits._
    val model = spark.read
      .json(s"$dir/model")
      // inference reads integral fields as bigint; cast to the case
      // class's shapes explicitly (a bigint→int downcast is not an
      // implicit encoder upcast)
      .select(
        col("dims").cast("int").as("dims"),
        col("coarse").cast("array<array<double>>").as("coarse"),
        col("codebooks").cast("array<array<array<double>>>").as("codebooks"))
      .as[ModelJson]
      .head()
    Index(
      coarse = model.coarse,
      codebooks = model.codebooks,
      cells = spark.read.parquet(s"$dir/cells").select(col("id"), col("cell").cast("int")),
      enc = spark.read
        .parquet(s"$dir/enc")
        .select(col("id"), col("sub"), col("code"), col("cell").cast("int")),
      dims = model.dims)
  }

  /** enc with each row's cell attached. A fit/append-produced enc is
    * (id, sub, code) — the cell comes from the id-join; a loaded enc
    * already carries the cell partition column and skips the join.
    */
  private def withCell(index: Index): DataFrame =
    if (index.enc.columns.contains("cell")) index.enc
    else index.enc.join(index.cells, "id").select(col("id"), col("sub"), col("code"), col("cell"))

  private case class ModelJson(
      dims: Int,
      coarse: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]])

  /** Ingest a new vector batch into a fitted index WITHOUT refitting —
    * the daily-crawl path at production scale: the model (coarse
    * centroids + codebooks) is frozen, so ingestion is two map-side
    * stages per new vector (nearest-cell assignment, then residual PQ
    * encoding against broadcast literals) and an append of staged
    * rows; the existing corpus is never touched or re-encoded. The
    * arithmetic is exactly [[fit]]'s encode half, so a vector ingested
    * by append carries the same (cell, codes) it would have received
    * from a fit that shared the model — byte-equality with the
    * fit-encode is spec-pinned (IvfadcSpec), and searches see old and
    * new vectors through one identical scoring path.
    *
    * Quantization drift is the documented trade-off: a model fitted on
    * last month's distribution quantizes a shifted batch with more
    * error (monitor per-batch mean sq_err from [[ProductQuant.encode]]
    * and refit when it degrades — the standard IVF maintenance loop).
    *
    * @param batch (idCol: long, embCol: array<double>) — ids must be
    *              new (exact-dedup upstream); same dims as the index
    */
  def append(index: Index, batch: DataFrame, idCol: String, embCol: String): Index = {
    val (cells, encPlain) = encodeBatchPlain(index, batch, idCol, embCol)
    // match the index's enc shape: a loaded enc carries its cell
    // partition column, so the appended rows attach theirs too (the
    // batch's own cell table — batch-sized join, never corpus-sized);
    // a fit-produced enc is (id, sub, code) and skips the join
    val enc =
      if (index.enc.columns.contains("cell")) attachCell(encPlain, cells)
      else encPlain
    index.copy(
      cells = index.cells.unionByName(cells),
      enc = index.enc.unionByName(enc))
  }

  /** The frozen-model encoding of a new batch — exactly the rows
    * [[append]] unions in, exposed for ingest paths that PERSIST them
    * (the staged/streaming delta form) instead of holding them in
    * memory. Returns (cells = (id, cell), enc = (id, sub, code, cell));
    * the cell attach is a batch-sized join, never corpus-sized.
    */
  def encodeBatch(
      index: Index,
      batch: DataFrame,
      idCol: String,
      embCol: String): (DataFrame, DataFrame) = {
    val (cells, encPlain) = encodeBatchPlain(index, batch, idCol, embCol)
    (cells, attachCell(encPlain, cells))
  }

  private def encodeBatchPlain(
      index: Index,
      batch: DataFrame,
      idCol: String,
      embCol: String): (DataFrame, DataFrame) = {
    val res = residuals(index, batch, idCol, embCol)
    val cells = res.select(col("id"), col("cell"))
    val encPlain = ProductQuant
      .encode(res.select(col("id"), col("e")), idCol = "id", embCol = "e",
        codebooks = index.codebooks)
      .select(col("id"), col("sub"), col("code"))
    (cells, encPlain)
  }

  private def attachCell(encPlain: DataFrame, cells: DataFrame): DataFrame =
    encPlain.join(cells, "id").select(col("id"), col("sub"), col("code"), col("cell"))

  /** Drop deleted ids from both staged halves — the delete side of the
    * maintenance loop ([[append]] is the insert side). The model is
    * untouched (removing vectors can't invalidate codes, only leave
    * the quantizer slightly stale — [[stalenessReport]] is the gauge
    * for that), so compaction is two anti-joins; a following [[save]]
    * rewrites the staged tables, which is the intended cadence:
    * accumulate a deletion batch, compact, rewrite — never a per-row
    * delete. Searches off the compacted index can never return a
    * deleted id (its enc rows are gone, not masked).
    *
    * @param deletedIds one id per row, any extra columns ignored
    */
  def compact(index: Index, deletedIds: DataFrame, idCol: String): Index = {
    val del = deletedIds.select(col(idCol).as("id"))
    index.copy(
      cells = index.cells.join(del, Seq("id"), "left_anti"),
      enc = index.enc.join(del, Seq("id"), "left_anti"))
  }

  /** Quantization-error report for a vector batch under the FROZEN
    * model — the executable form of append's "monitor per-batch mean
    * sq_err and refit when it degrades". Encodes the batch exactly as
    * [[append]] would (nearest cell, residual PQ) and aggregates the
    * per-vector reconstruction error (Σ over subspaces of the chosen
    * code's squared residual distance) per cell, with a rollup total
    * (cell = null row). Run it on each ingest batch and compare
    * against the fit-time corpus baseline (same call over the
    * original vectors, saved by the caller next to the index): a
    * rising mean is distribution drift, a single hot cell rising is a
    * cell gone stale — either way the answer is a refit, which is the
    * pinned maintenance policy (refit-from-scratch; there is no
    * incremental re-train, by design — the model is driver literals).
    * Cost: two map-side stages over the batch + one sketch-sized agg;
    * never touches the staged corpus tables.
    *
    * @return (cell, n_vectors, mean_sq_err, max_sq_err); cell null =
    *         whole batch
    */
  def stalenessReport(index: Index, batch: DataFrame, idCol: String, embCol: String): DataFrame = {
    val res = residuals(index, batch, idCol, embCol)
    // Exact-decimal error accumulation (the functions.Num rationale):
    // unordered double sums vary in their last bits with partitioning,
    // so a drift threshold sitting near the boundary could flip
    // between reruns of the SAME batch under AQE re-planning. Decimal
    // sums are order-independent — the report is a stable gauge
    // (rounding at 1e-12, far below any drift signal).
    val dec = org.apache.spark.sql.types.DecimalType(38, 12)
    ProductQuant
      .encode(res.select(col("id"), col("e")), idCol = "id", embCol = "e",
        codebooks = index.codebooks)
      .groupBy(col("id"))
      .agg(sum(col("sq_err").cast(dec)).as("_err"))
      .join(res.select(col("id"), col("cell")), "id")
      .rollup(col("cell"))
      .agg(
        count(lit(1)).as("n_vectors"),
        (sum(col("_err")).cast("double") / count(lit(1))).as("mean_sq_err"),
        max(col("_err")).cast("double").as("max_sq_err"))
  }

  /** The frozen-model encode prelude shared by [[append]] and
    * [[stalenessReport]]: nearest-cell assignment + residual against
    * the assigned centroid. Returns (id, cell, e = residual). Two
    * map-side stages against broadcast model literals.
    */
  def residuals(index: Index, batch: DataFrame, idCol: String, embCol: String): DataFrame = {
    val base = batch.select(col(idCol).as("id"), col(embCol).as("e"))
    val cells = KMeans.assign(base, "e", index.coarse)
    val centLit = array(index.coarse.map(c => array(c.map(lit): _*)): _*)
    cells.select(
      col("id"),
      col("cell"),
      zip_with(col("e"), element_at(centLit, col("cell") + 1), (a, b) => a - b).as("e"))
  }

  /** Fit coarse + residual-PQ quantizers and encode the corpus.
    *
    * @param e (idCol: long, embCol: array<double>)
    */
  def fit(
      e: DataFrame,
      idCol: String,
      embCol: String,
      coarseK: Int,
      coarseIters: Int,
      m: Int,
      pqK: Int,
      pqIters: Int
  ): Index = {
    // Floor the scan's parallelism once at fit entry (identity at
    // production scale): every per-row kernel downstream — the coarse
    // assignment, the residual subtraction, the PQ encode — otherwise
    // runs near-serially over a small unsplittable corpus scan
    // (guide §2.5; the coarse KMeans.fit floors its own persisted
    // projection, but `cells`/`res`/`enc` read THIS frame).
    val base = TextGroups.fanOut(
      e.select(col(idCol).as("id"), col(embCol).as("e")), col("id"))
    val adaptive = TextGroups.adaptiveStaging(base, xxhash64(col("e")))
    val coarse = KMeans.fit(base, idCol = "id", embCol = "e", k = coarseK, iters = coarseIters,
      dedupVectors = adaptive)
    val cells = KMeans.assign(base, "e", coarse)
    val centLit = array(coarse.map(c => array(c.map(lit): _*)): _*)
    // localCheckpoint, not persist: the residual projection feeds the
    // m codebook fits, the adaptive measure and the encoder; a
    // CacheManager persist would pin an entry per fit forever, while
    // checkpoint blocks free when the RDD is collected (q102's
    // round-7 leak fix).
    val res = cells
      .select(
        col("id"),
        zip_with(col("e"), element_at(centLit, col("cell") + 1), (a, b) => a - b).as("e"),
        col("cell"))
      .pinned
    // dims from the coarse centroids already on the driver (init
    // centroids ARE corpus rows, and KMeans.fit validated uniform
    // lengths) — the previous embeddingDims() head() was one more
    // scheduled job per fit for a value we already hold.
    val dims = coarse.head.size
    val cbs = ProductQuant.fitCodebooks(
      res, idCol = "id", embCol = "e", dims = dims, m = m, k = pqK, iters = pqIters,
      dedupVectors = TextGroups.adaptiveStaging(res, xxhash64(col("e"))))
    val enc = ProductQuant
      .encode(res, idCol = "id", embCol = "e", codebooks = cbs)
      .select(col("id"), col("sub"), col("code"))
    Index(coarse, cbs, cells.select(col("id"), col("cell")), enc, dims)
  }

  /** Probed ADC search with driver-built tables — the small-query-set
    * contract (tables are |Q|·nprobe·m·k driver entries).
    *
    * @param excludeSelf drop candidates whose corpus id equals the
    *                    query id — the self-query contract (q102's
    *                    queries ARE corpus vectors, so the trivial
    *                    distance-0 self-match is noise). Pass `false`
    *                    when qids live in a namespace independent of
    *                    corpus ids, or an unlucky collision silently
    *                    loses that (often nearest) neighbor.
    * @return (qid, rank, nid, cell, adc_dist), rank 1..k per query
    */
  def search(
      index: Index,
      queries: Seq[(Long, Seq[Double])],
      nprobe: Int,
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    val spark = index.enc.sparkSession
    import spark.implicits._
    val m = index.codebooks.size
    val sub = index.dims / m
    def sqd(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val tdist = for {
      (qid, qemb) <- queries
      // nprobe nearest coarse cells, ties to the lower cell — the
      // assignProbes / ROW_NUMBER(dist, cell) order (parity spec-pinned)
      cell <- KMeans.nearestCells(qemb, index.coarse, nprobe)
      qres = qemb.zip(index.coarse(cell)).map { case (x, y) => x - y }
      s <- 0 until m
      (cent, c) <- index.codebooks(s).zipWithIndex
    } yield (qid, cell, s, c, sqd(qres.slice(s * sub, (s + 1) * sub), cent))
    val tdf = broadcast(tdist.toDF("qid", "cell", "sub", "code", "_d"))
    // the probed cells are known on the driver here — hand them to
    // score as a STATIC partition filter (guaranteed pruning on a
    // loaded cell-partitioned enc, no reliance on dynamic pruning)
    score(index, tdf, m, k, excludeSelf, probeCells = Some(tdist.map(_._2).distinct))
  }

  /** Probed ADC search with tables built IN SPARK — the many-query
    * form. Probe selection replays [[KMeans.assignProbes]] (same
    * (dist, cell) sort-struct order), residuals and per-(query, cell,
    * sub, code) distances fold in executors with the driver fold's
    * exact arithmetic, so results are byte-identical to [[search]].
    *
    * @param queries (qidCol: long, qembCol: array<double>) — any size
    * @param excludeSelf see [[search]]: defaults to the self-query
    *                    contract; pass `false` for external query ids
    */
  def searchDf(
      index: Index,
      queries: DataFrame,
      qidCol: String,
      qembCol: String,
      nprobe: Int,
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    val spark = index.enc.sparkSession
    import spark.implicits._
    val m = index.codebooks.size
    val sub = index.dims / m
    val probed = KMeans
      .assignProbes(
        queries.select(col(qidCol).as("qid"), col(qembCol).as("_qemb")),
        "_qemb",
        index.coarse,
        nprobe)
    val centLit = array(index.coarse.map(c => array(c.map(lit): _*)): _*)
    val qres = probed.select(
      col("qid"),
      col("cell"),
      zip_with(col("_qemb"), element_at(centLit, col("cell") + 1), (a, b) => a - b).as("_qres"))
    val cb = index.codebooks.zipWithIndex.flatMap { case (cents, s) =>
      cents.zipWithIndex.map { case (cent, c) => (s, c, cent) }
    }.toDF("sub", "code", "_cent")
    def sqErr(es: Column, centroid: Column): Column =
      aggregate(
        zip_with(es, centroid, (a, b) => (a - b) * (a - b)),
        lit(0.0),
        (acc, x) => acc + x)
    val tdf = qres
      .crossJoin(broadcast(cb))
      .select(
        col("qid"),
        col("cell"),
        col("sub"),
        col("code"),
        sqErr(slice(col("_qres"), col("sub") * sub + 1, lit(sub)), col("_cent")).as("_d"))
    // For a LOADED (cell-partitioned) enc, collect the batch's distinct
    // probed cells — bounded by the model's cell count, the same size
    // class as the coarse-centroid literals — so the enc scan prunes
    // statically; the price is one extra map pass over the query batch
    // (assignProbes re-runs for the distinct-cells job), tiny next to
    // scanning unprobed corpus partitions. A fit-built in-memory index
    // has no partitioned layout to prune, so it skips the extra job.
    val probeCells: Option[Seq[Int]] =
      if (index.enc.columns.contains("cell"))
        Some(probed.select(col("cell").cast("int")).distinct().as[Int].collect().toSeq)
      else None
    score(index, tdf, m, k, excludeSelf, probeCells)
  }

  /** Shared probed-ADC scoring: candidates are the encoded vectors of
    * the probed cells only (the (cell, sub, code) join key restricts
    * to them), per-subspace terms pivot into fixed slots and add in
    * explicit subspace order, and the rank filter sits directly on
    * the window (WindowGroupLimit keeps the top-k map-side).
    */
  private def score(
      index: Index,
      tdf: DataFrame,
      m: Int,
      k: Int,
      excludeSelf: Boolean,
      probeCells: Option[Seq[Int]] = None): DataFrame = {
    // Semantically the (cell, sub, code) join already restricts
    // candidates to the probed cells; the explicit isin filter exists
    // so a cell-partitioned (loaded) enc scan partition-prunes at
    // LISTING time — files of unprobed cells are never read
    // (IvfadcSpec pins files-read < total cell dirs).
    val encWithCell = probeCells match {
      case Some(cs) => withCell(index).filter(col("cell").isin(cs.map(Int.box): _*))
      case None     => withCell(index)
    }
    val terms = (0 until m).map(x => max(when(col("sub") === x, col("_d"))).as(s"_d$x"))
    val summed = encWithCell
      .join(tdf, Seq("cell", "sub", "code"))
      .groupBy(col("qid"), col("id").as("nid"), col("cell"))
      .agg(terms.head, terms.tail: _*)
    val dist = (0 until m).foldLeft(lit(0.0)) { (acc, x) => acc + col(s"_d$x") }
    val w = Window.partitionBy(col("qid")).orderBy(col("adc_dist"), col("nid"))
    summed
      .select(col("qid"), col("nid"), col("cell"), dist.as("adc_dist"))
      .filter(if (excludeSelf) col("qid") =!= col("nid") else lit(true))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cell"), col("adc_dist"))
  }
}
