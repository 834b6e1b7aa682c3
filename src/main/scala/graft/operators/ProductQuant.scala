package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jegou et al., 2011, "Product quantization
  * for nearest neighbor search"): split each embedding into `m`
  * contiguous subvectors and vector-quantize every subspace with its
  * own small k-means codebook. An embedding compresses to m small
  * codes (m bytes at k<=256 — 32x smaller than float64x64), and
  * asymmetric distance computation at query time is m table lookups.
  *
  * The 100 TB shape: each subspace fit is the [[KMeans]] iteration
  * (one posexplode -> partial-agg shuffle over a SLICE of the
  * corpus); encoding is map-side (the codebooks are driver literals,
  * like every quantizer here); nothing is all-pairs. Determinism:
  * the fit inherits KMeans' decimal-summed means and lowest-id init
  * per subspace, so codebooks — and therefore codes and
  * reconstruction errors — are bit-identical under any partitioning
  * and replayable in an external engine (q100's oracle unrolls the
  * per-subspace Lloyd iterations exactly like q52's).
  */
object ProductQuant {

  /** Distinguishes concurrent [[fitCodebooks]] calls' job groups so a
    * timeout cancel never reaches another fit's in-flight jobs.
    */
  private val fitGroupSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** One codebook per subspace: codebooks(s)(c) is centroid c of
    * subspace s. `dims` must divide evenly into `m` subspaces.
    *
    * Round-15 optimization note: a FUSED single-loop variant (one
    * (id, sub, slice) projection, one job per Lloyd round branching on
    * `sub`) was implemented, spec-pinned bit-identical, measured — and
    * REVERTED. A Lloyd round's job has a fixed scheduling/AQE cost that
    * dominates its work at any corpus size that fits a cell budget
    * (~250 ms measured with the kernel replaced by a constant; the
    * kernel itself is noise), so m·(2+iters) small CONCURRENT jobs
    * (this form — the pool below overlaps them, guide §2.6) beat
    * (2+iters) strictly sequential fused jobs in wall time: q100
    * 0.73 s threaded vs 1.22 s fused, q127 3.53 s vs 4.61 s at sf0.1.
    * Total bytes read per round are the same either way (each split
    * fit scans its own 1/m-sized persisted slice projection).
    */
  def fitCodebooks(
      df: DataFrame,
      idCol: String,
      embCol: String,
      dims: Int,
      m: Int,
      k: Int,
      iters: Int,
      dedupVectors: Boolean = false,
      fitTimeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(30, java.util.concurrent.TimeUnit.MINUTES)
  ): Seq[Seq[Seq[Double]]] = {
    require(m > 0 && dims % m == 0, s"dims=$dims must split into m=$m equal subspaces")
    val sub = dims / m
    // The m fits are independent driver-blocking Lloyd loops over
    // disjoint slice projections — run them as concurrent Spark job
    // groups instead of serially (each iteration is a small job whose
    // fixed scheduling cost would otherwise add up m-fold). Results
    // are deterministic per subspace, so concurrency cannot change
    // the codebooks. The pool is capped (each thread drives
    // cluster-wide jobs, so m=64 threads buys nothing past scheduler
    // saturation) and the await is bounded: a hung job surfaces as a
    // TimeoutException instead of blocking the caller forever.
    import scala.concurrent.{Await, ExecutionContext, Future}
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(m, 8))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    // Each subspace fit runs under its own job group so that on a
    // fitTimeout the in-flight Spark jobs are actually cancelled —
    // shutdownNow() only interrupts the driver threads, and the jobs
    // they launched would otherwise keep consuming the cluster as
    // orphans (round-15 advice). interruptOnCancel reaches a task
    // blocked inside a kernel, not just one between records.
    val sc = df.sparkSession.sparkContext
    val groupId = s"pq-fit-${fitGroupSeq.incrementAndGet()}"
    try {
      val fits = (0 until m).map { s =>
        Future {
          sc.setJobGroup(groupId, s"PQ codebook fit subspace $s", interruptOnCancel = true)
          try {
            val sl = df.select(
              col(idCol).as("_pqid"),
              slice(col(embCol), lit(s * sub + 1), lit(sub)).as("_pqes"))
            KMeans.fit(sl, "_pqid", "_pqes", k, iters, dedupVectors)
          } finally sc.clearJobGroup()
        }
      }
      try Await.result(Future.sequence(fits), fitTimeout)
      catch {
        case e: Throwable =>
          sc.cancelJobGroup(groupId)
          throw e
      }
    } finally pool.shutdownNow()
  }

  /** Sequential squared-L2 fold between an array column and its
    * chosen centroid — the exact arithmetic of KMeans' assignment
    * kernel (fold from 0.0 in dimension order), so reconstruction
    * errors replay bit-for-bit in the oracle.
    */
  private def sqErr(es: Column, centroid: Column): Column =
    aggregate(
      zip_with(es, centroid, (a, b) => (a - b) * (a - b)),
      lit(0.0),
      (acc, x) => acc + x)

  /** Encode every row: one output row per (vector, subspace) with the
    * assigned code and its reconstruction error.
    *
    * @return (id, sub: int, code: int, sq_err: double)
    */
  def encode(
      df: DataFrame,
      idCol: String,
      embCol: String,
      codebooks: Seq[Seq[Seq[Double]]]
  ): DataFrame = {
    val m = codebooks.size
    require(m > 0, "empty codebooks")
    val sub = codebooks.head.head.size
    val parts = codebooks.zipWithIndex.map { case (cb, s) =>
      val cbLit = array(cb.map(c => array(c.map(lit): _*)): _*)
      KMeans
        .assign(
          df.select(
            col(idCol).as("id"),
            slice(col(embCol), lit(s * sub + 1), lit(sub)).as("_es")),
          "_es",
          cb)
        .select(
          col("id"),
          lit(s).as("sub"),
          col("cell").as("code"),
          sqErr(col("_es"), element_at(cbLit, col("cell") + 1)).as("sq_err"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Asymmetric distance computation (ADC) — the search half of PQ:
    * approximate squared-L2 from a query to every encoded vector is
    * the sum over subspaces of the precomputed distance from the
    * query's subvector to the vector's ASSIGNED centroid. Per query
    * that is an m x k lookup table (driver-built, like every literal
    * quantizer here), and per corpus vector m table lookups — no
    * embedding is ever read at search time.
    *
    * Determinism: the per-(query, sub, code) entries fold
    * sequentially in dimension order, and the m per-subspace terms
    * add in FIXED subspace order (0..m-1), so ADC distances — and the
    * ranking — are bit-identical under any partitioning and replay in
    * the oracle.
    *
    * Scale shape: the distance-table DF is queries x m x k rows
    * (broadcast), the join against the (id, sub, code) codes table is
    * map-side, and the per-(query, vector) sum groups on the already
    * co-located id — one shuffle, then a per-query top-k window
    * (WindowGroupLimit-capped).
    *
    * @param queries collected driver-side: (qid, full embedding) —
    *                the SMALL side, like q40's brute-force query set
    * @param enc     [[encode]] output (id, sub, code)
    * @return (qid, rank, nid, adc_dist), rank 1..k per query
    */
  def adcTopK(
      queries: Seq[(Long, Seq[Double])],
      enc: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]],
      k: Int
  ): DataFrame = {
    val spark = enc.sparkSession
    import spark.implicits._
    val m = codebooks.size
    val sub = codebooks.head.head.size
    // driver-built distance tables: same fold as sqErr/the oracle
    def sqd(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val tdist = for {
      (qid, qemb) <- queries
      s <- 0 until m
      (cent, c) <- codebooks(s).zipWithIndex
    } yield (qid, s, c, sqd(qemb.slice(s * sub, (s + 1) * sub), cent))
    val tdf = broadcast(tdist.toDF("qid", "sub", "code", "_d"))
    scoreTables(tdf, enc, m, k)
  }

  /** ADC search with the distance tables built IN SPARK — the
    * many-query form. [[adcTopK]]'s driver loop builds |Q|·m·k table
    * entries on the driver, which is the right contract for a handful
    * of oracle-gated queries but a driver bottleneck at a production
    * batch of 10⁵–10⁶ queries. Here the queries stay a DataFrame: the
    * m·k codebook entries (the MODEL — a few KB) broadcast as rows,
    * each query row fans out against them map-side, and the
    * per-(query, sub, code) distance folds run in executors with the
    * exact arithmetic of the driver fold (sequential dimension-order
    * `(a-b)²` accumulation from 0.0 — bit-identical IEEE ops on
    * identical operands), so the two forms return byte-identical
    * rankings (pinned by ProductQuantSpec).
    *
    * Scale shape: table build is an embarrassingly-parallel broadcast
    * fan-out (no driver collect of the query set, no |Q|-sized
    * literal); scoring joins codes⋈tables on (sub, code) and groups
    * on (qid, nid) — inherently |Q|·N·m work, the exhaustive-ADC
    * cost. For a bounded search at corpus scale, route queries
    * through the IVFADC form (probed cells) instead; this operator is
    * the exact-scan half it shares.
    *
    * @param queries (qidCol: long, qembCol: array<double>) — any size
    * @param enc     [[encode]] output (id, sub, code)
    * @return (qid, rank, nid, adc_dist), rank 1..k per query
    */
  def adcTopKDf(
      queries: DataFrame,
      qidCol: String,
      qembCol: String,
      enc: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]],
      k: Int
  ): DataFrame = {
    val spark = enc.sparkSession
    import spark.implicits._
    val m = codebooks.size
    require(m > 0, "empty codebooks")
    val sub = codebooks.head.head.size
    val cb = codebooks.zipWithIndex.flatMap { case (cents, s) =>
      cents.zipWithIndex.map { case (cent, c) => (s, c, cent) }
    }.toDF("sub", "code", "_cent")
    val tdf = queries
      .select(col(qidCol).as("qid"), col(qembCol).as("_qemb"))
      .crossJoin(broadcast(cb))
      .select(
        col("qid"),
        col("sub"),
        col("code"),
        sqErr(slice(col("_qemb"), col("sub") * sub + 1, lit(sub)), col("_cent")).as("_d"))
    scoreTables(tdf, enc, m, k)
  }

  /** Shared ADC scoring: join codes against per-(qid, sub, code)
    * distance tables, pivot the m per-subspace terms into fixed
    * slots, and add them in EXPLICIT left-to-right subspace order —
    * never a SUM() aggregate, whose addition order is
    * partition-dependent — then take the per-query top-k
    * (rank filter directly on the window → WindowGroupLimit keeps the
    * sort map-side).
    */
  private def scoreTables(tdf: DataFrame, enc: DataFrame, m: Int, k: Int): DataFrame = {
    val terms = (0 until m).map(s => max(when(col("sub") === s, col("_d"))).as(s"_d$s"))
    val summed = enc
      .join(tdf, Seq("sub", "code"))
      .groupBy(col("qid"), col("id").as("nid"))
      .agg(terms.head, terms.tail: _*)
    val dist = (0 until m).foldLeft(lit(0.0)) { (acc, s) => acc + col(s"_d$s") }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("adc_dist"), col("nid"))
    summed
      .select(col("qid"), col("nid"), dist.as("adc_dist"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("adc_dist"))
  }
}
