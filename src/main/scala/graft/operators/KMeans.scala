package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an embedding column — the coarse
  * quantizer that turns [[Similarity.cellTopK]] from "blocked ANN over
  * a semantic key" into classic IVF (inverted-file) search: fit k
  * centroids, assign every vector to its nearest centroid's cell,
  * search only within the query's cell.
  *
  * Determinism (so runs and engines agree without an RNG protocol):
  *   - init = the k vectors with the lowest ids (k-means++ would need
  *     seeded randomness; for IVF coarse quantization the init barely
  *     matters, convergence does);
  *   - per-dimension means are summed as DECIMAL(28,12), not double —
  *     double summation order varies with partitioning, and a 1-ulp
  *     centroid wiggle can flip a boundary vector's cell assignment.
  *
  * Scale shape: each iteration is ONE shuffle — posexplode to
  * (cell, dim, value), partial-agg sums map-side, k·dims rows reach the
  * driver (k=256 coarse cells × 1024 dims = 256k doubles — trivial).
  * The corpus never concentrates anywhere; only centroids do.
  */
object KMeans {

  /** Squared L2 distance between an embedding column and a literal
    * centroid (sequential fold — deterministic per row).
    */
  private def sqDist(emb: Column, centroid: Seq[Double]): Column =
    aggregate(
      zip_with(emb, typedLit(centroid), (x, c) => (x - c) * (x - c)),
      lit(0.0),
      (acc, d) => acc + d
    )

  /** Index (0-based) of the nearest centroid, ties to the lowest index.
    * Codegen'd kernel (graft.expressions.NearestCellExpr): one JVM call
    * per row instead of k interpreted folds (equality with the
    * declarative form is property-tested).
    */
  def nearestCell(emb: Column, centroids: Seq[Seq[Double]]): Column =
    graft.expressions.TextHashExprs.nearestCell(emb, centroids)

  /** Declarative reference form of [[nearestCell]] (test anchor). */
  def nearestCellDeclarative(emb: Column, centroids: Seq[Seq[Double]]): Column = {
    val dists = array(centroids.map(c => sqDist(emb, c)): _*)
    // array_position returns the FIRST match (1-based) — lowest-index tie-break.
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Fit k centroids with `iters` Lloyd iterations.
    *
    * @param df     corpus
    * @param idCol  unique id (init determinism)
    * @param embCol array<double> embedding column
    * @return centroid matrix, row c = centroid of cell c. Cells left
    *         empty by an iteration keep their previous centroid.
    */
  /** @param dedupVectors collapse exact-duplicate embeddings to one
    *         row weighted by multiplicity before iterating —
    *         bit-identical centroids: the weighted per-dimension mean
    *         `sum(v·w)/sum(w)` over distinct vectors equals the direct
    *         `sum(v)/count` over all rows EXACTLY because both sides
    *         stay in decimal arithmetic end-to-end (v casts to
    *         decimal(28,12) in BOTH modes, w to decimal(9,0): the
    *         product is exactly decimal(38,12) — no precision cap, so
    *         scale 12 is never rounded — and both sums reach the same
    *         decimal(38,12) before the one division by a bigint).
    *         Multiplicities >= 1e9 are rejected up front rather than
    *         silently overflowing. Init is unchanged (the k lowest-id
    *         ROWS of the original corpus).
    *         Equality is property-pinned in KMeansSpec; embedding
    *         tables from crawled corpora duplicate heavily (the sf1
    *         soak: 2,000 distinct vectors across 20k rows), and every
    *         iteration's explode+shuffle shrinks by that factor.
    */
  def fit(
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      iters: Int,
      dedupVectors: Boolean = false
  ): Seq[Seq[Double]] = {
    // Every iteration and the init scan the corpus — cache it for the
    // duration of the fit (spill-safe) instead of re-reading parquet
    // iters+1 times. The cached projection inherits the SCAN's
    // partitioning, and a small unsplittable corpus arrives as one
    // parquet row group — every Lloyd iteration's assignment kernel
    // (nearestCell over k centroids × dims) would then run on ONE task
    // regardless of session cores (measured: 250 ms/iteration serial
    // at sf0.1, ×(iters+1) per fit, ×every fit in the IVFADC family) —
    // so floor the parallelism before persisting (TextGroups.fanOut:
    // identity at production scale, guide §2.5). Safe on values: the
    // per-dimension means are exact decimal sums (order-independent)
    // and init is an explicit orderBy(_id).
    val corpusAll = df.select(col(idCol).as("_id"), col(embCol).as("_emb"))
    val corpus = TextGroups
      .fanOut(
        if (dedupVectors)
          corpusAll
            .groupBy(col("_emb"))
            .agg(min(col("_id")).as("_id"), count(lit(1)).as("_w"))
            .select(col("_id"), col("_emb"), col("_w"))
        else corpusAll.withColumn("_w", lit(1L)),
        col("_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Ragged embeddings would otherwise fail deep inside an iteration
    // (mean lookup for a dimension no row produced) while nearestCell
    // silently truncates — validate uniform length up front instead.
    val dims = corpus
      .agg(min(size(col("_emb"))).as("lo"), max(size(col("_emb"))).as("hi"), max(col("_w")).as("w"))
      .head
    require(!dims.isNullAt(0), "k-means needs a non-empty corpus with non-null embeddings")
    require(
      dims.getInt(0) == dims.getInt(1),
      s"ragged embedding lengths: min=${dims.getInt(0)}, max=${dims.getInt(1)} — " +
        "k-means needs a uniform dimensionality"
    )
    // The weighted mean keeps the v·w product at exactly decimal(38,12)
    // by holding w to 9 integer digits — enforce it loudly instead of
    // letting a silent decimal overflow null out a centroid dimension.
    require(
      dims.getLong(2) < 1000000000L,
      s"dedupVectors: a single embedding repeats ${dims.getLong(2)} times (>= 1e9) — " +
        "beyond the weighted mean's exact-decimal range"
    )

    // Init reads the ORIGINAL rows either way — "the k vectors with
    // the lowest ids" must not change when duplicates collapse.
    var centroids: Seq[Seq[Double]] = (if (dedupVectors) corpusAll else corpus)
      .orderBy("_id")
      .limit(k)
      .select("_emb")
      .collect()
      .map(_.getSeq[Double](0).toSeq)
      .toSeq
    require(centroids.size == k, s"k=$k but corpus has only ${centroids.size} rows")

    for (_ <- 1 to iters) {
      val rows = corpus
        .select(
          nearestCell(col("_emb"), centroids).as("_cell"),
          col("_w"),
          posexplode(col("_emb")).as(Seq("_dim", "_v")))
      val agged =
        if (dedupVectors)
          // decimal(28,12) matches the direct path's value domain
          // (|v| < 1e16) so both modes overflow — or don't — together;
          // w at decimal(9,0) keeps the product at exactly (38,12)
          // (28+9+1 = 38: no precision cap, no scale rounding). The
          // multiplicity bound is validated up front.
          rows
            .groupBy(col("_cell"), col("_dim"))
            .agg((sum(col("_v").cast("decimal(28,12)") * col("_w").cast("decimal(9,0)")) /
              sum(col("_w"))).cast("double").as("_mean"))
        else
          rows
            .groupBy(col("_cell"), col("_dim"))
            .agg((sum(col("_v").cast("decimal(28,12)")) / count(lit(1))).cast("double").as("_mean"))
      val means = agged
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
        .toMap
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (means.contains((c, 0))) old.indices.map(d => means((c, d))) else old
      }
    }
    corpus.unpersist()
    centroids
  }

  /** Add a `cell` column: the vector's nearest-centroid index. */
  def assign(df: DataFrame, embCol: String, centroids: Seq[Seq[Double]]): DataFrame =
    df.withColumn("cell", nearestCell(col(embCol), centroids))

  /** Multi-probe assignment — classic IVF `nprobe`: each row explodes
    * to its `nprobe` NEAREST centroid indices (ties to the lower
    * index), so a query joined on `cell` searches ~nprobe/k of the
    * corpus instead of 1/k, trading proportional work for recall. Use
    * on the QUERY side of [[Similarity.cellTopK]] (the corpus keeps
    * its single nearest cell); dedupe ranked results per query across
    * probes downstream — cellTopK's rank window does this naturally
    * since a (qid, nid) pair can only meet in nid's one home cell.
    *
    * Declarative (k folds per row) rather than a codegen kernel: it
    * runs on the small probe side, never the corpus.
    */
  def assignProbes(
      df: DataFrame,
      embCol: String,
      centroids: Seq[Seq[Double]],
      nprobe: Int
  ): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroids.size,
      s"nprobe must be in [1, ${centroids.size}], got $nprobe")
    // (dist, idx) structs sort by distance then index — slice the
    // nprobe head and keep the indices.
    val scored = sort_array(
      array(centroids.zipWithIndex.map { case (c, i) =>
        struct(sqDist(col(embCol), c).as("d"), lit(i).as("i"))
      }: _*))
    df.withColumn("cell", explode(transform(slice(scored, 1, nprobe), s => s.getField("i"))))
  }

  /** Driver-side twin of [[assignProbes]] for an already-collected
    * query vector: the nprobe nearest centroid indices, ties to the
    * lower index, computed with the same sequential squared-L2 fold —
    * parity with the DataFrame form is spec-pinned, so a driver-built
    * search table (IVFADC's per-probe ADC tables, q102) probes exactly
    * the cells the distributed assignment would.
    */
  def nearestCells(emb: Seq[Double], centroids: Seq[Seq[Double]], nprobe: Int): Seq[Int] = {
    require(nprobe >= 1 && nprobe <= centroids.size,
      s"nprobe must be in [1, ${centroids.size}], got $nprobe")
    def sqd(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    centroids.indices
      .map(i => (sqd(emb, centroids(i)), i))
      .sorted
      .take(nprobe)
      .map(_._2)
  }
}
