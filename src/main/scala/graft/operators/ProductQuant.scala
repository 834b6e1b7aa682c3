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

  /** One codebook per subspace: codebooks(s)(c) is centroid c of
    * subspace s. `dims` must divide evenly into `m` subspaces.
    */
  def fitCodebooks(
      df: DataFrame,
      idCol: String,
      embCol: String,
      dims: Int,
      m: Int,
      k: Int,
      iters: Int,
      dedupVectors: Boolean = false
  ): Seq[Seq[Seq[Double]]] = {
    require(m > 0 && dims % m == 0, s"dims=$dims must split into m=$m equal subspaces")
    val sub = dims / m
    (0 until m).map { s =>
      val sl = df.select(
        col(idCol).as("_pqid"),
        slice(col(embCol), lit(s * sub + 1), lit(sub)).as("_pqes"))
      KMeans.fit(sl, "_pqid", "_pqes", k, iters, dedupVectors)
    }
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
}
