package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection (Achlioptas 2003 sign
  * variant) — embedding compression for the ANN family: project
  * d-dim vectors onto k ≪ d dimensions with a ±1 matrix; pairwise
  * distances are preserved within (1±ε) for k = O(log n / ε²), so
  * brute-force and IVF searches can run on the small vectors first
  * and refine on the originals (q116 measures the distortion).
  *
  * The projection matrix is a DETERMINISTIC function of (row, col) —
  * the sign is the parity of the first md5 hex digit of "i#j" — so it
  * is a literal constant in every engine (the q104 query-set pattern:
  * Scala computes it once, the oracle embeds the same signs), never a
  * runtime random. Projection itself is a map-side fold in fixed slot
  * order (the hash-portability guard), no UDF, no shuffle.
  */
object RandomProjection {

  /** Sign (+1/-1) of matrix cell (i, j): parity of md5("i#j")'s first
    * hex digit. Plain JVM md5 — the matrix is operator configuration,
    * not data-path work.
    */
  def sign(i: Int, j: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val h = d.digest(s"$i#$j".getBytes("UTF-8"))
    if (((h(0) >> 4) & 1) == 0) 1 else -1
  }

  /** Column for projected dimension `j`: Σ_i x_i·sign(i,j) / √k,
    * folded in ascending-i order.
    *
    * HOF form (zip_with the literal sign row, then a sequential
    * aggregate fold — the [[Similarity.dot]] posture) rather than a
    * d-term unrolled expression: the unrolled fold built a ~2,000-node
    * tree across the k projected dimensions whose optimize+codegen
    * cost dominated q116's wall clock (~0.8 s of driver gap measured
    * at sf0.1 against ~0.2 s of job time). The fold ORDER and the
    * per-element ops (cast to double, multiply by the ±1 literal, add
    * in ascending-i sequence from 0.0) are identical, so projected
    * values are bit-for-bit unchanged (spec-pinned against the
    * unrolled form).
    */
  def projectDim(emb: Column, d: Int, k: Int, j: Int): Column = {
    val signs = typedLit((0 until d).map(i => sign(i, j).toDouble))
    val s = aggregate(
      zip_with(slice(emb, 1, d), signs, (x, sg) => x.cast("double") * sg),
      lit(0.0),
      (acc, v) => acc + v)
    s / sqrt(lit(k.toDouble))
  }

  /** The pre-round-16 unrolled-fold form of [[projectDim]] — kept as
    * the bit-equality test anchor (RandomProjectionSpec pins the HOF
    * form against it).
    */
  private[graft] def projectDimUnrolled(emb: Column, d: Int, k: Int, j: Int): Column = {
    val s = (0 until d).foldLeft(lit(0.0)) { (acc, i) =>
      acc + element_at(emb, i + 1).cast("double") * lit(sign(i, j).toDouble)
    }
    s / sqrt(lit(k.toDouble))
  }

  /** All k projected dimensions as one array column. */
  def project(emb: Column, d: Int, k: Int): Column =
    array((0 until k).map(j => projectDim(emb, d, k, j)): _*)
}
