package graft.operators

/** Driver-side power iteration for the d×d (co)variance matrix that a
  * distributed exact aggregation produced (q118) — bounded work like
  * the k-means centroid loop. Fold order is pinned (ascending index,
  * 0.0-seeded) because the DuckDB oracle mirrors each dot product and
  * norm with an identically-ordered list_reduce; change the order and
  * the hash gate breaks.
  */
object PowerIteration {

  /** (dominant eigenvector after `iters` steps from the all-ones
    * start, Rayleigh-quotient eigenvalue).
    */
  def topComponent(m: Array[Array[Double]], iters: Int): (Array[Double], Double) = {
    val d = m.length
    require(d > 0 && m.forall(_.length == d), "matrix must be square")
    require(iters >= 1, "need at least one iteration")
    def matVec(vec: Array[Double]): Array[Double] =
      m.map { row =>
        var acc = 0.0
        var j = 0
        while (j < d) { acc += row(j) * vec(j); j += 1 }
        acc
      }
    var v = Array.fill(d)(1.0)
    for (_ <- 0 until iters) {
      val w = matVec(v)
      var nrm = 0.0
      var i = 0
      while (i < d) { nrm += w(i) * w(i); i += 1 }
      val sq = math.sqrt(nrm)
      v = w.map(_ / sq)
    }
    val wf = matVec(v)
    var num = 0.0
    var den = 0.0
    var i = 0
    while (i < d) { num += v(i) * wf(i); den += v(i) * v(i); i += 1 }
    (v, num / den)
  }
}
