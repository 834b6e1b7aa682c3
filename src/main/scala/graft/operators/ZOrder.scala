package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout —
  * the clustering key that makes a 100 TB table prunable on SEVERAL
  * columns at once. Sorting (or `repartitionByRange`-ing) a table by
  * `zValue(dims)` places rows that are close in EVERY dimension into
  * the same file ranges, so a scan with predicates on any subset of
  * the dims touches a small fraction of files, where a single-column
  * sort only helps its leading column and arrival order helps nothing.
  * q115 measures exactly that: chunks touched by a 2-D box predicate
  * under arrival / single-column / z-order layouts.
  *
  * Pure integer bit math (shift, mask, or) — deterministic, portable
  * (DuckDB's `>> & |` replay it bit-for-bit), and codegen'd.
  */
object ZOrder {

  /** The Morton code of `dims`: bit b of dimension j lands at position
    * `b * dims.size + j`. Callers guarantee every value is an integer
    * in [0, 2^bits) — values at or above 2^bits would silently collide
    * with neighbors (pre-bucket wider domains; see q115's range
    * bucketing).
    */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "need at least one dimension")
    require(bits >= 1 && bits * dims.size <= 62, s"bits*dims must fit a long, got $bits*${dims.size}")
    val n = dims.size
    val terms = for {
      b <- 0 until bits
      (c, j) <- dims.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** `v` (in [lo, hi]) bucketed to an integer in [0, 2^bits) by value
    * range — exact integer math, the normalization step for wide
    * domains before [[zValue]].
    */
  def rangeBucket(v: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    // floor of a correctly-rounded double quotient equals integer
    // division for magnitudes < 2^53 (an exact-integer quotient is
    // itself representable), so this matches DuckDB's `//` bit-for-bit
    require(hi - lo < (1L << 40) && bits <= 12, "magnitudes must stay far below 2^53")
    rangeBucket(v, lit(lo), lit(hi), bits)
  }

  /** [[rangeBucket]] with data-derived bounds (the 1-row broadcast
    * stats pattern) — caller guarantees lo ≤ v ≤ hi and
    * (hi−lo+1)·2^bits ≪ 2^53 so the double quotient stays exact.
    */
  def rangeBucket(v: Column, lo: Column, hi: Column, bits: Int): Column =
    floor((v.cast("long") - lo) * lit(1L << bits) / (hi - lo + lit(1))).cast("long")
}
