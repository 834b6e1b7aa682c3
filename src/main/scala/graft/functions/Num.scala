package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic numeric helpers.
  *
  * Double aggregation order differs between engines (and between Spark
  * partitionings of the same data!), so any aggregate that must be
  * hash-comparable against an external oracle — or even against a rerun
  * of the same job with a different partition count — is computed in
  * exact decimal arithmetic and only cast to double at the very end.
  * This also makes results stable under AQE re-partitioning at scale.
  */
object Num {

  /** Exact-decimal view of a double column (4 fractional digits covers
    * every numeric column in the corpus, which is generated with ≤2).
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Deterministic sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic average: exact decimal sum divided (in IEEE double)
    * by the count — both operands identical across engines, hence the
    * quotient is too. count(c), not count(*): sum() skips nulls, so the
    * divisor must too or a nullable column silently averages low.
    */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(c)

  /** Deterministic sum of `price * (1 - discount)`-style products:
    * both factors are cast to exact decimals before multiplying, keeping
    * the whole computation exact until the final cast. Both factors get
    * the full (18,4) range — a narrower cast on the second factor would
    * overflow |b| >= 1e4 to null and silently DROP that row from the sum.
    */
  def dsumProduct(a: Column, b: Column): Column =
    sum(dec(a) * dec(b)).cast("double")
}
