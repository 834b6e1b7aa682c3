package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations at 100 TB.
  *
  * AQE's skew-join handling (on by default in GraftSession) covers
  * sort-merge joins; explicit salting remains necessary when one hot
  * key dominates a shuffle hash join or a groupBy — the classic
  * replicate-the-small-side / split-the-hot-key scheme:
  *
  *   big side:   salt ∈ [0, S) derived from a per-row hash
  *   small side: replicated S times, one copy per salt value
  *   join key:   (key, salt) — the hot key's rows spread over S tasks
  */
object Skew {

  /** Append a deterministic salt column in [0, buckets). Derived from
    * stable row content (`saltSource`), not rand(), so replays and
    * retries produce identical partitioning.
    */
  def salted(df: DataFrame, saltSource: Column, buckets: Int): DataFrame = {
    // buckets=0 would not error: pmod(x, 0) is null in non-ANSI mode,
    // so every row would salt to null and a salted join would silently
    // return ZERO rows. Fail fast instead.
    require(buckets >= 1, s"salt buckets must be >= 1, got $buckets")
    df.withColumn("_salt", pmod(xxhash64(saltSource), lit(buckets)).cast("int"))
  }

  /** Replicate each row `buckets` times with salt 0..buckets-1. */
  def replicated(df: DataFrame, buckets: Int): DataFrame = {
    require(buckets >= 1, s"salt buckets must be >= 1, got $buckets")
    df.withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
  }

  /** Skew-resistant equi-join: `big` join `small` on `key`, hot keys
    * spread over `buckets` tasks. Output columns = big ++ small (minus
    * the duplicate key), like a plain inner join on the key.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int, tieBreak: Column): DataFrame = {
    val b = salted(big, tieBreak, buckets)
    val s = replicated(small, buckets)
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-resistant aggregation: count per (key, salt), then
    * combine per key. The hot key's first-phase work spreads over
    * `buckets` tasks; the second shuffle carries one row per (key,
    * salt) — negligible.
    */
  def saltedCount(df: DataFrame, key: String, tieBreak: Column, buckets: Int): DataFrame =
    salted(df, tieBreak, buckets)
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n"))
}
