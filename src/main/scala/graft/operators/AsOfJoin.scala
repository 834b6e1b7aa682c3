package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row with
  * the same key whose time is <= the left row's time (last-write-wins).
  *
  * This is the batch form of go-fish's KV-enrichment pattern
  * (reference: cloudTrail_s2s_join.go:68-130 — build side `Set(key, v)`,
  * probe side `Get(key)` at event arrival, last value wins, probe-miss
  * passes through ⇒ left-outer semantics).
  *
  * Spark-first design: instead of a per-key KV store probed row-by-row,
  * union both sides, shuffle ONCE by key, and sweep each key's timeline
  * with a running `last(ignoreNulls)` window. Cost is a single shuffle +
  * per-partition sort — no O(n·m) probing, no driver-side state; state
  * stays on the executors so key cardinality can grow with the cluster.
  * The streaming equivalent lives in graft.streaming (flatMapGroupsWithState).
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side
    * @param key        equi-join column present in both sides
    * @param leftTime   ordering column on the left (e.g. epoch micros)
    * @param rightTime  same on the right
    * @param rightVals  (rightColumn, outputName) pairs carried to the output
    * @param tieBreak   left column making (key, time, tieBreak) unique
    *
    * Build rows sort before probe rows at equal timestamps (matching the
    * reference, where the KV write happens at event arrival, before any
    * later probe). Output: all left columns + one column per `rightVals`
    * entry (null when no right row precedes the left row).
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[(String, String)],
      tieBreak: String
  ): DataFrame = {
    val rvType = rightVals.map { case (src, out) => out -> right.schema(src).dataType }.toMap

    val lAligned = left.select(
      left.columns.map(col) ++
        Seq(col(leftTime).cast("long").as("_t"), lit(1).as("_side")) ++
        rightVals.map { case (_, out) => lit(null).cast(rvType(out)).as(s"_rv_$out") }: _*
    )
    val rAligned = right.select(
      left.columns.map(c =>
        if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)
      ) ++
        Seq(col(rightTime).cast("long").as("_t"), lit(0).as("_side")) ++
        rightVals.map { case (src, out) => col(src).as(s"_rv_$out") }: _*
    )

    val w = Window
      .partitionBy(col(key))
      .orderBy(col("_t"), col("_side"), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lAligned
      .unionByName(rAligned)
      .select(
        left.columns.map(col) ++ Seq(col("_side")) ++
          rightVals.map { case (_, out) =>
            last(col(s"_rv_$out"), ignoreNulls = true).over(w).as(out)
          }: _*
      )
      .filter(col("_side") === 1)
      .drop("_side")
  }
}
