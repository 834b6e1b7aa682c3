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

  /** @param left          probe side
    * @param right         build side
    * @param key           equi-join column present in both sides
    * @param leftTime      ordering column on the left (e.g. epoch micros)
    * @param rightTime     same on the right
    * @param rightVals     (rightColumn, outputName) pairs carried to the output
    * @param tieBreak      left column making (key, time, tieBreak) unique
    * @param rightTieBreak right column ordering build rows with equal
    *                      (key, time) — without it, last-write-wins between
    *                      simultaneous build rows is nondeterministic
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
      tieBreak: String,
      rightTieBreak: Option[String] = None
  ): DataFrame = {
    val rvType = rightVals.map { case (src, out) => out -> right.schema(src).dataType }.toMap

    // Internal helper columns must not shadow user columns; grow a "_"
    // prefix until the name is fresh on both sides.
    val taken = (left.columns ++ right.columns).toSet
    def fresh(base: String): String = {
      var nm = base
      while (taken.contains(nm)) nm = "_" + nm
      nm
    }
    val tCol = fresh("_t")
    val sideCol = fresh("_side")
    val tbCol = fresh("_tb")
    val rvCol = rightVals.map { case (_, out) => out -> fresh(s"_rv_$out") }.toMap

    // The tie-break sorts as a string: it only has to make the order
    // deterministic, not meaningful.
    val lAligned = left.select(
      left.columns.map(col) ++
        Seq(
          col(leftTime).cast("long").as(tCol),
          lit(1).as(sideCol),
          col(tieBreak).cast("string").as(tbCol)
        ) ++
        rightVals.map { case (_, out) => lit(null).cast(rvType(out)).as(rvCol(out)) }: _*
    )
    val rTb = rightTieBreak.map(c => col(c).cast("string")).getOrElse(lit(null).cast("string"))
    val rAligned = right.select(
      left.columns.map(c =>
        if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)
      ) ++
        Seq(col(rightTime).cast("long").as(tCol), lit(0).as(sideCol), rTb.as(tbCol)) ++
        rightVals.map { case (src, out) => col(src).as(rvCol(out)) }: _*
    )

    val w = Window
      .partitionBy(col(key))
      .orderBy(col(tCol), col(sideCol), col(tbCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lAligned
      .unionByName(rAligned)
      .select(
        left.columns.map(col) ++ Seq(col(sideCol)) ++
          rightVals.map { case (_, out) =>
            last(col(rvCol(out)), ignoreNulls = true).over(w).as(out)
          }: _*
      )
      .filter(col(sideCol) === 1)
      .drop(sideCol)
  }
}
