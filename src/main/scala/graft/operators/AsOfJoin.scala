package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the nearest right row with the
  * same key at-or-before (backward, the default) or at-or-after
  * (forward) the left row's time, optionally within a tolerance.
  *
  * Backward is the batch form of go-fish's KV-enrichment pattern
  * (reference: cloudTrail_s2s_join.go:68-130 — build side `Set(key, v)`,
  * probe side `Get(key)` at event arrival, last value wins, probe-miss
  * passes through ⇒ left-outer semantics). Forward + tolerance complete
  * the standard as-of surface (next-event attribution, conversion lag).
  *
  * Spark-first design: instead of a per-key KV store probed row-by-row,
  * union both sides, shuffle ONCE by key, and sweep each key's timeline
  * with a running `last(ignoreNulls)` (backward) or `first(ignoreNulls)`
  * over the following frame (forward). Cost is a single shuffle +
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
    *                      (key, time) — without it, the winner between
    *                      simultaneous build rows is nondeterministic
    * @param direction     "backward" (nearest right at-or-before; last
    *                      write wins) or "forward" (nearest right
    *                      at-or-after; first write wins)
    * @param toleranceUs   max |left time − matched right time| (in the
    *                      cast-to-long time unit); matches further away
    *                      null out, preserving left-outer semantics
    *
    * At equal timestamps the build row always matches (the reference's
    * KV write happens at event arrival, before any later probe; the
    * forward mirror includes same-instant builds symmetrically). Output:
    * all left columns + one column per `rightVals` entry (null when no
    * right row qualifies).
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[(String, String)],
      tieBreak: String,
      rightTieBreak: Option[String] = None,
      direction: String = "backward",
      toleranceUs: Option[Long] = None
  ): DataFrame = {
    require(
      direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction"
    )
    val fwd = direction == "forward"
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
    val mtCol = fresh("_mt") // matched right time (tolerance check)
    val rvCol = rightVals.map { case (_, out) => out -> fresh(s"_rv_$out") }.toMap

    // Sort order must place build rows INSIDE the probe row's frame at
    // equal timestamps: backward frame ends at the current row, so build
    // sorts first; forward frame starts at the current row, so probe
    // sorts first.
    val (buildSide, probeSide) = if (fwd) (1, 0) else (0, 1)

    // The tie-break sorts as a string: it only has to make the order
    // deterministic, not meaningful.
    val lAligned = left.select(
      left.columns.map(col) ++
        Seq(
          col(leftTime).cast("long").as(tCol),
          lit(probeSide).as(sideCol),
          col(tieBreak).cast("string").as(tbCol),
          lit(null).cast("long").as(mtCol)
        ) ++
        rightVals.map { case (_, out) => lit(null).cast(rvType(out)).as(rvCol(out)) }: _*
    )
    val rTb = rightTieBreak.map(c => col(c).cast("string")).getOrElse(lit(null).cast("string"))
    val rAligned = right.select(
      left.columns.map(c =>
        if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)
      ) ++
        Seq(
          col(rightTime).cast("long").as(tCol),
          lit(buildSide).as(sideCol),
          rTb.as(tbCol),
          col(rightTime).cast("long").as(mtCol)
        ) ++
        rightVals.map { case (src, out) => col(src).as(rvCol(out)) }: _*
    )

    val ordered = Window.partitionBy(col(key)).orderBy(col(tCol), col(sideCol), col(tbCol))
    val w =
      if (fwd) ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def pick(c: Column): Column =
      if (fwd) first(c, ignoreNulls = true).over(w) else last(c, ignoreNulls = true).over(w)

    val swept = lAligned
      .unionByName(rAligned)
      .select(
        left.columns.map(col) ++ Seq(col(sideCol), col(tCol)) ++
          Seq(pick(col(mtCol)).as(mtCol)) ++
          rightVals.map { case (_, out) => pick(col(rvCol(out))).as(out) }: _*
      )
      .filter(col(sideCol) === probeSide)

    val gated = toleranceUs match {
      case None => swept
      case Some(tol) =>
        val gap = if (fwd) col(mtCol) - col(tCol) else col(tCol) - col(mtCol)
        val within = col(mtCol).isNotNull && gap <= tol
        swept.select(
          left.columns.map(col) ++ Seq(col(sideCol), col(tCol), col(mtCol)) ++
            rightVals.map { case (_, out) =>
              when(within, col(out)).otherwise(lit(null).cast(rvType(out))).as(out)
            }: _*
        )
    }
    gated.drop(sideCol, tCol, mtCol)
  }
}
