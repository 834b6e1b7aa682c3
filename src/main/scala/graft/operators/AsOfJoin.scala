package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
  * with a running `last(ignoreNulls)`. Forward reuses the SAME O(n)
  * running frame over a time-reversed sort — an
  * (currentRow, unboundedFollowing) frame would recompute the aggregate
  * per row, O(n²) on a hot key. The matched right row travels as ONE
  * struct, so its value and its timestamp (used by the tolerance gate
  * and by Resample.interpolate) always come from the same row, even
  * when carried values are null. Cost is a single shuffle + sort; no
  * driver-side state, so key cardinality grows with the cluster. The
  * streaming equivalent lives in graft.streaming (flatMapGroupsWithState).
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
    * forward mirror includes same-instant builds symmetrically). The
    * nearest build ROW wins even if a carried value is null — row
    * identity, not value presence, decides the match. Output: all left
    * columns + one column per `rightVals` entry (null when no right row
    * qualifies).
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
    val rowCol = fresh("_rrow") // the whole matched right row, atomically
    // The struct's time field must not collide with a rightVals output
    // name (getField by name would be ambiguous).
    val mtField = {
      var nm = "_mt"
      while (rightVals.exists(_._2 == nm)) nm = "_" + nm
      nm
    }

    val rowType = StructType(
      StructField(mtField, LongType) +:
        rightVals.map { case (_, out) => StructField(out, rvType(out)) }
    )

    // Sort order must place build rows INSIDE the probe row's running
    // frame at equal timestamps. Backward scans time ascending (build
    // side 0 sorts before probe side 1); forward scans time DESCENDING
    // with the same unboundedPreceding..currentRow frame (build side 1
    // sorts before probe side 0 under desc) — both directions are an
    // O(n) running sweep.
    val (buildSide, probeSide) = if (fwd) (1, 0) else (0, 1)

    // The tie-break sorts as a string: it only has to make the order
    // deterministic, not meaningful.
    val lAligned = left.select(
      left.columns.map(col) ++
        Seq(
          col(leftTime).cast("long").as(tCol),
          lit(probeSide).as(sideCol),
          col(tieBreak).cast("string").as(tbCol),
          lit(null).cast(rowType).as(rowCol)
        ): _*
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
          struct(
            col(rightTime).cast("long").as(mtField) +:
              rightVals.map { case (src, out) => col(src).as(out) }: _*
          ).as(rowCol)
        ): _*
    )

    val ordered =
      if (fwd)
        Window.partitionBy(col(key)).orderBy(col(tCol).desc, col(sideCol).desc, col(tbCol).desc)
      else
        Window.partitionBy(col(key)).orderBy(col(tCol), col(sideCol), col(tbCol))
    val w = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val swept = lAligned
      .unionByName(rAligned)
      .select(
        left.columns.map(col) ++ Seq(
          col(sideCol),
          col(tCol),
          last(col(rowCol), ignoreNulls = true).over(w).as(rowCol)
        ): _*
      )
      .filter(col(sideCol) === probeSide)

    val matched: Column = toleranceUs match {
      case None => col(rowCol)
      case Some(tol) =>
        val mt = col(rowCol).getField(mtField)
        val gap = if (fwd) mt - col(tCol) else col(tCol) - mt
        when(col(rowCol).isNotNull && gap <= tol, col(rowCol))
    }
    swept.select(
      left.columns.map(col) ++
        rightVals.map { case (_, out) => matched.getField(out).as(out) }: _*
    )
  }
}
