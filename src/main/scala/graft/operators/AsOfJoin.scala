package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

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

    // Tie-breaks sort in their NATIVE types: a lexicographic string
    // cast would invert numeric order ("9" > "10"), silently picking a
    // stale build row under the last-write-wins contract (and q22's
    // DuckDB oracle orders its int64 event_id ties numerically). Build
    // and probe tie-breaks may have different types, so each keeps its
    // own column; (t, side) never ties ACROSS sides, so within-side
    // ordering only ever consults that side's column.
    val ltbCol = fresh("_ltb")
    val rtbType = rightTieBreak.map(c => right.schema(c).dataType).getOrElse(StringType)
    val lAligned = left.select(
      left.columns.map(col) ++
        Seq(
          col(leftTime).cast("long").as(tCol),
          lit(probeSide).as(sideCol),
          lit(null).cast(rtbType).as(tbCol),
          col(tieBreak).as(ltbCol),
          lit(null).cast(rowType).as(rowCol)
        ): _*
    )
    val rTb = rightTieBreak.map(col).getOrElse(lit(null).cast(StringType))
    val rAligned = right.select(
      left.columns.map(c =>
        if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)
      ) ++
        Seq(
          col(rightTime).cast("long").as(tCol),
          lit(buildSide).as(sideCol),
          rTb.as(tbCol),
          lit(null).cast(left.schema(tieBreak).dataType).as(ltbCol),
          struct(
            col(rightTime).cast("long").as(mtField) +:
              rightVals.map { case (src, out) => col(src).as(out) }: _*
          ).as(rowCol)
        ): _*
    )

    val ordered =
      if (fwd)
        Window.partitionBy(col(key)).orderBy(col(tCol).desc, col(sideCol).desc, col(tbCol).desc, col(ltbCol).desc)
      else
        Window.partitionBy(col(key)).orderBy(col(tCol), col(sideCol), col(tbCol), col(ltbCol))
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

  /** Hot-key fallback: [[apply]] with the per-key timeline split into
    * fixed time bands of `bandUs` (same unit as the cast-to-long time
    * columns), so one key with 10⁸ events no longer serializes through
    * a single task — each (key, band) sweeps independently, and probes
    * whose nearest build row lives in an earlier (backward) / later
    * (forward) band resolve through per-band build summaries (ONE row
    * per non-empty (key, band) — bounded by time span / band, not by
    * data) with a recursive as-of on the band index. Result is
    * bit-identical to [[apply]] (AsOfJoinSpec pins equality), including
    * null-time rows, which both forms place at -infinity (banded via an
    * internal sentinel of Long.MinValue/2 — a real timestamp at exactly
    * that value FAILS FAST with a raise_error inside the normalization
    * expression, so the banded form can never silently diverge from
    * [[apply]]; the guard rides the existing projection, no extra
    * pass).
    *
    * Pick `bandUs` so a band of the hottest key fits a task (e.g. an
    * hour for ~10⁶ events/hour keys). Plain [[apply]] stays the right
    * call when no key is hot: it is one shuffle, this is three (events,
    * summaries, carry join).
    */
  def banded(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[(String, String)],
      tieBreak: String,
      rightTieBreak: Option[String] = None,
      direction: String = "backward",
      toleranceUs: Option[Long] = None,
      bandUs: Long = 3600000000L
  ): DataFrame = {
    require(bandUs > 0, s"bandUs must be positive, got $bandUs")
    val fwd = direction == "forward"

    val taken = (left.columns ++ right.columns).toSet ++ rightVals.map(_._2)
    def fresh(base: String): String = {
      var nm = base
      while (taken.contains(nm)) nm = "_" + nm
      nm
    }
    val bandCol = fresh("_band")
    val bkCol = fresh("_bk")
    val mtOut = fresh("_mt_out") // matched build time (normalized), null ⇔ no within-band match
    val ltN = fresh("_ltn")
    val rtN = fresh("_rtn")
    val cPfx = fresh("_carry_")

    // Null times: apply's sweep places a null-time row at -infinity in
    // BOTH directions (backward sorts asc with nulls first; forward
    // sorts desc with nulls last — either way "before every real
    // instant"). Band arithmetic cannot run on null, so both sides'
    // times normalize to a sentinel reproducing that ordering exactly;
    // the ORIGINAL times still drive the tolerance gate, where apply
    // parity demands that any comparison against a null time fails.
    // A real timestamp equal to the sentinel (Long.MinValue/2, year
    // ≈ -146,000) would be indistinguishable from null, so the
    // normalization raises instead of conflating — evaluated per row
    // inside the projection that was happening anyway.
    val sentinel = Long.MinValue / 2
    def normTime(t: Column): Column = {
      val c = t.cast("long")
      coalesce(
        when(
          c === lit(sentinel),
          raise_error(lit(
            s"AsOfJoin.banded: input time equals the internal null sentinel ($sentinel); " +
              "this value cannot be banded — shift the epoch or use AsOfJoin.apply"))
        ).otherwise(c),
        lit(sentinel)
      )
    }

    // Floor division in exact arithmetic: long `/` is a DOUBLE divide
    // in Spark and loses bits past 2^53 (epoch micros are bigger), so
    // the divisible numerator goes through decimal. pmod keeps
    // negative times rounding toward -∞ — band edges consistent
    // across zero.
    def floorDiv(t: Column): Column =
      ((t - pmod(t, lit(bandUs))).cast("decimal(38,0)") / lit(bandUs)).cast("long")

    val lb = left
      .withColumn(ltN, normTime(col(leftTime)))
      .withColumn(bandCol, floorDiv(col(ltN)))
    val rb = right
      .withColumn(rtN, normTime(col(rightTime)))
      .withColumn(bandCol, floorDiv(col(rtN)))
    val lk = lb.withColumn(bkCol, struct(col(key), col(bandCol)))
    val rk = rb.withColumn(bkCol, struct(col(key), col(bandCol)))

    // Pass 1: the ordinary sweep, partitioned by (key, band). The
    // matched build time rides along so "no match in this band" is
    // distinguishable from "matched a build row carrying nulls".
    // Tolerance is gated at the end, uniformly for both match paths.
    val within = apply(
      lk,
      rk,
      bkCol,
      ltN,
      rtN,
      rightVals :+ (rtN -> mtOut),
      tieBreak,
      rightTieBreak,
      direction,
      toleranceUs = None
    )

    // Pass 2: per-(key, band) build summaries — the band's winning row
    // under the same order the sweep uses (backward: last (t, tb);
    // forward: first (t, tb)).
    // Native-typed tie-break, matching the sweep's ordering exactly.
    val tb = rightTieBreak.map(col).getOrElse(lit(null).cast(StringType))
    val summaryRow = struct(
      col(rtN).as(mtOut) +:
        rightVals.map { case (src, out) => col(src).as(out) }: _*
    )
    val orderKey = struct(col(rtN), tb)
    val perBand = rb
      .groupBy(col(key), col(bandCol))
      .agg((if (fwd) min_by(summaryRow, orderKey) else max_by(summaryRow, orderKey)).as("_row"))
      .select(
        Seq(col(key), col(bandCol), col("_row").getField(mtOut).as(cPfx + mtOut)) ++
          rightVals.map { case (_, out) => col("_row").getField(out).as(cPfx + out) }: _*
      )

    // Pass 3: probes with no within-band match resolve to the nearest
    // earlier (later, forward) non-empty band — an as-of on the band
    // index over the tiny summary table. Shifting the probe band by ∓1
    // makes the match STRICTLY cross-band.
    val probeBands = within
      .filter(col(mtOut).isNull)
      .select(col(key), col(bandCol))
      .distinct()
      .withColumn("_qband", col(bandCol) + (if (fwd) lit(1L) else lit(-1L)))
    val carried = apply(
      probeBands,
      perBand,
      key,
      "_qband",
      bandCol,
      ((cPfx + mtOut) -> (cPfx + mtOut)) +: rightVals.map { case (_, out) => (cPfx + out, cPfx + out) },
      tieBreak = bandCol,
      rightTieBreak = None,
      direction = direction,
      toleranceUs = None
    ).drop("_qband")

    val merged = within.join(carried, Seq(key, bandCol), "left")
    val useWithin = col(mtOut).isNotNull
    val mtAll = coalesce(col(mtOut), col(cPfx + mtOut))
    val keep: Column = toleranceUs match {
      case None => mtAll.isNotNull
      case Some(tol) =>
        // apply parity: a tolerance comparison against a null time
        // always fails — a sentinel on either side means the original
        // time was null, so the gate rejects it outright.
        val gap = if (fwd) mtAll - col(ltN) else col(ltN) - mtAll
        mtAll.isNotNull && mtAll =!= sentinel && col(ltN) =!= sentinel && gap <= tol
    }
    merged.select(
      left.columns.map(col) ++
        rightVals.map { case (_, out) =>
          when(keep, when(useWithin, col(out)).otherwise(col(cPfx + out))).as(out)
        }: _*
    )
  }
}
