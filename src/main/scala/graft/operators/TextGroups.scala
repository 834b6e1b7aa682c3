package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Memoize per-document computations by DISTINCT text — adaptively.
  *
  * Crawled/near-dup corpora repeat the same text under many doc ids
  * (the sf1 soak: 4,992 distinct texts across 50k docs), so any
  * per-document value that is a pure function of the text — quality
  * scores, scrub hashes, n-gram stats, overlap against a broadcast
  * reference set — can be computed once per distinct text and joined
  * back per doc. This is the per-doc analogue of the dedupFirst
  * staging in [[Dedup]]/[[Similarity]]: work shrinks by the corpus
  * duplication factor.
  *
  * The memoized plan is NOT free: it shuffles (id, text) by the full
  * text key and joins the result back per doc. On a mostly-unique
  * corpus that is two wide exchanges bought for nothing — measurably
  * slower than just computing the kernel per row (the kernels are
  * codegen'd map-side expressions). So the plan choice is driven by
  * the corpus duplication factor, a one-time corpus-level stat:
  *
  *   - `spark.graft.text.memoize` = `auto` (default) | `always` | `never`
  *   - `spark.graft.text.memoizeMinDup` — auto's threshold on
  *     rows / approx-distinct-texts, default 2.0
  *
  * `auto` measures the factor with one narrow aggregate
  * (count + HyperLogLog approx distinct over the key column — a
  * map-side-partial scan, no shuffle of text bytes) and caches it per
  * (session, input plan) for the session's lifetime, mirroring how a
  * production deployment would persist the stat at ingest time and
  * pick plans from it (the CBO philosophy). Pipelines that know their
  * corpus pin `always`/`never` and skip the measurement.
  *
  * In direct (non-memoized) mode every document is its own singleton
  * group: `gid` = the doc id, group size 1, and the expansion join
  * degenerates to a projection. All downstream algebra — doc counts
  * as sums of `gsz`, rep-only ownership, inner-join drops — yields
  * bit-identical results in both modes (TextGroupsSpec pins this),
  * because document-level semantics are what both modes compute; the
  * grouped mode just shares work across equal texts.
  *
  * Correctness requires `perText` to be a pure function of its input
  * rows (it may close over corpus-level DataFrames — e.g. a reference
  * shingle set — as long as those don't depend on WHICH representative
  * was chosen). Group representatives are min(id) per text, so the
  * grouping is deterministic and partition-independent.
  */
object TextGroups {

  /** Session-lifetime cache of measured duplication factors: a WEAK
    * map per session (a static cache must not retain stopped
    * sessions), keyed inside by a high-fidelity STRING of the
    * canonicalized keyed input plan ([[planKey]]) — far beyond a
    * 32-bit hash, so two different corpora cannot realistically
    * collide into one cached factor, and a string key cannot reach
    * back to the session the way a LogicalPlan key would. (Retained
    * keys are one per distinct query shape per session — bounded.)
    *
    * Staleness is the accepted trade-off: data appended to the same
    * path mid-session keeps the first measured factor, exactly like a
    * warehouse's ingest-time statistics — and a stale factor can only
    * pick the slower of two OUTPUT-IDENTICAL plans, never change a
    * result. Pin `spark.graft.text.memoize` to sidestep measurement.
    */
  private val dupCache =
    new java.util.WeakHashMap[
      SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]]()

  private def sessionCache(s: SparkSession) = dupCache.synchronized {
    var m = dupCache.get(s)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
      dupCache.put(s, m)
    }
    m
  }

  /** Cache key for a canonicalized plan that does NOT reference the
    * plan object itself: a LogicalPlan leaf (LogicalRelation) strongly
    * references its SparkSession, so keying the inner map by the plan
    * would make the WeakHashMap VALUE reach its weak KEY — the
    * documented WeakHashMap failure mode — and stopped sessions would
    * never be collected. The string renders with maxFields =
    * Int.MaxValue (the default treeString truncates wide/deep plans
    * at spark.sql.debug.maxToStringFields, which could collide two
    * different inputs) and is SHA-256'd so a huge plan doesn't bloat
    * the key.
    */
  private def planKey(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): String = {
    val full = plan.treeString(
      /* verbose = */ true,
      /* addSuffix = */ false,
      /* maxFields = */ Int.MaxValue,
      /* printOperatorId = */ false,
      /* printOutputColumns = */ false)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
    val h = digest
      .digest(s"${plan.schema.catalogString}|$full".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_))
      .mkString
    s"${plan.semanticHash()}|$h"
  }

  /** rows / approx-distinct(textKey) — ≥ 1.0 on any non-empty input;
    * 1.0 on an empty one. Measured once per (session, input plan).
    * Batch inputs only — the caller guards streaming frames.
    *
    * The measurement job runs OUTSIDE any cache lock (get → measure →
    * putIfAbsent): a concurrent caller on the same plan may measure
    * twice, but never blocks other keys behind a running Spark job the
    * way computeIfAbsent's bin lock would.
    */
  def duplicationFactor(df: DataFrame, textKey: Column): Double = {
    val keyed = df.select(textKey.as("t"))
    val cache = sessionCache(df.sparkSession)
    val key = planKey(keyed.queryExecution.analyzed.canonicalized)
    val cached = cache.get(key)
    if (cached != null) cached.doubleValue()
    else {
      val row = keyed.agg(count(lit(1)), approx_count_distinct(col("t"))).head()
      val n = row.getLong(0)
      val factor = if (n == 0L) 1.0 else n.toDouble / math.max(row.getLong(1), 1L)
      val prev = cache.putIfAbsent(key, java.lang.Double.valueOf(factor))
      if (prev != null) prev.doubleValue() else factor
    }
  }

  /** The staging decision itself, exposed for the `dedupFirst`
    * variants in [[Dedup]]/[[Similarity]]: should a dedup-first /
    * memoized staging run for this input? Same confs, threshold,
    * measurement and cache as [[perDoc]]'s internal choice, so one
    * `spark.graft.text.memoize` setting steers every staging family
    * consistently. Pass the dedup key (text column, embedding hash,
    * …) as `key`.
    *
    * NOTE: under `memoize=auto` this is EAGER — the first call per
    * (session, input plan) runs the narrow measurement aggregate
    * immediately, at plan-construction time, not at execution. That
    * is deliberate (the factor chooses BETWEEN plans, so it must exist
    * before the plan does), but it means building a query can trigger
    * a small Spark job the caller never executes, and per-query wall
    * times attribute the first measurement to whichever query builds
    * first. Pipelines that care pre-warm via [[duplicationFactor]] or
    * pin `always`/`never`.
    */
  def adaptiveStaging(df: DataFrame, key: Column): Boolean = shouldMemoize(df, key)

  private def shouldMemoize(df: DataFrame, textKey: Column): Boolean = {
    // A streaming frame can neither run the measurement (no head() on
    // an unstarted stream) nor the grouped plan itself (the grouping
    // window is not a streaming operator) — direct mode is the only
    // executable form, under every conf setting.
    if (df.isStreaming) return false
    val conf = df.sparkSession.conf
    conf.getOption("spark.graft.text.memoize").getOrElse("auto") match {
      case "always" => true
      case "never"  => false
      case "auto" =>
        val minDup =
          conf.getOption("spark.graft.text.memoizeMinDup").map(_.toDouble).getOrElse(2.0)
        duplicationFactor(df, textKey) >= minDup
      case other =>
        throw new IllegalArgumentException(
          s"spark.graft.text.memoize must be auto|always|never, got '$other'")
    }
  }

  /** Parallelism floor for heavy per-row kernels over small
    * unsplittable scans (round-15 optimization). Parquet cannot split
    * below a row group, so a small corpus arrives as one-or-few scan
    * partitions and every downstream map-side kernel (tokenize,
    * n-gram explode, HOF folds) runs near-serially no matter how many
    * cores the session has — guide §2.5's "one huge unsplittable
    * file" case in miniature (measured: q133's trigram stream spent
    * 3.4 s of single-task stages on a 32-core local session). When
    * the input plans to fewer than half the session's default
    * parallelism, hash-repartition it by the caller's key
    * (deterministic under task retries — never rand()-derived); when
    * the input is already parallel (production scale: thousands of
    * row groups), this is the IDENTITY — no shuffle is added. The
    * repartition moves the text bytes once, paid only at call sites
    * whose per-row work dominates that copy by orders of magnitude.
    *
    * Batch inputs only (callers guard streaming frames): inspecting
    * the planned partition count forces physical planning, which is
    * driver-only work for the scan-shaped inputs this is applied to.
    */
  def fanOut(df: DataFrame, key: Column): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    val planned = df.queryExecution.toRdd.getNumPartitions
    if (planned * 2 <= target) df.repartition(target, key) else df
  }

  /** Compute `perText` once per distinct text and expand per doc.
    *
    * @param df      source rows
    * @param idCol   unique id column name
    * @param textKey grouping expression (e.g. `col("text")` or
    *                `lower(trim(col("text")))`) — exposed to `perText`
    *                as column `t`
    * @param perText (gid, t) representatives → gid-keyed result; rows
    *                it drops are dropped for every doc of that text
    *                (inner-join expansion)
    * @return one row per surviving doc: `idCol` plus `perText`'s
    *         non-gid columns
    */
  /** @param fanOutReps apply the [[fanOut]] parallelism floor to the
    *        representatives (default). Callers whose `perText` kernel
    *        is CHEAP (one array pass, a few scalar ops) opt out: for
    *        them the repartition costs more than the kernel saves —
    *        measured on q38/q93 (+0.2–0.35 s each at sf0.1).
    */
  def perDoc(df: DataFrame, idCol: String, textKey: Column, fanOutReps: Boolean = true)(
      perText: DataFrame => DataFrame): DataFrame =
    perDocWithSizes(df, idCol, textKey, fanOutReps)((reps, _) => perText(reps))

  /** The grouping prelude alone — for callers whose EXPANSION is not
    * [[perDoc]]'s plain inner join (novelty's rep-only ownership, pair
    * expansion in the fuzzy-dedup queries). Returns
    * `members` (gid, idCol) and `reps` (gid, t); the grouping rule
    * (representative = min id per distinct key) lives only here. In
    * direct mode both are projections of `df` (singleton groups).
    * `idCol` must not itself be named `t` (the key alias).
    */
  def prelude(
      df: DataFrame,
      idCol: String,
      textKey: Column,
      fanOutReps: Boolean = true): (DataFrame, DataFrame) = {
    val (members, reps, _) = preludeWithSizes(df, idCol, textKey, fanOutReps)
    (members, reps)
  }

  /** [[prelude]] plus per-group sizes (gid, gsz), all three derived
    * from ONE exchange in grouped mode (the sizes ride the same window
    * pass as the representative choice). Public for staged queries
    * whose document-frequency math needs the sizes relation directly
    * (e.g. df(gram) = sum of gsz over the groups containing it).
    */
  def preludeWithSizes(
      df: DataFrame,
      idCol: String,
      textKey: Column,
      fanOutReps: Boolean = true
  ): (DataFrame, DataFrame, DataFrame) = {
    require(idCol != "t", "idCol 't' collides with the grouping-key alias")
    if (!shouldMemoize(df, textKey)) {
      val members = df.select(col(idCol).as("gid"), col(idCol))
      // reps feeds the caller's heavy per-text kernels — floor its
      // parallelism (identity when the scan is already parallel)
      val reps0 = df.select(col(idCol).as("gid"), textKey.as("t"))
      val reps = if (fanOutReps) fanOut(reps0, col("gid")) else reps0
      val sizes = df.select(col(idCol).as("gid"), lit(1L).as("gsz"))
      (members, reps, sizes)
    } else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("t")
      val withGid = df
        .select(col(idCol), textKey.as("t"))
        .withColumn("gid", min(col(idCol)).over(w))
        .withColumn("gsz", count(lit(1)).over(w))
      val members = withGid.select(col("gid"), col(idCol))
      val repRows = withGid.filter(col(idCol) === col("gid"))
      val reps = repRows.select(col("gid"), col("t"))
      val sizes = repRows.select(col("gid"), col("gsz"))
      (members, reps, sizes)
    }
  }

  /** Like [[perDoc]] but `perText` also receives the group sizes
    * (gid, gsz) — needed when the per-text value depends on corpus
    * document counts (e.g. "how many DOCS contain this n-gram" =
    * sum of gsz over the groups containing it). In direct mode every
    * group is a singleton (gsz = 1) and the expansion join disappears
    * entirely — the result is `perText` applied per document.
    */
  def perDocWithSizes(
      df: DataFrame,
      idCol: String,
      textKey: Column,
      fanOutReps: Boolean = true)(
      perText: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    require(idCol != "t", "idCol 't' collides with the grouping-key alias")
    if (!shouldMemoize(df, textKey)) {
      // reps feeds the caller's heavy per-text kernels — floor its
      // parallelism (identity when the scan is already parallel)
      val reps0 = df.select(col(idCol).as("gid"), textKey.as("t"))
      val reps = if (fanOutReps) fanOut(reps0, col("gid")) else reps0
      val sizes = df.select(col(idCol).as("gid"), lit(1L).as("gsz"))
      val out = perText(reps, sizes)
      val rest = out.columns.filterNot(_ == "gid").map(col)
      out.select(col("gid").as(idCol) +: rest: _*)
    } else {
      val (members0, reps, sizes) = preludeWithSizes(df, idCol, textKey, fanOutReps)
      val members = members0.withColumnRenamed(idCol, "_mid")
      val perRep = perText(reps, sizes)
      members
        .join(perRep, "gid")
        .drop("gid")
        .withColumnRenamed("_mid", idCol)
    }
  }
}
