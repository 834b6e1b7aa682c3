package graft

import org.apache.spark.sql.SparkSession

/** Perf harness: one JSON line with per-query wall seconds at the
  * SPARK_GRAFT_SF_DIR scale factor.
  *
  * Measurement honesty:
  *   - results go to the `noop` sink, not `.count()` — count() lets the
  *     optimizer prune every computed column and can reduce a query to
  *     a bare scan;
  *   - a warmup query runs first so JVM/codegen/scan-cache startup cost
  *     is not charged to whichever query happens to run first;
  *   - queries run in sorted name order (deterministic across runs).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_BENCH_LEGACY=1 reproduces the pre-round-10 harness
    // (no pinned-block release) for measuring the contamination itself.
    val legacy = sys.env.get("SPARK_GRAFT_BENCH_LEGACY").contains("1")
    val diag = sys.env.get("SPARK_GRAFT_BENCH_DIAG").contains("1")

    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
        // Elapsed is stamped HERE, on the try's success path: the finally
        // below runs clearCache + a blocking pin release, and a trailing
        // expression after the block would charge each query its own
        // teardown (~5-25% per query in BENCH_r10 — BASELINE.md
        // "Timed-window accounting"). TimeQueries stamps at the same
        // boundary, so the two harnesses now agree.
        (System.nanoTime() - t0) / 1e9
      }
      catch { case _: Throwable => -1.0 }
      finally {
        // Queries that persist intermediates (LSH dedup) would otherwise
        // accumulate a new cached copy per run — later runs would both
        // leak memory and measure a cache-warmed variant.
        spark.catalog.clearCache()
        // clearCache() frees CacheManager entries only; the engine's
        // localCheckpoint pins free on RDD GC, which across a ~500-query
        // session lags far enough to tax whatever runs last (BENCH_r09's
        // q94-q99 carried ~18s of phantom cost this way). Release them
        // on the query boundary — blocking, so removal never overlaps
        // the NEXT query's measurement (its own cost is teardown,
        // outside the timed window).
        if (!legacy) graft.operators.Pinned.release(spark, blocking = true)
        if (diag) {
          val info = spark.sparkContext.getRDDStorageInfo
          System.err.println(
            s"DIAG $name persistent=${spark.sparkContext.getPersistentRDDs.size}" +
              s" storedRdds=${info.length}" +
              s" bytes=${info.map(i => i.memSize + i.diskSize).sum}")
        }
      }
    }

    // Hypervisor steal ticks accumulated across the whole measured
    // window (/proc/stat col 9): this host carries an episodic noisy
    // neighbor (BASELINE.md), and a contended recording must
    // self-identify without anyone re-running it. -1 where the proc
    // counter is unavailable.
    def stealTicks(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try src.getLines().next().trim.split("\\s+")(8).toLong
        finally src.close()
      } catch { case _: Throwable => -1L }

    // BASELINE.md protocol: warm JVM, median of 3 runs per query.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val names = SparkEntry.queries.keys.toSeq.sorted
    runOne(names.head) // warmup, discarded
    val steal0 = stealTicks()

    val results = names.map { n =>
      val times = (1 to runs).map(_ => runOne(n)).sorted
      (n, times(times.length / 2), times.head)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // min-of-N alongside the protocol median: on a host with bursty
    // external interference the min approximates the uncontended cost,
    // so a reader can tell noise from a real regression (a code
    // regression moves BOTH numbers; interference moves only the
    // median). The headline value stays the BASELINE.md median.
    val qsMin = results.map { case (k, _, m) => "\"" + k + "\":" + m }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalMin = results.map(_._3).sum
    val steal1 = stealTicks()
    val steal = if (steal0 >= 0 && steal1 >= 0) steal1 - steal0 else -1L
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$qsMin,"total_min":$totalMin,"steal_ticks":$steal,"sf":"$sfDir"}"""
    println(json)
    // Stdout tails get truncated by log capture (round 6 lost q01-q37's
    // per-query map that way) — always persist the full artifact too.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_last.json"))
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(out, (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
