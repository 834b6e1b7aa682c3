package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults are tuned for the test environment (single JVM, `local[32]`)
  * but every knob is the one you would also set on a real cluster:
  * AQE on (runtime re-planning, skew-join handling), shuffle partitions
  * sized to cores rather than the 200 default, UTC session time zone
  * (oracle parity), and nanosecond-parquet reading enabled because the
  * `events` table carries TIMESTAMP(NANOS).
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Let AQE re-plan (in particular: coalesce post-shuffle
      // partitions) under a persisted lineage too — off by default in
      // Spark only to keep a cached plan's output partitioning stable
      // for consumers that re-use it, which no graft operator does
      // (persists here are single-batch barriers: StreamingPostings/
      // StreamingIndex ingest, Dedup staged corpora, KMeans fit
      // projections). Without it every persist+write path freezes at
      // spark.sql.shuffle.partitions — e.g. each tiny postings delta
      // batch wrote 32 files and the fold re-read 6×32 of them
      // (round-15 measurement: q132 −4..−22%, q126/q127 −8..−22%,
      // q64 −14% paired A/B; no sampled regression). At scale the
      // same knob sizes delta/index files by AQE's advisory bytes
      // instead of the shuffle-partition constant (guide §6).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // RocksDB state store by default: streaming state on executor
      // local disk rather than heap, so a stateful pipeline's key space
      // is bounded by disk, not executor memory. Pipelines can opt back
      // to the heap-backed provider via the `stateStore: hdfs` config
      // knob (PipelineCompiler), and a query restarted from a
      // checkpoint keeps whatever provider it started under.
      .config(
        "spark.sql.streaming.stateStore.providerClass",
        pipeline.PipelineCompiler.RocksDbProvider)
      // RocksDB changelog checkpointing stays at Spark's default (off):
      // measured at 1M keys it read the flagship s2s shape 35% SLOWER
      // (13.3-14.2 s vs 9.3-10.0 s) — under few large AvailableNow
      // batches the per-batch changelog write is pure overhead on top
      // of the snapshot. Re-measured round 13 in its own regime (16+
      // small batches via max_files_per_trigger): parity, 0.979x —
      // still no measured win, so off stays. A deployment with much
      // larger total state under high-frequency triggers re-measures
      // with SPARK_GRAFT_STREAMBENCH_MODE=changelog (SCALE.md r13).
      .config("spark.ui.enabled", "false")

  /** Local session with `n` executor threads. */
  def local(n: Int = 32): SparkSession = {
    val s = builder(s"local[$n]", n).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    tune(s)
    s
  }

  /** Apply runtime-settable tuning to an externally created session
    * (e.g. the driver's). Safe to call repeatedly.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}
