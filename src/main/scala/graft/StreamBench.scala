package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Streaming-throughput micro-bench — the reference is a stream
  * processor (pipeline.go's goroutine graph), so alongside Bench's
  * batch analytics this records events/sec through the PRODUCT
  * streaming path: file stream → trial-dispatch decode → rule
  * (stateless and stateful forms) → file sink, compiled by
  * PipelineCompiler exactly as a served pipeline would be.
  *
  * Protocol (BASELINE.md "Streaming throughput protocol"):
  *   - local[32], AvailableNow trigger over a pre-written spool of
  *     N json-line events split across 32 files (so the source
  *     parallelizes like a real spool);
  *   - per scenario: 1 discarded warmup + 3 measured runs, each with
  *     a FRESH checkpoint + sink dir (state starts empty every run;
  *     the input spool is reused);
  *   - the metric is events ingested / wall seconds from start() to
  *     termination, median of the 3 runs (min recorded too);
  *   - Pinned.release + clearCache between runs (Bench's hygiene).
  *
  * Scenarios:
  *   - `stateless_decode`: CloudTrail decode-dispatch → the s2s rule's
  *     stateless cousin is not separable, so the stateless row is the
  *     raw-line length rule — decode trial-dispatch + predicate, no
  *     state store.
  *   - `stateful_agg[_rocksdb]`: CloudTrail decode → cloudTrailNoMfaAgg
  *     keyed count (flatMapGroupsWithState + interval flush) → file
  *     sink, under the heap-backed provider (bare name — the
  *     r11-comparable row) and RocksDB (the product default since
  *     round 12).
  *   - `stateful_s2s[_rocksdb]`: AssumeRole/CreateUser mix →
  *     cloudTrailS2SJoin KV enrichment (the reference's flagship
  *     stateful shape), both providers; the RocksDB median is the
  *     artifact headline.
  *   - `stateful_s2s_restart`: the s2s shape stopped at half-spool and
  *     restarted from its checkpoint to completion (RocksDB), vs an
  *     uninterrupted start→termination run — the recovery-overhead
  *     ratio, with exactly-once delivery verified on the split run's
  *     sink output.
  *   - `trending`: CloudTrail decode → trendingEvents (event-time
  *     windowed SpaceSaving top-k, capacity 64) over `keys` distinct
  *     eventNames across six 10-minute panes — the O(capacity)-state
  *     streaming row (round-13 verdict #5).
  *
  * One JSON line on stdout; full artifact also written to
  * SPARK_GRAFT_STREAMBENCH_OUT (default target/streambench_last.json).
  */
object StreamBench {

  private def writeSpool(dir: String, lines: IndexedSeq[String], files: Int): Unit = {
    Files.createDirectories(Paths.get(dir))
    val per = math.max(1, (lines.size + files - 1) / files)
    lines.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      Files.write(
        Paths.get(dir, f"part-$i%05d.json"),
        chunk.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    }
  }

  /** Compact forms of the public AWS CloudTrail sample events the test
    * fixtures use (Fixtures.scala documents the provenance; inlined
    * here because the bench main lives in the library jar, not the
    * test tree). Identity fields vary per event: `keys` distinct
    * principals round-robin, unique eventIDs.
    */
  private[graft] val createUserTemplate: String =
    """{"eventVersion": "1.05", "userIdentity": {"type": "AssumedRole", """ +
      """"principalId": "AIDAQRSTUVWXYZEXAMPLE:Bob-EC2-dev", """ +
      """"arn": "arn:aws:sts::777788889999:assumed-role/AssumeNothing/devdsk", """ +
      """"accountId": "777788889999", "accessKeyId": "AKIAQRSTUVWXYZEXAMPLE", """ +
      """"sessionContext": {"attributes": {"mfaAuthenticated": "false", "creationDate": "2016-11-14T17:25:26Z"}, """ +
      """"sessionIssuer": {"type": "Role", "principalId": "AIDAQRSTUVWXYZEXAMPLE", """ +
      """"arn": "arn:aws:iam::777788889999:role/AssumeNothing", "accountId": "777788889999", "userName": "AssumeNothing"}}}, """ +
      """"eventTime": "2016-11-14T17:25:45Z", "eventSource": "s3.amazonaws.com", "eventName": "CreateUser", """ +
      """"awsRegion": "us-east-2", "sourceIPAddress": "192.0.2.1", "userAgent": "[aws-cli/1.11.10]", """ +
      """"requestParameters": {"userName": "god_user"}, "requestID": "EXAMPLE463D56D4C", """ +
      """"eventID": "dEXAMPLE-265a-41e0-9352-4401bEXAMPLE", "eventType": "AwsApiCall", "recipientAccountId": "777788889999"}"""

  private[graft] val assumeRoleTemplate: String =
    """{"eventVersion": "1.05", "userIdentity": {"type": "IAMUser", "principalId": "AIDAQRSTUVWXYZEXAMPLE", """ +
      """"arn": "arn:aws:iam::777788889999:user/Bob", "accountId": "777788889999", """ +
      """"accessKeyId": "AKIAQRSTUVWXYZEXAMPLE", "userName": "Bob"}, """ +
      """"eventTime": "2014-07-18T15:07:39Z", "eventSource": "sts.amazonaws.com", "eventName": "AssumeRole", """ +
      """"awsRegion": "us-east-2", "sourceIPAddress": "192.0.2.101", "userAgent": "aws-cli/1.11.10", """ +
      """"requestParameters": {"roleArn": "arn:aws:iam::777788889999:role/EC2-dev", "roleSessionName": "Bob-EC2-dev"}, """ +
      """"responseElements": {"credentials": {"sessionToken": "encoded session token blob", """ +
      """"accessKeyId": "AKIAQRSTUVWXYZEXAMPLE", "expiration": "Jul 18, 2014 4:07:39 PM"}, """ +
      """"assumedRoleUser": {"assumedRoleId": "AIDAQRSTUVWXYZEXAMPLE:Bob-EC2-dev", """ +
      """"arn": "arn:aws:sts::777788889999:assumed-role/EC2-dev/Bob-EC2-dev"}}, """ +
      """"requestID": "4EXAMPLE-0e8d-11e4-96e4-e55c0EXAMPLE", "eventID": "dEXAMPLE-ac7f-466c-a608-4ac8dEXAMPLE", """ +
      """"eventType": "AwsApiCall", "recipientAccountId": "111122223333"}"""

  private def createUserEvents(n: Int, keys: Int): IndexedSeq[String] =
    (0 until n).map { i =>
      val k = i % keys
      createUserTemplate
        .replace("dEXAMPLE-265a-41e0-9352-4401bEXAMPLE", f"evt-$i%08d")
        // the s2s probe key (principalId suffix) …
        .replace("Bob-EC2-dev", s"user-$k")
        // … AND the agg key: Principal.aggVariant keys AssumedRole on
        // sessionIssuer.userName, so without this the keyed-count
        // scenario degenerates to ONE hot key (StreamBenchSpec pins
        // both derivations against the templates)
        .replace("AssumeNothing", s"role-$k")
    }

  private def assumeRoleEvents(keys: Int): IndexedSeq[String] =
    (0 until keys).map { k =>
      assumeRoleTemplate
        .replace("dEXAMPLE-ac7f-466c-a608-4ac8dEXAMPLE", f"ar-$k%08d")
        .replace("Bob-EC2-dev", s"user-$k")
    }

  /** The trending scenario's feed: `keys` distinct eventNames (far
    * past the rule's capacity=64, so the SpaceSaving overflow path is
    * what gets measured, not the exact small-cardinality case) spread
    * over a one-hour span of eventTimes — six 10-minute panes, five of
    * them watermark-closed by the end of the spool.
    */
  private def trendingFeedEvents(n: Int, keys: Int): IndexedSeq[String] =
    (0 until n).map { i =>
      val k = i % keys
      val minute = (i.toLong * 60L / math.max(1, n)).toInt // 0..59 across the spool
      createUserTemplate
        .replace("dEXAMPLE-265a-41e0-9352-4401bEXAMPLE", f"evt-$i%08d")
        .replace("\"eventName\": \"CreateUser\"", s""""eventName": "name-$k"""")
        .replace("2016-11-14T17:25:45Z", f"2016-11-14T17:$minute%02d:00Z")
    }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_N", "100000").toInt
    // key cardinality defaults to n/10; override to push STATE SCALE
    // independently of event volume (provider-divergence experiments)
    val keys = math.max(
      1,
      sys.env.get("SPARK_GRAFT_STREAMBENCH_KEYS").map(_.toInt).getOrElse(n / 10))
    val root = Files.createTempDirectory("graft_streambench").toString

    // Cumulative numInputRows per query run, fed by a listener: the
    // query's own recentProgress is a BOUNDED ring (default 100
    // entries), so a run needing more micro-batches than that (larger
    // N, long stateful timer-batch tails) would undercount and spin the
    // wait loop to its deadline — the listener sees every progress
    // event exactly once.
    val ingestedRows = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()
    // held in a val and removed before stop: a registered listener plus
    // never-evicted per-runId entries are harmless at one bench's scale
    // but an unbounded map in a long sweep (ADVICE r12) — runOnce also
    // drops each run's entries once its count has been judged
    val ingestListener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        ingestedRows.merge(e.progress.runId, e.progress.numInputRows, (a, b) => a + b)
        ()
      }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(ingestListener)
    def ingested(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      Option(ingestedRows.get(q.runId)).map(_.longValue()).getOrElse(0L)

    def config(
        input: String,
        rule: (String, String),
        stateful: Boolean,
        sink: String,
        provider: String,
        maxFiles: Option[Int] = None): String = {
      val stateRef = if (stateful) """, "state": "kv"""" else ""
      val states = if (stateful) """{"kv": {"type": "KV"}}""" else "{}"
      val throttle = maxFiles.map(m => s""", "max_files_per_trigger": $m""").getOrElse("")
      s"""{
         |  "eventFolder": "builtin",
         |  "stateStore": "$provider",
         |  "rules": {
         |    "${rule._1}": {"source": "in", "plugin": "${rule._2}"$stateRef, "sink": "out"}
         |  },
         |  "states": $states,
         |  "sources": {"in": {"type": "File", "path": "$input"$throttle}},
         |  "sinks": {"out": {"type": "File", "path": "$sink"}}
         |}""".stripMargin
    }

    def hygiene(c: pipeline.PipelineCompiler.Compiled): Unit = {
      spark.catalog.clearCache()
      c.pins.foreach(_.release(blocking = true))
      operators.Pinned.release(spark, blocking = true)
    }

    /** One timed run: fresh checkpoint + sink, compile → start
      * (AvailableNow) → measure wall seconds from start() until every
      * query has INGESTED its whole spool (progress-based, not
      * termination-based: a stateful rule with processing-time flush
      * timers keeps scheduling timer batches under AvailableNow, so
      * "query terminated" is not the ingest-complete boundary — the
      * cumulative numInputRows reaching the spool size is). Queries
      * are stopped right after the stamp.
      */
    val ChangelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    def runOnce(
        name: String,
        input: String,
        rule: (String, String),
        stateful: Boolean,
        expected: Long,
        provider: String,
        maxFiles: Option[Int] = None,
        changelog: Boolean = false): Double = {
      val runDir = Files.createTempDirectory(s"graft_sb_$name").toString
      val c = pipeline.PipelineCompiler
        .compile(spark, config(input, rule, stateful, s"$runDir/sink", provider, maxFiles), streaming = true)
        .fold(err => sys.error(s"$name: $err"), identity)
      // Changelog checkpointing is a session conf read at query start;
      // every run here uses a FRESH checkpoint so flipping it between
      // runs is safe (an existing checkpoint pins its own setting).
      spark.conf.set(ChangelogKey, changelog.toString)
      val t0 = System.nanoTime()
      val qs = pipeline.PipelineCompiler.startStreaming(c, s"$runDir/ckpt", availableNow = true)
      val deadline = t0 + 600L * 1000000000L
      while (qs.exists(q => q.isActive && ingested(q) < expected) && System.nanoTime() < deadline)
        Thread.sleep(10)
      val dt = (System.nanoTime() - t0) / 1e9
      qs.foreach(q => try q.stop() catch { case _: Exception => () })
      qs.foreach { q =>
        // progress events arrive on the ASYNC listener bus: a query can
        // flip inactive (AvailableNow termination) before its final
        // batch's event is processed, so drain briefly before judging
        // the count — the wait loop above may have exited on !isActive
        val drain = System.nanoTime() + 15L * 1000000000L
        while (ingested(q) < expected && System.nanoTime() < drain) Thread.sleep(10)
        require(ingested(q) >= expected, s"$name: ingested ${ingested(q)} of $expected events")
      }
      // counts judged — drop this run's entries (bounded map even in a
      // long sweep; stopped queries emit no further progress events)
      qs.foreach(q => ingestedRows.remove(q.runId))
      hygiene(c)
      dt
    }

    def scenario(
        name: String,
        input: String,
        rule: (String, String),
        stateful: Boolean,
        events: Int,
        provider: String,
        maxFiles: Option[Int] = None,
        changelog: Boolean = false): (String, Int, Seq[Double]) = {
      runOnce(name, input, rule, stateful, events.toLong, provider, maxFiles, changelog) // warmup, discarded
      val runs =
        (1 to 3).map(_ => runOnce(name, input, rule, stateful, events.toLong, provider, maxFiles, changelog))
      System.err.println(f"STREAMBENCH $name%-22s runs=${runs.map(r => f"$r%.2f").mkString(",")}")
      (name, events, runs)
    }

    /** Restart-under-load: the s2s shape run start→termination once
      * uninterrupted, then once stopped mid-spool (half the events
      * ingested) and restarted from the SAME checkpoint to completion.
      * Both sides run with max_files_per_trigger=2 (32-file spool → 16
      * micro-batches) so the stop genuinely lands BETWEEN committed
      * batches with the spool part-read — unthrottled AvailableNow
      * would plan one mega-batch and the "interruption" would either
      * replay everything or nothing. The s2s query has no
      * processing-time timers, so AvailableNow termination IS its
      * completion boundary — both halves use awaitTermination.
      * Delivery is verified after the split run: exactly one output
      * row per probe event, no loss, no duplicates (the exactly-once
      * restart spec's property, here measured at bench load). Returns
      * (uninterrupted_sec, interrupted_sec).
      */
    def runRestart(input: String, expected: Long, provider: String): (Double, Double) = {
      val throttle = Some(2)
      spark.conf.set(ChangelogKey, "false") // product default, explicit
      def timedToTermination(runDir: String): Double = {
        val c = pipeline.PipelineCompiler
          .compile(
            spark,
            config(input, ("s2s", "cloudTrailS2SJoin"), stateful = true, s"$runDir/sink", provider, throttle),
            streaming = true)
        .fold(err => sys.error(s"restart: $err"), identity)
        val t0 = System.nanoTime()
        val qs = pipeline.PipelineCompiler.startStreaming(c, s"$runDir/ckpt", availableNow = true)
        qs.foreach(_.awaitTermination(600000))
        val dt = (System.nanoTime() - t0) / 1e9
        hygiene(c)
        dt
      }
      // warmup + uninterrupted reference (median-of-1 is enough here —
      // the scenario rows already carry the steady-state medians)
      timedToTermination(Files.createTempDirectory("graft_sb_restart_warm").toString)
      val uSec = timedToTermination(Files.createTempDirectory("graft_sb_restart_u").toString)

      // interrupted: stop at half-spool, restart same checkpoint
      val runDir = Files.createTempDirectory("graft_sb_restart_i").toString
      val c1 = pipeline.PipelineCompiler
        .compile(
          spark,
          config(input, ("s2s", "cloudTrailS2SJoin"), stateful = true, s"$runDir/sink", provider, throttle),
          streaming = true)
        .fold(err => sys.error(s"restart: $err"), identity)
      val t0 = System.nanoTime()
      val q1 = pipeline.PipelineCompiler.startStreaming(c1, s"$runDir/ckpt", availableNow = true)
      val half = expected / 2
      val deadline = t0 + 600L * 1000000000L
      while (q1.exists(q => q.isActive && ingested(q) < half) && System.nanoTime() < deadline)
        Thread.sleep(5)
      q1.foreach(q => try q.stop() catch { case _: Exception => () })
      val p1 = (System.nanoTime() - t0) / 1e9
      // the scenario's PRECONDITION must hold or the ratio measures
      // nothing: the stop has to land mid-spool (some batches
      // committed, some files still unread). Drain the async listener
      // first so the count is settled, then fail loudly on degenerate
      // runs (host too fast → raise the throttle granularity).
      val settle = System.nanoTime() + 10L * 1000000000L
      while (q1.exists(q => ingested(q) == 0L) && System.nanoTime() < settle) Thread.sleep(10)
      Thread.sleep(2000) // let any final in-flight progress event land
      val atStop = q1.map(ingested).sum
      require(
        atStop > 0L && atStop < expected,
        s"restart: stop landed at $atStop of $expected ingested — not mid-spool, " +
          "the interrupted run would degenerate into an uninterrupted one")
      System.err.println(f"STREAMBENCH restart stop point: $atStop of $expected ingested")
      hygiene(c1)
      val c2 = pipeline.PipelineCompiler
        .compile(
          spark,
          config(input, ("s2s", "cloudTrailS2SJoin"), stateful = true, s"$runDir/sink", provider, throttle),
          streaming = true)
        .fold(err => sys.error(s"restart: $err"), identity)
      val t1 = System.nanoTime()
      val q2 = pipeline.PipelineCompiler.startStreaming(c2, s"$runDir/ckpt", availableNow = true)
      q2.foreach(_.awaitTermination(600000))
      val p2 = (System.nanoTime() - t1) / 1e9
      hygiene(c2)
      // exactly-once at load: one row per CreateUser probe, none lost,
      // none duplicated across the stop/restart boundary
      val out = spark.read.json(s"$runDir/sink")
      val total = out.count()
      val distinct = out.select("EventId").distinct().count()
      require(total == n.toLong, s"restart: $total output rows, expected $n")
      require(distinct == n.toLong, s"restart: $distinct distinct EventIds, expected $n")
      System.err.println(
        f"STREAMBENCH stateful_s2s_restart     uninterrupted=$uSec%.2f interrupted=${p1 + p2}%.2f (p1=$p1%.2f p2=$p2%.2f)")
      (uSec, p1 + p2)
    }

    // Inputs are written ONCE per scenario and reused across runs.
    val ctSpool = s"$root/ct"
    writeSpool(ctSpool, createUserEvents(n, keys), files = 32)
    val s2sSpool = s"$root/s2s"
    // build side first in file order: one AssumeRole per principal,
    // then the CreateUser probes (same decode path, 2 event shapes)
    writeSpool(s2sSpool, assumeRoleEvents(keys) ++ createUserEvents(n, keys), files = 32)
    val rawSpool = s"$root/raw"
    writeSpool(rawSpool, (0 until n).map(i => "x" * (i % 5 + 1)), files = 32)
    val trendSpool = s"$root/trend"
    writeSpool(trendSpool, trendingFeedEvents(n, keys), files = 32)

    // Stateful scenarios run under BOTH providers: the bare names stay
    // heap-backed ("hdfs") — the r11-comparable rows — and the
    // `_rocksdb` rows measure the product DEFAULT since round 12
    // (state on executor local disk, key space disk-bounded).
    //
    // MODE=changelog (round-12 verdict #4) isolates the regime changelog
    // checkpointing exists for: the same s2s shape but throttled to
    // max_files_per_trigger=2 (32-file spool → 16+ micro-batches, each
    // batch's state delta ≪ total state), changelog off vs on. Round
    // 12's measurement — 35% slower — used a handful of LARGE
    // AvailableNow batches, where the per-batch changelog write is pure
    // overhead on top of the snapshot; this mode produces the
    // many-small-batches evidence without disturbing the comparable
    // full-protocol rows.
    val mode = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_MODE", "full")
    // present-but-invalid is an ERROR, not a silent full-protocol run
    // (the PipelineConfig knob posture): a typo'd mode would otherwise
    // overwrite the requested artifact with the wrong experiment
    require(mode == "full" || mode == "changelog",
      s"SPARK_GRAFT_STREAMBENCH_MODE=$mode — known modes: full, changelog")
    val s2s = ("s2s", "cloudTrailS2SJoin")
    val results =
      if (mode == "changelog") Seq(
        scenario("s2s_throttled_snapshot", s2sSpool, s2s, stateful = true, n + keys, "rocksdb",
          maxFiles = Some(2), changelog = false),
        scenario("s2s_throttled_changelog", s2sSpool, s2s, stateful = true, n + keys, "rocksdb",
          maxFiles = Some(2), changelog = true)
      )
      else Seq(
        scenario("stateless_decode", rawSpool, ("len", "lengthRule"), stateful = false, n, "rocksdb"),
        scenario("stateful_agg", ctSpool, ("agg", "cloudTrailNoMfaAgg"), stateful = true, n, "hdfs"),
        scenario("stateful_agg_rocksdb", ctSpool, ("agg", "cloudTrailNoMfaAgg"), stateful = true, n, "rocksdb"),
        scenario("stateful_s2s", s2sSpool, s2s, stateful = true, n + keys, "hdfs"),
        scenario("stateful_s2s_rocksdb", s2sSpool, s2s, stateful = true, n + keys, "rocksdb"),
        // the O(capacity)-state claim, measured: decode → windowed
        // SpaceSaving top-k (trendingEvents, capacity 64) over `keys`
        // distinct names — state per pane stays 64 slots no matter the
        // key cardinality (declarative agg, no "kv" declaration needed)
        scenario("trending", trendSpool, ("trend", "trendingEvents"), stateful = false, n, "rocksdb")
      )
    val restart =
      if (mode == "changelog") None
      else Some(runRestart(s2sSpool, (n + keys).toLong, "rocksdb"))

    def eps(events: Int, sec: Double): Double = math.round(events / sec).toDouble
    val scenarioJson = results.map { case (name, events, runs) =>
      val sorted = runs.sorted
      s""""$name":{"events":$events,"runs_sec":[${runs.map(r => f"$r%.3f").mkString(",")}],""" +
        s""""events_per_sec":${eps(events, sorted(1))},"events_per_sec_max":${eps(events, sorted.head)}}"""
    }.mkString("{", ",", "}")
    val restartJson = restart.map { case (restartU, restartI) =>
      f""""restart":{"stateful_s2s_restart":{"events":${n + keys},"uninterrupted_sec":$restartU%.3f,""" +
        f""""interrupted_sec":$restartI%.3f,"overhead_ratio":${restartI / restartU}%.3f}},"""
    }.getOrElse {
      // changelog mode: the headline comparison as a typed ratio leaf
      // (doc-gate pool), changelog-on seconds over snapshot-only
      val med = results.map { case (name, _, runs) => name -> runs.sorted.apply(1) }.toMap
      f""""changelog":{"snapshot_sec":${med("s2s_throttled_snapshot")}%.3f,""" +
        f""""changelog_sec":${med("s2s_throttled_changelog")}%.3f,""" +
        f""""changelog_over_snapshot_ratio":${med("s2s_throttled_changelog") / med("s2s_throttled_snapshot")}%.3f},"""
    }
    // headline = the flagship stateful shape (s2s enrichment) on the
    // product-default RocksDB provider, median
    val headline = {
      val key = if (mode == "changelog") "s2s_throttled_snapshot" else "stateful_s2s_rocksdb"
      val (_, events, runs) = results.find(_._1 == key).get
      eps(events, runs.sorted.apply(1))
    }
    val json =
      s"""{"metric":"events_per_sec","value":$headline,"unit":"events/sec","scenarios":$scenarioJson,""" +
        s"""$restartJson"n":$n,"keys":$keys,"cpus":$cpus}"""
    println(json)
    val out = Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_OUT", "target/streambench_last.json"))
    Option(out.getParent).foreach(Files.createDirectories(_))
    Files.write(out, (json + "\n").getBytes(StandardCharsets.UTF_8))
    spark.streams.removeListener(ingestListener)
    spark.stop()
  }
}
