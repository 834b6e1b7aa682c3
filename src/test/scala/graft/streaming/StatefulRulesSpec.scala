package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StatefulRules.{Enriched, KeyedMsg}

/** Streaming forms of the stateful rules, driven through MemoryStream —
  * the deterministic-trigger equivalent of the reference's channel-fed
  * integration harness (integration_test.go:278-297).
  */
class StatefulRulesSpec extends SparkSpec {

  test("streaming enrichment: probe sees the latest preceding build value") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[KeyedMsg]
    val query = StatefulRules
      .enrichment(input.toDS())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("enrich_out")
      .start()

    try {
      // Batch 1: build then probe for key a; probe-miss for key b.
      input.addData(
        KeyedMsg("a", 1L, 0, "build-v1"),
        KeyedMsg("a", 2L, 1, "probe-1"),
        KeyedMsg("b", 2L, 1, "probe-b")
      )
      query.processAllAvailable()
      // Batch 2: the state must survive micro-batch boundaries.
      input.addData(KeyedMsg("a", 3L, 1, "probe-2"))
      query.processAllAvailable()

      val out = spark.table("enrich_out").as[Enriched].collect().map(e => e.payload -> e.resolved).toMap
      out("probe-1") shouldBe Some("build-v1")
      out("probe-b") shouldBe None
      out("probe-2") shouldBe Some("build-v1")
    } finally query.stop()
  }

  test("streaming enrichment: last write wins across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[KeyedMsg]
    val query = StatefulRules
      .enrichment(input.toDS())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("enrich_lww")
      .start()

    try {
      input.addData(KeyedMsg("k", 1L, 0, "old"))
      query.processAllAvailable()
      input.addData(KeyedMsg("k", 2L, 0, "new"), KeyedMsg("k", 3L, 1, "probe"))
      query.processAllAvailable()
      val out = spark.table("enrich_lww").as[Enriched].collect()
      out.map(e => e.payload -> e.resolved).toMap apply "probe" shouldBe Some("new")
    } finally query.stop()
  }

  test("transformWithState enrichment matches flatMapGroupsWithState semantics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    val input = MemoryStream[KeyedMsg]
    val query = StatefulRules
      .enrichmentTws(input.toDS())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("enrich_tws")
      .start()

    try {
      input.addData(KeyedMsg("a", 1L, 0, "build-v1"), KeyedMsg("a", 2L, 1, "probe-1"))
      query.processAllAvailable()
      input.addData(KeyedMsg("a", 3L, 1, "probe-2"), KeyedMsg("b", 3L, 1, "probe-miss"))
      query.processAllAvailable()
      val out = spark.table("enrich_tws").as[Enriched].collect().map(e => e.payload -> e.resolved).toMap
      out("probe-1") shouldBe Some("build-v1")
      out("probe-2") shouldBe Some("build-v1") // state across batches
      out("probe-miss") shouldBe None
    } finally {
      query.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming session windows: gap-separated events form distinct sessions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(String, java.sql.Timestamp)]
    val sessions = StatefulRules.sessionCounts(
      input.toDS().toDF("user", "ts"),
      keyCol = "user",
      tsCol = "ts",
      gap = "10 minutes",
      watermarkDelay = "0 seconds"
    )
    val query = sessions.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("session_out")
      .start()

    try {
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData(("u1", ts(0)), ("u1", ts(5)), ("u1", ts(30)), ("u2", ts(1)))
      query.processAllAvailable()
      val out = spark
        .table("session_out")
        .select("user", "n_events")
        .as[(String, Long)]
        .collect()
        .toSeq
        .sorted
      // u1: one session of 2 (0,5), one of 1 (30); u2: one of 1
      out shouldBe Seq(("u1", 1L), ("u1", 2L), ("u2", 1L))
    } finally query.stop()
  }

  test("interval flush: emit-and-clear after quiet period (agg golden, streaming form)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(String, String)]
    // NOTE: never processAllAvailable() a ProcessingTimeTimeout query —
    // timeout-triggered batches keep the stream from quiescing and the
    // call can spin forever. Poll the sink with a deadline instead.
    val query = StatefulRules
      .intervalFlushCount(input.toDS(), intervalMs = 500)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("flush_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .start()

    try {
      input.addData("p" -> "payload1", "p" -> "payload2", "p" -> "payload3")
      val deadline = System.currentTimeMillis() + 60000
      var flushed = Array.empty[StatefulRules.Flushed]
      while (flushed.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        flushed = spark.table("flush_out").as[StatefulRules.Flushed].collect()
      }
      flushed.length shouldBe 1
      val p = flushed.head
      p.key shouldBe "p"
      p.occurrences shouldBe 3
      p.payload shouldBe "payload1" // FIRST payload kept, reference cloudTrail_agg.go:36-69

      // Emit-and-clear: the state was removed at flush, so no re-emission
      // on later ticks (reference: Window() ForEach+Delete).
      Thread.sleep(1500)
      spark.table("flush_out").count() shouldBe 1
    } finally query.stop()
  }

  test("interval flush: a continuously-hot key still flushes (timer arms at window open)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(String, String)]
    val query = StatefulRules
      .intervalFlushCount(input.toDS(), intervalMs = 500)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("flush_hot")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .start()

    try {
      // Keep the key hot: new data more often than the flush interval.
      // Before the round-2 fix, every batch re-armed the timeout and the
      // key never flushed (unbounded latency + count).
      val deadline = System.currentTimeMillis() + 60000
      var flushed = Array.empty[StatefulRules.Flushed]
      var n = 0
      while (flushed.isEmpty && System.currentTimeMillis() < deadline) {
        input.addData("hot" -> s"p$n")
        n += 1
        Thread.sleep(150)
        flushed = spark.table("flush_hot").as[StatefulRules.Flushed].collect()
      }
      flushed.length should be >= 1
      flushed.head.key shouldBe "hot"
      flushed.head.payload shouldBe "p0" // first payload of the window
      // The flush fired while data kept arriving — occurrences is a
      // window's worth, well below everything sent by the deadline.
      flushed.head.occurrences should be >= 1

      // Cadence (reference window_test.go:35-52 — one call per elapsed
      // interval): the flush removed the state, so continued traffic
      // opens a NEW window that must flush again an interval later.
      val deadline2 = System.currentTimeMillis() + 60000
      while (flushed.length < 2 && System.currentTimeMillis() < deadline2) {
        input.addData("hot" -> s"p$n")
        n += 1
        Thread.sleep(150)
        flushed = spark.table("flush_hot").as[StatefulRules.Flushed].collect()
      }
      flushed.length should be >= 2
    } finally query.stop()
  }

  test("transformWithState timer flush: hot key flushes on cadence (ticker parity)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    val input = MemoryStream[(String, String)]
    val query = StatefulRules
      .intervalFlushCountTws(input.toDS(), intervalMs = 500)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("flush_tws")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .start()

    try {
      // Hot key: data keeps arriving, yet the registered timer fires
      // anyway — no data-path workaround needed with real timers.
      val deadline = System.currentTimeMillis() + 60000
      var flushed = Array.empty[StatefulRules.Flushed]
      var n = 0
      while (flushed.isEmpty && System.currentTimeMillis() < deadline) {
        input.addData("hot" -> s"p$n")
        n += 1
        Thread.sleep(150)
        flushed = spark.table("flush_tws").as[StatefulRules.Flushed].collect()
      }
      flushed.length should be >= 1
      flushed.head.key shouldBe "hot"
      flushed.head.payload shouldBe "p0"
      flushed.head.occurrences should be >= 1
    } finally {
      query.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
