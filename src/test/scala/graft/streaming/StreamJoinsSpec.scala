package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamJoinsSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("stream-stream enrichment join: probe matches the in-band build row") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val probes = MemoryStream[(String, Timestamp, String)]
    val builds = MemoryStream[(String, Timestamp, String)]
    val joined = StreamJoins.enrichmentJoin(
      probe = probes.toDS().toDF("k", "pts", "probe_payload"),
      build = builds.toDS().toDF("k", "bts", "build_payload"),
      key = "k",
      probeTs = "pts",
      buildTs = "bts",
      watermarkDelay = "0 seconds",
      bandSeconds = 600
    )
    val query = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ssj_out")
      .start()

    try {
      builds.addData(("a", ts(0), "bv1"))
      probes.addData(("a", ts(5), "p1"), ("b", ts(5), "p-miss"))
      query.processAllAvailable()
      // Advance both watermarks far past the band so the unmatched
      // left row ("b") is emitted with nulls.
      builds.addData(("zz", ts(59), "wm"))
      probes.addData(("zz2", ts(59), "wm"))
      query.processAllAvailable()
      query.processAllAvailable()

      val out = spark
        .table("ssj_out")
        .select("probe_payload", "build_build_payload")
        .as[(String, Option[String])]
        .collect()
        .toMap
      out("p1") shouldBe Some("bv1")
      out.get("p-miss").flatten shouldBe None
    } finally query.stop()
  }

  test("stream-stream enrichment join: build row after the probe does not match") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val probes = MemoryStream[(String, Timestamp, String)]
    val builds = MemoryStream[(String, Timestamp, String)]
    val joined = StreamJoins.enrichmentJoin(
      probe = probes.toDS().toDF("k", "pts", "probe_payload"),
      build = builds.toDS().toDF("k", "bts", "build_payload"),
      key = "k",
      probeTs = "pts",
      buildTs = "bts",
      watermarkDelay = "0 seconds",
      bandSeconds = 600
    )
    val query = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ssj_late")
      .start()

    try {
      probes.addData(("a", ts(5), "p-early"))
      builds.addData(("a", ts(10), "b-late")) // after the probe: out of band
      query.processAllAvailable()
      builds.addData(("zz", ts(59), "wm"))
      probes.addData(("zz2", ts(59), "wm"))
      query.processAllAvailable()
      query.processAllAvailable()

      val out = spark
        .table("ssj_late")
        .select("probe_payload", "build_build_payload")
        .as[(String, Option[String])]
        .collect()
        .toMap
      out.get("p-early").flatten shouldBe None
    } finally query.stop()
  }

  test("stream-static enrichment joins each batch against the dimension") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val dim = Seq(("a", "Alpha"), ("b", "Beta")).toDF("k", "label")
    val input = MemoryStream[(String, String)]
    val joined = StreamJoins.staticEnrich(input.toDS().toDF("k", "payload"), dim, "k")
    val query = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sstatic_out")
      .start()

    try {
      input.addData(("a", "p1"), ("c", "p-miss"))
      query.processAllAvailable()
      val out = spark
        .table("sstatic_out")
        .select("payload", "dim_label")
        .as[(String, Option[String])]
        .collect()
        .toMap
      out("p1") shouldBe Some("Alpha")
      out("p-miss") shouldBe None // left outer: unknown key passes through
    } finally query.stop()
  }

  test("watermarked exact dedup drops in-horizon repeats") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(String, Timestamp, String)]
    val deduped = StreamJoins.dedupExact(
      input.toDS().toDF("event_id", "ts", "payload"),
      tsCol = "ts",
      watermarkDelay = "30 minutes",
      "event_id"
    )
    val query = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_out")
      .start()

    try {
      input.addData(("e1", ts(0), "first"), ("e1", ts(1), "dup-same-batch"), ("e2", ts(2), "other"))
      query.processAllAvailable()
      input.addData(("e1", ts(5), "dup-later-batch"))
      query.processAllAvailable()
      val out = spark.table("dedup_out").select("event_id").as[String].collect().toSeq.sorted
      out shouldBe Seq("e1", "e2") // each id exactly once
    } finally query.stop()
  }

  test("event-time tumbling aggregation groups by window and key") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(String, Timestamp, Double)]
    val agg = StreamJoins.tumblingAgg(
      input.toDS().toDF("k", "ts", "v"),
      keyCol = "k",
      tsCol = "ts",
      valueCol = "v",
      windowLength = "10 minutes",
      watermarkDelay = "0 seconds"
    )
    val query = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("tumble_out")
      .start()

    try {
      input.addData(("u", ts(1), 1.0), ("u", ts(2), 2.0), ("u", ts(11), 10.0), ("w", ts(3), 5.0))
      query.processAllAvailable()
      val out = spark
        .table("tumble_out")
        .select("k", "window_start", "n", "sum_value")
        .as[(String, Timestamp, Long, Double)]
        .collect()
        .map { case (k, w, n, s) => (k, w.toString, n, s) }
        .sortBy(r => (r._1, r._2))
        .toSeq
      out shouldBe Seq(
        ("u", "2024-01-01 10:00:00.0", 2L, 3.0),
        ("u", "2024-01-01 10:10:00.0", 1L, 10.0),
        ("w", "2024-01-01 10:00:00.0", 1L, 5.0)
      )
    } finally query.stop()
  }
}
