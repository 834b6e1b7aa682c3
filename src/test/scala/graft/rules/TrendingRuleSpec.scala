package graft.rules

import java.nio.file.{Files, Paths}

import graft.{Fixtures, SparkSpec}
import graft.pipeline.PipelineCompiler

/** The trendingEvents rule through the PRODUCT path: decoded
  * CloudTrail feed → windowed SpaceSaving top-k → sink, compiled by
  * PipelineCompiler in both batch and streaming form. Streaming runs
  * the SAME declarative plan (no fMGWS): append mode emits each pane
  * once, finalized, when the watermark passes.
  */
class TrendingRuleSpec extends SparkSpec {

  private def event(name: String, time: String, id: String): String =
    Fixtures.createUserEvent
      .replace(""""eventName": "CreateUser"""", s""""eventName": "$name"""")
      .replace("2016-11-14T17:25:45Z", time)
      .replace("dEXAMPLE-265a-41e0-9352-4401bEXAMPLE", id)

  // window 17:20–17:30 — CreateUser 4, DeleteUser 2, ListUsers 1;
  // a 17:55 straggler pushes the watermark (5 min) past 17:30
  private def events: Seq[String] = {
    val w1 =
      (1 to 4).map(i => event("CreateUser", "2016-11-14T17:21:05Z", s"cu-$i")) ++
        (1 to 2).map(i => event("DeleteUser", "2016-11-14T17:22:10Z", s"du-$i")) :+
        event("ListUsers", "2016-11-14T17:23:15Z", "lu-1")
    w1 :+ event("CreateUser", "2016-11-14T17:55:00Z", "late-1")
  }

  private def config(input: String, sink: String): String =
    s"""{
       |  "eventFolder": "builtin",
       |  "rules": {
       |    "trend": {"source": "in", "plugin": "trendingEvents", "sink": "$sink"}
       |  },
       |  "states": {},
       |  "sources": {"in": {"type": "File", "path": "$input"}},
       |  "sinks": {"$sink": {"type": "Memory"}}
       |}""".stripMargin

  private def write(dir: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "data.json"), lines.mkString("\n").getBytes("UTF-8"))
  }

  test("batch: every window reports its exact top-k (capacity covers the keys)") {
    val dir = Files.createTempDirectory("graft_trend_batch").toString
    write(s"$dir/input", events)
    val c = PipelineCompiler.compile(spark, config(s"$dir/input", "trendBatch"))
      .fold(e => fail(e), identity)
    PipelineCompiler.runBatch(c)
    val rows = spark.table("trendBatch")
      .orderBy("WindowStart", "Rank")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getInt(2), r.getString(3), r.getLong(4), r.getLong(5)))
    // batch has no watermark cutoff: both windows report
    assert(rows.toSeq == Seq(
      ("2016-11-14 17:20:00.0", 1, "CreateUser", 4L, 0L),
      ("2016-11-14 17:20:00.0", 2, "DeleteUser", 2L, 0L),
      ("2016-11-14 17:20:00.0", 3, "ListUsers", 1L, 0L),
      ("2016-11-14 17:50:00.0", 1, "CreateUser", 1L, 0L)
    ), rows.mkString("; "))
  }

  test("streaming: only the watermark-closed window emits, same exact report") {
    val dir = Files.createTempDirectory("graft_trend_stream").toString
    write(s"$dir/input", events)
    val c = PipelineCompiler.compile(spark, config(s"$dir/input", "trendStream"), streaming = true)
      .fold(e => fail(e), identity)
    PipelineCompiler.startStreaming(c, s"$dir/ckpt").foreach(_.awaitTermination(120000))
    val rows = spark.table("trendStream")
      .orderBy("WindowStart", "Rank")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getInt(2), r.getString(3), r.getLong(4)))
    // the 17:50 pane stays open (watermark 17:50), 17:20 pane is final
    assert(rows.toSeq == Seq(
      ("2016-11-14 17:20:00.0", 1, "CreateUser", 4L),
      ("2016-11-14 17:20:00.0", 2, "DeleteUser", 2L),
      ("2016-11-14 17:20:00.0", 3, "ListUsers", 1L)
    ), rows.mkString("; "))
  }
}
