package graft

import java.nio.file.{Files, Paths}

/** CLI flag-dispatch parity with the reference's main.go:24-29: a
  * pipeline config runs end-to-end through the same entry a user would
  * invoke, -checkRule validates rule names, bad input returns the
  * reference's non-zero exits.
  */
class MainSpec extends SparkSpec {

  private def cli(args: String*): Int = Main.run(args, () => spark, block = false)

  test("-pipelineConfig runs a batch pipeline end-to-end") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_main").toString
    Files.createDirectories(Paths.get(s"$dir/input"))
    Files.write(Paths.get(s"$dir/input/data.txt"), "a\nab".getBytes("UTF-8"))
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {"check": {"source": "in", "plugin": "aRule", "sink": "mainCliOut"}},
         |  "states": {},
         |  "sources": {"in": {"type": "File", "path": "$dir/input"}},
         |  "sinks": {"mainCliOut": {"type": "Memory"}}
         |}""".stripMargin
    Files.write(Paths.get(s"$dir/pipeline.json"), config.getBytes("UTF-8"))

    cli("-pipelineConfig", s"$dir/pipeline.json") shouldBe 0
    spark.table("mainCliOut").as[Boolean].collect().toSeq.sorted shouldBe Seq(false, true)
  }

  test("-pipelineConfig rejects an invalid config with exit 1") {
    val dir = Files.createTempDirectory("graft_main_bad").toString
    Files.write(
      Paths.get(s"$dir/bad.json"),
      """{"rules": {"r": {"source": "missing", "plugin": "nope", "sink": "s"}},
        |"states": {}, "sources": {}, "sinks": {"s": {"type": "Memory"}}}""".stripMargin.getBytes("UTF-8")
    )
    cli("-pipelineConfig", s"$dir/bad.json") shouldBe 1
  }

  test("-pipelineConfig -streaming runs the pipeline through readStream") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_main_stream").toString
    Files.createDirectories(Paths.get(s"$dir/input"))
    Files.write(Paths.get(s"$dir/input/data.txt"), "a\nab".getBytes("UTF-8"))
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {"check": {"source": "in", "plugin": "aRule", "sink": "mainCliStream"}},
         |  "states": {},
         |  "sources": {"in": {"type": "File", "path": "$dir/input"}},
         |  "sinks": {"mainCliStream": {"type": "Memory"}}
         |}""".stripMargin
    Files.write(Paths.get(s"$dir/pipeline.json"), config.getBytes("UTF-8"))

    cli("-pipelineConfig", s"$dir/pipeline.json", "-streaming", "-checkpoint", s"$dir/ckpt") shouldBe 0
    spark.table("mainCliStream").as[Boolean].collect().toSeq.sorted shouldBe Seq(false, true)
  }

  test("-checkRule accepts registered rules and rejects unknown ones") {
    cli("-checkRule", "aRule") shouldBe 0
    cli("-checkRule", "noSuchRule") shouldBe 1
  }

  test("-checkRule validates runtime-loadable rule classes both ways (rule.go:31-43)") {
    cli("-checkRule", "graft.plugins.ShoutRule") shouldBe 0 // loads + is a Rule
    cli("-checkRule", "graft.plugins.NotARule") shouldBe 1 // loads but is not a Rule
  }

  test("-apiServer starts, reports its port, and stops in non-blocking mode") {
    cli("-apiServer", "-port", "0") shouldBe 0
  }

  test("unknown flags print usage and exit 2") {
    cli("-bogus") shouldBe 2
    cli() shouldBe 2
  }
}
