package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.pipeline.PipelineCompiler

/** CLI entry — the reference's flag dispatch (reference: main.go:24-29):
  *
  *   graft.Main -pipelineConfig <file> [-streaming] [-checkpoint <dir>]
  *   graft.Main -apiServer [-apiConfig <file>] [-port <n>]
  *   graft.Main -checkRule <name>
  *
  * `-pipelineConfig` parses, validates, compiles and RUNS the pipeline
  * (main.go:36-69 startFromConfig): batch mode executes every sink and
  * exits; `-streaming` starts one checkpointed StreamingQuery per sink
  * and blocks until termination (the reference blocks on SIGINT,
  * pipeline.go:375-384 — a Spark streaming await is the same contract).
  *
  * `-apiServer` serves POST /pipelines + GET /pipelines/{id} + /metrics
  * (api.go:55-56) over a filesystem store; the default port 8000
  * matches api.go:145-152's default.
  *
  * `-checkRule` validates that a rule reference resolves — registry
  * hit or a runtime class-load of a [[graft.rules.Rule]] implementor —
  * the plugin sanity check of `-checkRule` (rule.go:31-43), with the
  * JVM classloader standing in for dlopen.
  */
object Main {

  def main(args: Array[String]): Unit =
    sys.exit(run(args.toSeq, () => GraftSession.local(), block = true))

  /** Flag dispatch, separated from main so tests can drive it with an
    * existing session and without the JVM-exiting/blocking behavior.
    * Returns the process exit code.
    */
  def run(a: Seq[String], session: () => SparkSession, block: Boolean): Int = {
    def valueOf(flag: String): Option[String] =
      a.indexOf(flag) match {
        case i if i >= 0 && i + 1 < a.length => Some(a(i + 1))
        case _                               => None
      }

    // Mode by flag PRESENCE anywhere in argv, like Go's flag package —
    // pinning the mode flag to argv[0] would reject e.g.
    // `-streaming -pipelineConfig cfg.json`, an invisible ordering trap.
    val mode =
      if (a.contains("-pipelineConfig")) Some("-pipelineConfig")
      else if (a.contains("-apiServer")) Some("-apiServer")
      else if (a.contains("-checkRule")) Some("-checkRule")
      else None

    mode match {
      case Some("-pipelineConfig") =>
        valueOf("-pipelineConfig") match {
          case None => usage()
          case Some(file) if !Files.isReadable(Paths.get(file)) =>
            System.err.println(s"cannot read pipeline config: $file")
            1
          case Some(file) =>
            val raw = new String(Files.readAllBytes(Paths.get(file)), "UTF-8")
            val streaming = a.contains("-streaming")
            val spark = session()
            PipelineCompiler.compile(spark, raw, streaming = streaming) match {
              case Left(err) =>
                System.err.println(s"invalid pipeline: $err")
                1
              case Right(compiled) if streaming =>
                val ckpt = valueOf("-checkpoint").getOrElse(
                  Files.createTempDirectory("graft-ckpt").toString
                )
                val queries = PipelineCompiler.startStreaming(compiled, ckpt, availableNow = !block)
                // awaitAny, not sequential awaits: with several sinks,
                // query 2 dying while query 1 runs would otherwise go
                // unnoticed forever (the await is parked on query 1).
                if (block && queries.nonEmpty)
                  try { spark.streams.awaitAnyTermination(); 0 }
                  catch {
                    case e: org.apache.spark.sql.streaming.StreamingQueryException =>
                      System.err.println(s"streaming query failed: ${e.getMessage}")
                      1
                  }
                else { queries.foreach(_.awaitTermination(60000)); 0 }
              case Right(compiled) =>
                PipelineCompiler.runBatch(compiled)
                0
            }
        }

      case Some("-apiServer") =>
        val apiConfig = valueOf("-apiConfig")
        val port = valueOf("-port").map(p => scala.util.Try(p.toInt).getOrElse(-1)).getOrElse(8000)
        if (apiConfig.exists(f => !Files.isReadable(Paths.get(f)))) {
          System.err.println(s"cannot read api config: ${apiConfig.get}")
          1
        } else if (port < 0 || port > 65535) {
          System.err.println(s"invalid -port: ${valueOf("-port").getOrElse("")}")
          1
        } else {
          val storeDir = apiConfig
            .map(f => new String(Files.readAllBytes(Paths.get(f)), "UTF-8").trim)
            .filter(_.nonEmpty)
            .getOrElse(Files.createTempDirectory("graft-pipelines").toString)
          val server = new api.ApiServer(session(), storeDir, port)
          server.start()
          println(s"graft api listening on :${server.boundPort}, store=$storeDir")
          if (block) {
            // Block like the reference's signal wait (api.go:57-81); the
            // JVM shutdown hook gives the server a clean stop on SIGTERM.
            sys.addShutdownHook(server.stop())
            Thread.currentThread().join()
          } else server.stop()
          0
        }

      case Some("-checkRule") =>
        valueOf("-checkRule") match {
          case None => usage()
          case Some(name) =>
            // Registry hit or runtime class-load, like the reference's
            // -checkRule dlopen sanity check (rule.go:31-43).
            graft.rules.RuleLoader.load(name, PipelineCompiler.builtinRules) match {
              case Right(_) =>
                println(s"rule $name OK")
                0
              case Left(err) =>
                System.err.println(
                  s"$err; registered: ${PipelineCompiler.builtinRules.keys.toSeq.sorted.mkString(", ")}"
                )
                1
            }
        }

      case _ => usage()
    }
  }

  private def usage(): Int = {
    System.err.println(
      """usage:
        |  graft.Main -pipelineConfig <file> [-streaming] [-checkpoint <dir>]
        |  graft.Main -apiServer [-apiConfig <file>] [-port <n>]
        |  graft.Main -checkRule <name>""".stripMargin
    )
    2
  }
}
