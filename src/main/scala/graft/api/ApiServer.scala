package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.pipeline.PipelineCompiler

/** Pipeline-management REST API — the reference's api.go surface:
  *   POST /pipelines       → validate, store raw config under a fresh
  *                           UUID, start async, 201 + UUID text
  *   GET  /pipelines/{id}  → stored raw config bytes, 404 if absent
  *   GET  /metrics         → the two reference metrics (monitoring.go:
  *                           27-31): pipelines gauge + events counter,
  *                           per-pipeline labels, via the pluggable
  *                           [[MonitoringService]] factory (prometheus
  *                           text by default; cloudwatch backend =
  *                           accumulate + flush daemon behind a
  *                           PutMetricData transport seam)
  *
  * Config storage is a filesystem metadata directory (one file per
  * UUID) replacing BoltDB/DynamoDB (backend.go:17-21); the reference
  * also stores raw pre-validated bytes and returns them verbatim
  * (api.go:84-101), so GET is byte-faithful.
  */
final class ApiServer(
    spark: SparkSession,
    storeDir: String,
    port: Int = 8000,
    monitoring: MonitoringService = new PrometheusMonitoring("gofish"),
    configStore: Option[ConfigStore] = None
) {

  // Persistence backend (reference backend.go factory): filesystem by
  // default, any ConfigStore (e.g. RemoteConfigStore over DynamoDB)
  // injectable.
  private val backend: ConfigStore = configStore.getOrElse(new FsConfigStore(storeDir))
  private val store = new ConcurrentHashMap[String, Array[Byte]]()
  // query runId → owning pipeline id, for per-pipeline metric
  // attribution (the reference increments from each pipeline's own
  // input goroutine; here the listener looks the owner up).
  private val owners = new ConcurrentHashMap[UUID, String]()
  private var server: HttpServer = _
  // Streaming checkpoints live in a sibling directory so the config
  // store holds only config files and a restart never trips over a
  // checkpoint directory (round-1 advice: IsADirectoryException).
  private val ckptDir = Paths.get(storeDir).resolveSibling(
    Paths.get(storeDir).getFileName.toString + "-checkpoints")
  Files.createDirectories(Paths.get(storeDir))
  Files.createDirectories(ckptDir)

  // reload persisted configs (reference: backend Init)
  locally {
    backend.loadAll().foreach { case (id, bytes) => store.put(id, bytes) }
  }

  def start(): Unit = {
    // The events counter is fed by a query listener — registering is
    // part of serving /metrics, not something callers must remember.
    listener = Metrics.listen(spark, monitoring, owners)
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/pipelines", (ex: HttpExchange) => handlePipelines(ex))
    server.createContext("/metrics", (ex: HttpExchange) => handleMetrics(ex))
    server.setExecutor(null)
    server.start()
  }

  private val started = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.streaming.StreamingQuery]()
  // live websocket->spool bridges owned by pipelines this server
  // compiled; Compiled.spools documents the caller-owns-close contract
  private val spools =
    new java.util.concurrent.ConcurrentLinkedQueue[graft.sources.WebSocketSpool.Handle]()
  // per-pipeline pin scopes (Compiled.pins): released when the owning
  // pipeline dies — at server stop, or immediately on a failed start.
  // Scope-local release is what makes this safe on the shared session:
  // it can never unpersist another pipeline's in-flight intermediates.
  private val pinScopes =
    new java.util.concurrent.ConcurrentLinkedQueue[graft.operators.Pinned.Scope]()
  // Guards the handoff between the async pipeline starter and stop():
  // once `stopping` is set (under the lock), a starter that raced past
  // it stops its freshly-started queries itself instead of parking
  // them in `started` where nobody would ever stop them.
  private val startedLock = new Object
  private var stopping = false
  private var listener: StreamingQueryListener = _

  /** Graceful shutdown (reference: SIGTERM → Shutdown, api.go:57-81):
    * stop accepting requests, then stop the queries THIS server started
    * (the session may host other owners' queries).
    */
  def stop(): Unit = {
    if (server != null) server.stop(0)
    startedLock.synchronized {
      stopping = true
      started.forEach { q =>
        try q.stop()
        catch { case e: Exception => System.err.println(s"[api] stopping query: ${e.getMessage}") }
      }
      started.clear()
    }
    spools.forEach { h =>
      try h.close()
      catch { case e: Exception => System.err.println(s"[api] closing spool: ${e.getMessage}") }
    }
    spools.clear()
    // queries are stopped, so no pipeline of ours will re-execute its
    // pinned frames — free them deterministically rather than per GC
    pinScopes.forEach { s =>
      try { s.release(blocking = false); () }
      catch { case e: Exception => System.err.println(s"[api] releasing pins: ${e.getMessage}") }
    }
    pinScopes.clear()
    if (listener != null) spark.streams.removeListener(listener)
  }

  def boundPort: Int = server.getAddress.getPort

  /** Tear down ONE pipeline's server-tracked resources: close its
    * websocket spool bridges and release its pin scope, deregistering
    * both from the server sets. The shared tail of the failed-start
    * and stop-race cleanups (stop() drains the whole sets instead).
    */
  private def releasePipeline(compiled: graft.pipeline.PipelineCompiler.Compiled, context: String): Unit = {
    compiled.spools.values.foreach { h =>
      try h.close()
      catch {
        case e: Exception => System.err.println(s"[api] closing spool $context: ${e.getMessage}")
      } finally spools.remove(h)
    }
    compiled.pins.foreach { s =>
      try { s.release(blocking = false); () }
      catch {
        case e: Exception => System.err.println(s"[api] releasing pins $context: ${e.getMessage}")
      } finally pinScopes.remove(s)
    }
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes)
    os.close()
  }

  private def handlePipelines(ex: HttpExchange): Unit =
    try {
      (ex.getRequestMethod, ex.getRequestURI.getPath.stripPrefix("/pipelines")) match {
        case ("POST", "" | "/") =>
          val raw = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          PipelineCompiler.compile(spark, raw, streaming = true) match {
            case Left(err) => respond(ex, 400, err)
            case Right(compiled) =>
              compiled.spools.values.foreach(spools.add)
              compiled.pins.foreach(pinScopes.add)
              val id = UUID.randomUUID().toString
              store.put(id, raw.getBytes(StandardCharsets.UTF_8))
              backend.put(id, raw.getBytes(StandardCharsets.UTF_8))
              monitoring.incrPipelines(id)
              // async start, failures logged only (api.go:134-139)
              new Thread(() =>
                try {
                  val qs = PipelineCompiler
                    .startStreaming(compiled, s"$ckptDir/$id", availableNow = false)
                  // Attribution registers after start: a first batch
                  // racing ahead lands on "unattributed" rather than
                  // vanishing (Metrics.listen).
                  qs.foreach(q => owners.put(q.runId, id))
                  startedLock.synchronized {
                    if (stopping) {
                      qs.foreach { q =>
                        try q.stop()
                        catch { case e: Exception => System.err.println(s"[api] stopping query: ${e.getMessage}") }
                      }
                      // stop() may already have drained spools/pinScopes
                      // before this compile finished registering — same
                      // cleanup as a failed start or this pipeline's
                      // bridges re-dial and its pins hold executor blocks
                      // for the JVM lifetime (round-11 ADVICE #3)
                      releasePipeline(compiled, "after stop race")
                    } else qs.foreach(started.add)
                  }
                } catch {
                  case e: Exception =>
                    System.err.println(s"[api] pipeline $id failed: ${e.getMessage}")
                    // a failed start must not leave websocket bridges
                    // re-dialing and spooling for the server's lifetime,
                    // nor its compile-time pins outliving it
                    releasePipeline(compiled, "after failed start")
                }
              ).start()
              respond(ex, 201, id)
          }
        case ("GET", path) if path.startsWith("/") && path.length > 1 =>
          val id = path.stripPrefix("/")
          // ids are server-generated UUIDs; anything else (separators,
          // dots, traversal — URI.getPath decodes %2F) is not a
          // pipeline id and must never reach a filesystem-backed store
          if (!id.matches("[A-Za-z0-9_-]{1,64}")) respond(ex, 404, "pipeline not found")
          else
          // cache first, then the backend — a shared remote store can
          // hold configs another node posted after this one started
          Option(store.get(id)).orElse(backend.get(id)) match {
            case Some(bytes) => respond(ex, 200, new String(bytes, StandardCharsets.UTF_8))
            case None        => respond(ex, 404, "pipeline not found")
          }
        case _ => respond(ex, 405, "method not allowed")
      }
    } catch {
      case e: Exception => respond(ex, 500, s"internal error: ${e.getMessage}")
    }

  private def handleMetrics(ex: HttpExchange): Unit =
    monitoring.metricsText match {
      case Some(body) => respond(ex, 200, body)
      // the reference registers /metrics only for the prometheus
      // backend (monitoring.go:89) — other backends have no scrape page
      case None => respond(ex, 404, "metrics not exposed by this monitoring backend")
    }
}

/** Feeds [[MonitoringService]]'s events counter from a
  * StreamingQueryListener instead of per-event instrumentation: each
  * micro-batch adds its `numInputRows` to the owning pipeline's
  * series (owner = the registered runId; a first batch racing ahead
  * of registration lands on "unattributed" rather than vanishing).
  */
object Metrics {

  def listen(
      spark: SparkSession,
      service: MonitoringService,
      owners: ConcurrentHashMap[UUID, String]
  ): StreamingQueryListener = {
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val pipeline = Option(owners.get(e.progress.runId)).getOrElse("unattributed")
        service.incrEventsReceived(pipeline, e.progress.numInputRows)
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(l)
    l
  }
}
