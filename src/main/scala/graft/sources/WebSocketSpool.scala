package graft.sources

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.CompletionStage

/** Live-feed → spool-directory bridge for websocket sources
  * (reference: `input/cert_stream.go:11-47`, the CertStream
  * Certificate-Transparency feed — which the reference itself marks
  * demo-only for memory pressure).
  *
  * Rather than a bespoke unbounded-buffer streaming source, the live
  * feed lands as ATOMIC newline-delimited spool files that the
  * standard file source tails — the production pattern for unreliable
  * push feeds: the bridge absorbs the feed's burstiness, every message
  * is durable before the engine sees it, and the same spool replays
  * byte-identically offline (the engine-side path is exercised by the
  * replay tests either way; SURVEY §2.1 CertStream row).
  *
  * Durability/visibility contract: messages buffer in memory and are
  * flushed every `flushEvery` messages (and on close) by writing a
  * dot-prefixed temp file and RENAMING it into place — Spark's file
  * listing ignores `.`/`_` prefixes, so a half-written file is never
  * picked up, and rename-in-place is atomic on a POSIX filesystem.
  * Uses the JDK's own `java.net.http.WebSocket` (RFC 6455) — no
  * extra dependency.
  */
object WebSocketSpool {

  final class Handle private[WebSocketSpool] (
      wsRef: java.util.concurrent.atomic.AtomicReference[WebSocket],
      flushFn: () => Unit,
      counter: AtomicLong,
      reconnects: AtomicLong,
      stopped: java.util.concurrent.atomic.AtomicBoolean) {

    /** Messages fully received so far (multi-frame messages count once
      * on their final frame).
      */
    def received: Long = counter.get()

    /** Times the bridge re-dialed after a drop (0 = never dropped). */
    def reconnected: Long = reconnects.get()

    /** Flush buffered messages to a spool file without closing. */
    def flush(): Unit = flushFn()

    /** Close the socket (best-effort goodbye), stop reconnecting, and
      * flush the tail.
      */
    def close(): Unit = {
      stopped.set(true)
      try wsRef.get().sendClose(WebSocket.NORMAL_CLOSURE, "done").join()
      catch { case _: Throwable => () }
      // a redial may have swapped in a NEW socket between the read
      // above and now; abort whatever is current as well (the redial
      // thread does the same on its side after observing `stopped`)
      try wsRef.get().abort()
      catch { case _: Throwable => () }
      flushFn()
    }
  }

  /** Connect to `uri` and spool every text message as one line under
    * `spoolDir`. Blocks until the first websocket handshake completes.
    * If the server drops the connection (close or error) before
    * [[Handle.close]] is called, the bridge flushes what it has and
    * re-dials with capped exponential backoff (1s, 2s, 4s, ... max
    * 30s) — live CT feeds drop routinely, and a certificate is only
    * durable once spooled, so the bridge must outlive the socket.
    * Messages have no cross-connection identity, so a drop between
    * receive and flush can lose (never duplicate) in-flight messages —
    * the same at-most-once contract as the reference's channel
    * (cert_stream.go), minus its unbounded buffering.
    */
  def run(uri: String, spoolDir: String, flushEvery: Int = 100): Handle = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    val buf = new java.util.ArrayList[String]()
    val received = new AtomicLong(0)
    val fileSeq = new AtomicLong(0)
    val reconnects = new AtomicLong(0)
    val stopped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val wsRef = new java.util.concurrent.atomic.AtomicReference[WebSocket]()
    def flush(): Unit = buf.synchronized {
      if (!buf.isEmpty) {
        val lines = new java.util.ArrayList[String](buf)
        buf.clear()
        val seq = fileSeq.incrementAndGet()
        val fin = dir.resolve(f"spool-${System.currentTimeMillis()}%013d-$seq%06d.jsonl")
        val tmp = dir.resolve(s".${fin.getFileName}.tmp")
        Files.write(tmp, lines, StandardCharsets.UTF_8,
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        Files.move(tmp, fin, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }
    def redial(): Unit = if (!stopped.get()) {
      flush() // make everything received so far durable before waiting
      val t = new Thread(() => {
        var backoffMs = 1000L
        var connected = false
        while (!connected && !stopped.get()) {
          Thread.sleep(backoffMs)
          backoffMs = math.min(backoffMs * 2, 30000L)
          try {
            if (!stopped.get()) {
              connect()
              reconnects.incrementAndGet()
              connected = true
              // close() may have run while connect() was in flight (it
              // only closed the OLD socket in wsRef): a socket observed
              // after `stopped` is torn down here, so no connection can
              // outlive the handle.
              if (stopped.get()) {
                try wsRef.get().abort()
                catch { case _: Throwable => () }
                flush()
              }
            }
          } catch { case _: Throwable => () }
        }
      })
      t.setDaemon(true)
      t.start()
    }
    def listener(): WebSocket.Listener = new WebSocket.Listener {
      // partial-frame assembly: onText may deliver a message in pieces
      private val part = new StringBuilder
      override def onText(ws: WebSocket, data: CharSequence, last: Boolean): CompletionStage[_] = {
        part.append(data)
        if (last) {
          // one line per message: strip embedded newlines so the spool
          // stays one-record-per-line (the reference re-marshals each
          // message to compact JSON, same effect)
          val line = part.toString.replace("\r", "").replace("\n", " ")
          part.setLength(0)
          buf.synchronized(buf.add(line))
          if (received.incrementAndGet() % flushEvery == 0) flush()
        }
        ws.request(1)
        null
      }
      override def onClose(ws: WebSocket, statusCode: Int, reason: String): CompletionStage[_] = {
        redial()
        null
      }
      override def onError(ws: WebSocket, error: Throwable): Unit = redial()
    }
    def connect(): Unit = {
      val ws = HttpClient
        .newHttpClient()
        .newWebSocketBuilder()
        .buildAsync(URI.create(uri), listener())
        .join()
      wsRef.set(ws)
    }
    connect()
    new Handle(wsRef, () => flush(), received, reconnects, stopped)
  }
}
