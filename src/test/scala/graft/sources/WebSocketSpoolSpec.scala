package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.ServerSocket
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.util.Base64

import scala.jdk.CollectionConverters._

import graft.{Fixtures, SparkSpec}
import graft.pipeline.PipelineCompiler

/** The live CertStream path, end-to-end and fully offline: a minimal
  * in-process RFC 6455 server (HTTP 101 upgrade + unmasked text
  * frames) feeds the JDK-client WebSocketSpool bridge, whose atomic
  * spool files then drive the standard CertStream pipeline arm — the
  * last reference source (input/cert_stream.go) exercised LIVE, not
  * just via replay.
  */
class WebSocketSpoolSpec extends SparkSpec {

  /** Serve `messages` as text frames to the first websocket client,
    * then send a close frame. Returns the ephemeral port.
    */
  private def startServer(messages: Seq[String]): Int = {
    val ss = new ServerSocket(0)
    val t = new Thread(() => {
      val s = ss.accept()
      try {
        val reader = new BufferedReader(new InputStreamReader(s.getInputStream, "UTF-8"))
        var key = ""
        var line = reader.readLine()
        while (line != null && line.nonEmpty) {
          if (line.toLowerCase.startsWith("sec-websocket-key:"))
            key = line.substring("sec-websocket-key:".length).trim
          line = reader.readLine()
        }
        val accept = Base64.getEncoder.encodeToString(
          MessageDigest
            .getInstance("SHA-1")
            .digest((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes("UTF-8")))
        val out = s.getOutputStream
        out.write(
          ("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
            s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n").getBytes("UTF-8"))
        out.flush()
        messages.foreach { m =>
          val p = m.getBytes("UTF-8")
          out.write(0x81) // FIN + text
          if (p.length < 126) out.write(p.length)
          else { out.write(126); out.write((p.length >> 8) & 0xff); out.write(p.length & 0xff) }
          out.write(p)
          out.flush()
        }
        out.write(Array[Byte](0x88.toByte, 0x02, 0x03, 0xe8.toByte)) // close 1000
        out.flush()
        Thread.sleep(300) // let the client answer the close
      } finally {
        try s.close()
        finally ss.close()
      }
    })
    t.setDaemon(true)
    t.start()
    ss.getLocalPort
  }

  private def await(cond: => Boolean, timeoutMs: Long = 15000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond shouldBe true
  }

  test("bridge spools every message atomically (no partial files visible)") {
    val msgs = (1 to 7).map(i => s"""{"seq": $i}""")
    val port = startServer(msgs)
    val dir = Files.createTempDirectory("graft_ws_spool").toString
    val h = WebSocketSpool.run(s"ws://127.0.0.1:$port/", dir, flushEvery = 3)
    await(h.received == 7)
    h.close()
    val files = Files.list(Paths.get(dir)).iterator().asScala.map(_.getFileName.toString).toSeq
    files.foreach(f => f should startWith("spool-")) // no dot-temp debris
    val lines = files.sorted
      .flatMap(f => Files.readAllLines(Paths.get(dir, f)).asScala)
    lines.sorted shouldBe msgs.sorted
    lines.size shouldBe 7
  }

  test("live CertStream pipeline: websocket feed -> spool -> domainCertIssued rule") {
    import org.apache.spark.sql.functions.col
    val cert = Fixtures.certStreamEvent.replace("\r", "").replace("\n", " ")
    val heartbeat = """{"message_type": "heartbeat"}"""
    val port = startServer(Seq(heartbeat, cert))
    val dir = Files.createTempDirectory("graft_ws_pipe").toString
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {"certs": {"source": "liveCerts", "plugin": "domainCertIssued", "sink": "memCerts"}},
         |  "states": {},
         |  "sources": {"liveCerts": {"type": "CertStream", "path": "$dir/spool",
         |               "certstream_config": {"url": "ws://127.0.0.1:$port/"}}},
         |  "sinks": {"memCerts": {"type": "Memory"}}
         |}""".stripMargin
    // live + batch is rejected (batch file listing is captured at
    // compile time, before the bridge has spooled anything)
    PipelineCompiler.compile(spark, config).isLeft shouldBe true
    // live + streaming: bridge starts at compile, AvailableNow picks up
    // every spool file flushed before the query starts
    val compiled = PipelineCompiler.compile(spark, config, streaming = true).toOption.get
    val handle = compiled.spools("liveCerts")
    await(handle.received == 2)
    handle.close() // flush the tail before the streaming query lists the spool
    val queries = PipelineCompiler.startStreaming(compiled, s"$dir/ckpt")
    queries.foreach(_.awaitTermination(60000))
    val out = spark.table("memCerts")
    out.count() shouldBe 1 // heartbeat filtered, cert kept
    out.select(col("Name")).head().getString(0) shouldBe "DomainNameSeenInCertificate"
    out.select(col("EventId")).head().getString(0) shouldBe "12345"
  }

  test("bridge reconnects with backoff after a server drop and keeps spooling") {
    val batch1 = Seq("""{"batch": 1, "n": 1}""", """{"batch": 1, "n": 2}""")
    val batch2 = Seq("""{"batch": 2, "n": 1}""", """{"batch": 2, "n": 2}""")
    val ss = new ServerSocket(0)
    val t = new Thread(() => {
      // two sequential connections on the same port: batch1, abrupt
      // drop (no close frame), then batch2 after the bridge re-dials
      Seq(batch1, batch2).foreach { batch =>
        val s = ss.accept()
        val reader = new BufferedReader(new InputStreamReader(s.getInputStream, "UTF-8"))
        var key = ""
        var line = reader.readLine()
        while (line != null && line.nonEmpty) {
          if (line.toLowerCase.startsWith("sec-websocket-key:"))
            key = line.substring("sec-websocket-key:".length).trim
          line = reader.readLine()
        }
        val accept = Base64.getEncoder.encodeToString(
          MessageDigest
            .getInstance("SHA-1")
            .digest((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes("UTF-8")))
        val out = s.getOutputStream
        out.write(
          ("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
            s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n").getBytes("UTF-8"))
        batch.foreach { m =>
          val p = m.getBytes("UTF-8")
          out.write(0x81); out.write(p.length); out.write(p)
        }
        out.flush()
        Thread.sleep(200) // let the frames land before the abrupt drop
        s.close() // no close frame: a real feed drop
      }
      ss.close()
    })
    t.setDaemon(true)
    t.start()
    val dir = Files.createTempDirectory("graft_ws_reconnect").toString
    val h = WebSocketSpool.run(s"ws://127.0.0.1:${ss.getLocalPort}/", dir)
    // second batch needs the ~1s re-dial; await BOTH counters — the
    // reconnect counter increments just after the new socket is live,
    // so frames can land a beat before it ticks
    await(h.received == 4 && h.reconnected >= 1, timeoutMs = 30000)
    h.close()
    val lines = Files
      .list(Paths.get(dir))
      .iterator()
      .asScala
      .toSeq
      .flatMap(p => Files.readAllLines(p).asScala)
    lines.sorted shouldBe (batch1 ++ batch2).sorted
  }

  test("certstream_config.url parses into SourceConfig.wsUrl; replay form has none") {
    val parsed = graft.pipeline.PipelineConfig
      .parse(
        """{"eventFolder": "builtin", "rules": {}, "states": {},
          |  "sources": {
          |    "live": {"type": "CertStream", "path": "/tmp/x",
          |             "certstream_config": {"url": "wss://example.test/feed"}},
          |    "replay": {"type": "CertStream", "path": "/tmp/y"}},
          |  "sinks": {}}""".stripMargin)
      .toOption
      .get
    parsed.sources("live").wsUrl shouldBe Some("wss://example.test/feed")
    parsed.sources("replay").wsUrl shouldBe None
  }
}
