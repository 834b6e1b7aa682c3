package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.SparkSpec

/** Mirrors the reference's api_test.go: POST creates + 201 + UUID,
  * GET roundtrips the stored raw config bytes, 404 on unknown ids.
  */
class ApiServerSpec extends SparkSpec {

  private def withServer[T](f: (ApiServer, String) => T): T = {
    val dir = Files.createTempDirectory("graft_api").toString
    val srv = new ApiServer(spark, dir, port = 0)
    srv.start()
    try f(srv, s"http://localhost:${srv.boundPort}")
    finally srv.stop()
  }

  private val client = HttpClient.newHttpClient()

  private def get(url: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(), HttpResponse.BodyHandlers.ofString())

  private def post(url: String, body: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(url)).POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString()
    )

  private def validConfig: String = {
    val dir = Files.createTempDirectory("graft_api_in")
    Files.write(dir.resolve("data.txt"), "a\nab".getBytes)
    s"""{
       |  "eventFolder": "builtin",
       |  "rules": {"r": {"source": "in", "plugin": "aRule", "sink": "out"}},
       |  "states": {},
       |  "sources": {"in": {"type": "File", "path": "$dir"}},
       |  "sinks": {"out": {"type": "Memory"}}
       |}""".stripMargin
  }

  test("POST then GET roundtrips the raw config (api_test.go:49-118)") {
    withServer { (_, base) =>
      val cfg = validConfig
      val created = post(s"$base/pipelines", cfg)
      created.statusCode() shouldBe 201
      val id = created.body()
      id should fullyMatch regex "[0-9a-f-]{36}"

      val got = get(s"$base/pipelines/$id")
      got.statusCode() shouldBe 200
      got.body() shouldBe cfg // byte-faithful, like the reference
    }
  }

  test("GET of an unknown pipeline is 404") {
    withServer { (_, base) =>
      get(s"$base/pipelines/no-such-id").statusCode() shouldBe 404
    }
  }

  test("path-traversal ids never reach the filesystem store (404, no file read)") {
    withServer { (_, base) =>
      // URI.getPath decodes %2F, so these arrive as ../ segments; both
      // the id-format guard and FsConfigStore.safePath must reject them
      val probes = Seq(
        "..%2F..%2F..%2F..%2Fetc%2Fpasswd",
        "%2E%2E%2F%2E%2E%2Fetc%2Fpasswd",
        "a%2Fb",
        "..")
      probes.foreach { p =>
        val r = get(s"$base/pipelines/$p")
        r.statusCode() shouldBe 404
        r.body() should not include "root:"
      }
    }
  }

  test("POST of an invalid config is 400 with the validation message") {
    withServer { (_, base) =>
      val resp = post(
        s"$base/pipelines",
        """{"rules": {"r": {"source": "missing", "plugin": "aRule"}},
          | "sources": {}, "sinks": {}, "states": {}}""".stripMargin
      )
      resp.statusCode() shouldBe 400
      resp.body() should include("Invalid source")
    }
  }

  test("server restarts over a store that has hosted streaming pipelines") {
    // Round-1 advice: checkpoints used to live INSIDE the config store,
    // so the restart's config reload hit a directory and threw. A new
    // server over the same store must come up and still GET old configs.
    val dir = Files.createTempDirectory("graft_api_restart").toString
    val cfg = validConfig
    val srv1 = new ApiServer(spark, dir, port = 0)
    srv1.start()
    val id =
      try {
        val created = post(s"http://localhost:${srv1.boundPort}/pipelines", cfg)
        created.statusCode() shouldBe 201
        // Give the async start a moment to create checkpoint dirs.
        Thread.sleep(2000)
        created.body()
      } finally srv1.stop()

    val srv2 = new ApiServer(spark, dir, port = 0) // would throw pre-fix
    srv2.start()
    try {
      val got = get(s"http://localhost:${srv2.boundPort}/pipelines/$id")
      got.statusCode() shouldBe 200
      got.body() shouldBe cfg
    } finally srv2.stop()
  }

  test("unsupported methods get 405") {
    withServer { (_, base) =>
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/pipelines/some-id")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString()
      )
      resp.statusCode() shouldBe 405
    }
  }

  test("metrics endpoint exposes the two reference counters") {
    withServer { (_, base) =>
      val resp = get(s"$base/metrics")
      resp.statusCode() shouldBe 200
      resp.body() should include("gofish_pipelines")
      resp.body() should include("gofish_events_received_total")
    }
  }
}
