package graft.api

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The config-persistence backend factory (reference backend.go):
  * name-based selection, byte-faithful fs round trips, and the
  * DynamoDB-parity retry/backoff over the RemoteKv seam.
  */
class ConfigBackendSpec extends AnyFunSuite with Matchers {

  test("factory: fs and dynamodb by name, invalid types are loud (reference parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg").toString
    ConfigStore("fs", dir).toOption.get shouldBe a[FsConfigStore]
    ConfigStore("boltdb", dir) shouldBe Left("Invalid backend type boltdb")
    ConfigStore("dynamodb") shouldBe Left(
      "dynamodb backend needs a RemoteKv transport (AWS SDK unavailable here)")
  }

  test("fs store round-trips raw bytes and reloads them (backend Init)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg_fs").toString
    val s = new FsConfigStore(dir)
    val raw = """{"eventFolder": "builtin"}""".getBytes("UTF-8")
    s.put("id-1", raw)
    s.get("id-1").get.toSeq shouldBe raw.toSeq // byte-faithful, like api.go GET
    s.get("missing") shouldBe None
    new FsConfigStore(dir).loadAll().view.mapValues(_.toSeq).toMap shouldBe
      Map("id-1" -> raw.toSeq)
  }

  test("remote store retries throttling with the 2^attempt backoff, then gives up loudly") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var failures = 2
    val kv = new RemoteKv {
      def putItem(id: String, config: Array[Byte]): Unit =
        if (failures > 0) { failures -= 1; throw new RetriableKvException("throttled") }
      def getItem(id: String): Option[Array[Byte]] = None
      def scanAll(): Map[String, Array[Byte]] = Map.empty
    }
    val s = new RemoteConfigStore(kv, retries = 3, sleep = sleeps += _)
    s.put("a", Array[Byte](1)) // succeeds on the third attempt
    sleeps.toSeq shouldBe Seq(200L, 400L) // exponential, ms
    // more throttles than retries → the exception propagates
    failures = 10
    val e = intercept[RetriableKvException](s.put("b", Array[Byte](2)))
    e.getMessage shouldBe "throttled"
    // non-retriable failures propagate immediately, no sleeps
    sleeps.clear()
    val boom = new RemoteKv {
      def putItem(id: String, config: Array[Byte]): Unit = throw new RuntimeException("denied")
      def getItem(id: String): Option[Array[Byte]] = None
      def scanAll(): Map[String, Array[Byte]] = Map.empty
    }
    intercept[RuntimeException](new RemoteConfigStore(boom, 3, sleeps += _).put("c", Array[Byte](3)))
    sleeps shouldBe empty
  }

  test("ApiServer round-trips through an injected remote store (the DynamoDB seam)") {
    val table = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    val kv = new RemoteKv {
      def putItem(id: String, config: Array[Byte]): Unit = { table.put(id, config); () }
      def getItem(id: String): Option[Array[Byte]] = Option(table.get(id))
      def scanAll(): Map[String, Array[Byte]] = {
        import scala.jdk.CollectionConverters._
        table.asScala.toMap
      }
    }
    table.put("pre-existing", "{}".getBytes("UTF-8"))
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg_api").toString
    val server = new ApiServer(
      graft.SparkSpec.session, dir, port = 0,
      configStore = Some(new RemoteConfigStore(kv)))
    server.start()
    try {
      val base = s"http://localhost:${server.boundPort}"
      val client = java.net.http.HttpClient.newHttpClient()
      // configs reloaded from the remote store at construction
      val got = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$base/pipelines/pre-existing")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      got.statusCode() shouldBe 200
      got.body() shouldBe "{}"
    } finally server.stop()
  }
}
