package graft.api

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The monitoring factory and both real backends (reference
  * monitoring.go): name-based selection with loud invalid names,
  * per-pipeline prometheus exposition, and the cloudwatch
  * accumulate + flush-daemon machinery behind the transport seam.
  */
class MonitoringSpec extends AnyFunSuite with Matchers {

  test("factory: empty is noop, unknown names are errors (reference parity)") {
    MonitoringService("") shouldBe Right(NoopMonitoring)
    MonitoringService("prometheus").toOption.get shouldBe a[PrometheusMonitoring]
    MonitoringService("cloudwatch").toOption.get shouldBe a[CloudWatchMonitoring]
    MonitoringService("statsd") shouldBe Left("Invalid monitoring service type statsd")
    NoopMonitoring.metricsText shouldBe None
  }

  test("prometheus backend renders per-pipeline series plus unlabeled totals") {
    val p = new PrometheusMonitoring("gofish")
    p.incrPipelines("a"); p.incrPipelines("a"); p.incrPipelines("b")
    p.incrEventsReceived("a", 41L); p.incrEventsReceived("a", 1L)
    val text = p.metricsText.get
    text should include("# TYPE gofish_pipelines gauge")
    text should include("gofish_pipelines 3")
    text should include("""gofish_pipelines{pipelineName="a"} 2""")
    text should include("""gofish_pipelines{pipelineName="b"} 1""")
    text should include("# TYPE gofish_events_received_total counter")
    text should include("gofish_events_received_total 42")
    text should include("""gofish_events_received_total{pipelineName="a"} 42""")
  }

  test("cloudwatch backend flushes cumulative per-pipeline datums through the transport") {
    val sent = scala.collection.mutable.ArrayBuffer[(String, Seq[CloudWatchMonitoring.Datum])]()
    val cw = new CloudWatchMonitoring("go-fish", 60, (ns, data) => sent.synchronized { sent += ns -> data; () })
    cw.incrPipelines("p1")
    cw.incrEventsReceived("p1", 10L)
    cw.incrEventsReceived("p2", 5L)
    cw.flush(nowMs = 1000L)
    sent.map(_._1).distinct shouldBe Seq("go-fish")
    val byPipeline = sent.flatMap(_._2).groupBy(_.dimensions("Pipeline"))
    byPipeline("p1").map(d => d.metricName -> d.value).toMap shouldBe
      Map("Pipelines" -> 1.0, "EventsReceived" -> 10.0)
    byPipeline("p2").map(d => d.metricName -> d.value).toMap shouldBe
      Map("Pipelines" -> 0.0, "EventsReceived" -> 5.0)
    all(sent.flatMap(_._2).map(_.timestampMs)) shouldBe 1000L
    all(sent.flatMap(_._2).map(_.unit)) shouldBe "Count"
    // cumulative, not deltas: the next flush re-sends running totals
    sent.clear()
    cw.incrEventsReceived("p1", 1L)
    cw.flush(nowMs = 2000L)
    sent.flatMap(_._2).filter(_.dimensions("Pipeline") == "p1")
      .map(d => d.metricName -> d.value).toMap shouldBe
      Map("Pipelines" -> 1.0, "EventsReceived" -> 11.0)
  }

  test("flush daemon ticks at the resolution and survives transport failures") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val cw = new CloudWatchMonitoring("ns", 1, (_, _) => {
      calls.incrementAndGet()
      throw new RuntimeException("wire down") // must be logged, not fatal
    })
    cw.incrPipelines("p")
    val t = cw.startFlushDaemon()
    try {
      val deadline = System.currentTimeMillis() + 10000
      while (calls.get() < 2 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      calls.get() should be >= 2 // kept ticking after the first failure
      t.isAlive shouldBe true
    } finally t.interrupt()
  }

  test("the unconfigured transport fails loudly at flush, never silently drops") {
    val cw = new CloudWatchMonitoring("ns", 60, CloudWatchMonitoring.unconfiguredTransport)
    cw.incrPipelines("p")
    val e = intercept[IllegalStateException](cw.flush())
    e.getMessage should include("no transport configured")
  }
}
