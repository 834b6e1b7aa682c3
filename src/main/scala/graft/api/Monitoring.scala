package graft.api

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** The reference's monitoring factory (monitoring.go:20-46): a service
  * chosen by name — "prometheus", "cloudwatch", "" (noop); anything
  * else is a configuration error — behind one interface of the two
  * record-processing metrics, both dimensioned by pipeline name:
  *
  *   - Pipelines       (gauge):   how many times each pipeline name
  *                                was configured
  *   - EventsReceived  (counter): records ingested per pipeline
  *
  * The reference increments per event from each input goroutine; here
  * a `StreamingQueryListener` adds each micro-batch's `numInputRows`
  * in one call — same series, no per-record instrumentation cost.
  */
trait MonitoringService {
  def incrPipelines(pipeline: String): Unit
  def incrEventsReceived(pipeline: String, n: Long): Unit

  /** Prometheus text exposition, when this service exposes one — the
    * reference registers the /metrics route only for the prometheus
    * backend (monitoring.go:89).
    */
  def metricsText: Option[String] = None
}

object MonitoringService {

  /** monitoring.go:34-46 — "" is noop, unknown names are errors (the
    * reference returns `Invalid monitoring service type`, it does not
    * silently fall back).
    */
  def apply(
      kind: String,
      namespace: String = "gofish",
      resolutionSec: Int = 60,
      cloudWatchTransport: CloudWatchMonitoring.Transport = CloudWatchMonitoring.unconfiguredTransport
  ): Either[String, MonitoringService] = kind match {
    case "prometheus" => Right(new PrometheusMonitoring(namespace))
    case "cloudwatch" =>
      Right(new CloudWatchMonitoring(namespace, resolutionSec, cloudWatchTransport))
    case ""    => Right(NoopMonitoring)
    case other => Left(s"Invalid monitoring service type $other")
  }
}

object NoopMonitoring extends MonitoringService {
  def incrPipelines(pipeline: String): Unit = ()
  def incrEventsReceived(pipeline: String, n: Long): Unit = ()
}

/** In-process registry rendered in prometheus text format
  * (monitoring.go:55-101): per-pipeline labeled series plus the
  * unlabeled totals. Lock-free hot path (LongAdder per series).
  */
final class PrometheusMonitoring(namespace: String) extends MonitoringService {
  private val pipelines = new ConcurrentHashMap[String, LongAdder]()
  private val events = new ConcurrentHashMap[String, LongAdder]()
  private def adder(m: ConcurrentHashMap[String, LongAdder], k: String): LongAdder =
    m.computeIfAbsent(k, _ => new LongAdder)

  def incrPipelines(pipeline: String): Unit = adder(pipelines, pipeline).increment()
  def incrEventsReceived(pipeline: String, n: Long): Unit = adder(events, pipeline).add(n)

  override def metricsText: Option[String] = {
    import scala.jdk.CollectionConverters._
    def family(name: String, typ: String, m: ConcurrentHashMap[String, LongAdder]): String = {
      val series = m.asScala.toSeq.sortBy(_._1)
      s"# TYPE $name $typ\n" +
        s"$name ${series.map(_._2.sum()).sum}\n" +
        series.map { case (p, v) => s"""$name{pipelineName="$p"} ${v.sum()}""" + "\n" }.mkString
    }
    Some(
      family(s"${namespace}_pipelines", "gauge", pipelines) +
        family(s"${namespace}_events_received_total", "counter", events))
  }
}

object CloudWatchMonitoring {

  /** One PutMetricData datum (cloudwatch.MetricDatum parity). */
  final case class Datum(
      metricName: String,
      dimensions: Map[String, String],
      unit: String,
      value: Double,
      timestampMs: Long
  )

  /** The PutMetricData seam: (namespace, data) => delivery. The AWS
    * SDK is not available in this environment, so the accumulate +
    * flush-daemon machinery is real and tested while the wire call is
    * injected — exactly the [[graft.multimodal.Media.Codec]] pattern.
    */
  type Transport = (String, Seq[Datum]) => Unit

  /** Fails at first flush instead of pretending metrics shipped. */
  val unconfiguredTransport: Transport = (ns, _) =>
    throw new IllegalStateException(
      s"cloudwatch monitoring for namespace '$ns' has no transport configured — " +
        "inject a PutMetricData-backed Transport")
}

/** CloudWatch backend (monitoring.go:103-201): cumulative per-pipeline
  * values accumulated locally and flushed every `resolutionSec` by a
  * daemon thread as `Pipelines` / `EventsReceived` datums dimensioned
  * by Pipeline — the reference flushes running totals, not deltas, and
  * so does this. A failed flush is logged and retried next tick
  * (monitoring.go:178-180); counts keep accumulating meanwhile.
  */
final class CloudWatchMonitoring(
    namespace: String,
    resolutionSec: Int,
    transport: CloudWatchMonitoring.Transport
) extends MonitoringService {
  require(resolutionSec > 0, s"resolutionSec must be positive, got $resolutionSec")

  private final class Counts {
    var pipelines = 0.0
    var events = 0.0
  }
  private val metrics = new ConcurrentHashMap[String, Counts]()
  private def counts(p: String): Counts = metrics.computeIfAbsent(p, _ => new Counts)

  def incrPipelines(pipeline: String): Unit = {
    val c = counts(pipeline)
    c.synchronized { c.pipelines += 1 }
  }

  def incrEventsReceived(pipeline: String, n: Long): Unit = {
    val c = counts(pipeline)
    c.synchronized { c.events += n.toDouble }
  }

  /** One flush pass: two datums per known pipeline, one transport call
    * per pipeline (monitoring.go:144-166's PutMetricData batching).
    * Public for tests and for a final flush at shutdown.
    */
  def flush(nowMs: Long = System.currentTimeMillis()): Unit = {
    import scala.jdk.CollectionConverters._
    metrics.asScala.toSeq.sortBy(_._1).foreach { case (p, c) =>
      val (pv, ev) = c.synchronized { (c.pipelines, c.events) }
      val dims = Map("Pipeline" -> p)
      transport(
        namespace,
        Seq(
          CloudWatchMonitoring.Datum("Pipelines", dims, "Count", pv, nowMs),
          CloudWatchMonitoring.Datum("EventsReceived", dims, "Count", ev, nowMs)
        )
      )
    }
  }

  /** The flush daemon (monitoring.go:138-143): sleeps the resolution,
    * flushes, logs-and-continues on transport failure. Daemon thread —
    * it never blocks JVM exit.
    */
  def startFlushDaemon(): Thread = {
    val t = new Thread(() =>
      while (!Thread.currentThread().isInterrupted) {
        Thread.sleep(resolutionSec * 1000L)
        try flush()
        catch {
          case _: InterruptedException => Thread.currentThread().interrupt()
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[monitoring] cloudwatch flush failed: ${e.getMessage}")
        }
      })
    t.setName("graft-cloudwatch-flush")
    t.setDaemon(true)
    t.start()
    t
  }
}
