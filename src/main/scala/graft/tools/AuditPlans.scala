package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SimpleMode}
import org.apache.spark.sql.util.QueryExecutionListener

import graft._

/** Dev tool: sweep every catalog query's physical plan at sf0.001 and
  * tabulate the operators that decide 100 TB behavior — cartesian
  * products, nested-loop joins, single-partition exchanges, shuffle and
  * sort-merge counts. Counts come from the simple-mode explain text
  * because under AQE the executed plan is an AdaptiveSparkPlanExec
  * wrapper whose inner tree `collect` cannot see.
  *
  * Two blind spots of a returned-frame-only sweep are closed here:
  * a handful of queries run bounded Spark jobs DURING CONSTRUCTION
  * (q118's covariance aggregation, the IVF/PQ fits) whose plans never
  * appear in the returned frame, so a rewrite could hide a scale-killer
  * there. `captureBuild` runs the constructor under a
  * QueryExecutionListener (every SQL execution's plan, audited with the
  * same counters) plus a SparkListener job counter (raw RDD jobs that
  * bypass the SQL layer), and the sweep prints per-query build columns:
  * number of build-time SQL executions, raw jobs, and aggregated
  * build-plan hazards — flagged with `!` exactly like frame hazards.
  *
  *   sbt "runMain graft.tools.AuditPlans"
  */
object AuditPlans {

  /** Hazard/shape counters extracted from a simple-mode explain text. */
  final case class Audit(cart: Int, bnlj: Int, onePart: Int, shuf: Int, smj: Int) {
    def +(o: Audit): Audit =
      Audit(cart + o.cart, bnlj + o.bnlj, onePart + o.onePart, shuf + o.shuf, smj + o.smj)
    def hazards: Int = cart + bnlj + onePart
  }
  object Audit { val zero: Audit = Audit(0, 0, 0, 0, 0) }

  def auditText(p: String): Audit = {
    def n(needle: String): Int = needle.r.findAllMatchIn(p).size
    Audit(
      cart = n("CartesianProduct"),
      bnlj = n("BroadcastNestedLoopJoin"),
      onePart = n("Exchange SinglePartition"),
      shuf = n("Exchange "),
      smj = n("SortMergeJoin"))
  }

  /** What `body` executed on the cluster while it ran: the simple-mode
    * plan of every SQL execution it completed, and the count of raw
    * scheduler jobs it started (catches RDD actions that never pass
    * through the SQL layer). Build-time jobs are exactly these — the
    * returned frame's own plan is NOT included because the frame has
    * not been executed yet.
    */
  final case class BuildCapture[T](result: T, sqlPlans: Seq[String], rawJobs: Int)

  private val SentinelDesc = "graft-audit-sentinel"

  /** Run `body` and capture every SQL execution + scheduler job it
    * triggers. Listener buses are async, so completeness is established
    * with a sentinel: after `body` returns we run a recognizable
    * `spark.range` collect under a tagged job description and drain
    * both listeners until the sentinel is observed — bus queues are
    * FIFO, so sentinel-seen implies every earlier event was delivered.
    * Not re-entrant (one capture at a time per session); that is fine
    * for a dev sweep and for specs.
    */
  def captureBuild[T](spark: SparkSession)(body: => T): BuildCapture[T] = {
    val plans = new ConcurrentLinkedQueue[String]()
    @volatile var sqlSentinelSeen = false
    val sentinelRange = 424243L
    val qeListener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val p = qe.explainString(SimpleMode)
        if (p.contains(s"Range (0, $sentinelRange")) sqlSentinelSeen = true
        else plans.add(p)
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var jobSentinelSeen = false
    val jobListener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val prop = (k: String) =>
          Option(js.properties).flatMap(p => Option(p.getProperty(k)))
        if (prop("spark.job.description").contains(SentinelDesc)) jobSentinelSeen = true
        // count only jobs that BYPASS the SQL layer (no execution id):
        // jobs belonging to SQL executions are already audited via
        // their captured plans, and counting them here would make the
        // raw-jobs column indistinguishable from ordinary SQL noise
        else if (prop("spark.sql.execution.id").isEmpty) jobs.incrementAndGet()
      }
    }
    spark.listenerManager.register(qeListener)
    spark.sparkContext.addSparkListener(jobListener)
    try {
      val result = body
      // Sentinel: one tagged SQL collect flushes both buses.
      spark.sparkContext.setJobDescription(SentinelDesc)
      try spark.range(sentinelRange).limit(1).collect()
      finally spark.sparkContext.setJobDescription(null)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while ((!sqlSentinelSeen || !jobSentinelSeen) && System.nanoTime() < deadline)
        Thread.sleep(10)
      require(sqlSentinelSeen && jobSentinelSeen,
        "audit sentinel not observed within 10s — listener bus backed up")
      val buf = ArrayBuffer.empty[String]
      var p = plans.poll()
      while (p != null) { buf += p; p = plans.poll() }
      BuildCapture(result, buf.toSeq, jobs.get())
    } finally {
      spark.listenerManager.unregister(qeListener)
      spark.sparkContext.removeSparkListener(jobListener)
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    println(f"${"query"}%-28s cart bnlj 1part shuf smj | bexec bjobs bcart bbnlj b1p bshuf note")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val cap = captureBuild(spark)(fn(spark, dir))
        val frame = auditText(
          cap.result.queryExecution.explainString(SimpleMode))
        val build = cap.sqlPlans.map(auditText).foldLeft(Audit.zero)(_ + _)
        val flag =
          (if (frame.hazards > 0) " !" else "") +
            (if (build.hazards > 0) " !build" else "")
        println(
          f"$name%-28s ${frame.cart}%4d ${frame.bnlj}%4d ${frame.onePart}%5d " +
            f"${frame.shuf}%4d ${frame.smj}%3d | ${cap.sqlPlans.size}%5d " +
            f"${cap.rawJobs}%5d ${build.cart}%5d ${build.bnlj}%5d " +
            f"${build.onePart}%3d ${build.shuf}%5d$flag")
      } catch {
        case e: Exception => println(f"$name%-28s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
