package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{
  SparkListener,
  SparkListenerJobEnd,
  SparkListenerJobStart,
  SparkListenerStageCompleted
}

/** Dev tool (round 15): empirical time breakdown for one catalogued
  * query — where does the wall-clock go? Jobs, stages, task counts and
  * the driver-side gaps between jobs (planning, broadcast collect,
  * commit). The per-job rows expose loop-style queries whose cost is
  * many small sequential jobs (scheduling overhead) rather than data.
  *
  *   sbt "runMain graft.tools.JobProfile /root/testdata/sf0.1 q131_trained_rescore"
  */
object JobProfile {

  private final case class JobRow(id: Int, start: Long, var end: Long, var desc: String)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProfile <sfDir> <query>...")
    val dir = args(0)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    // (stageId, numTasks, wallMs, execRunMs, execCpuMs, deserMs)
    val stages = new ConcurrentLinkedQueue[(Int, Int, Long, Long, Long, Long)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, JobRow(e.jobId, e.time, -1L, d.take(60)))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = (for { a <- i.completionTime; b <- i.submissionTime } yield a - b).getOrElse(-1L)
        // executorRunTime = sum of task run time; the gap between the
        // stage wall and run/launch times is scheduling + codegen/plan.
        // taskMetrics is null for a stage aborted before any task
        // attempt ran — an unguarded dereference would NPE inside the
        // listener and silently drop every later stage row.
        val tm = Option(i.taskMetrics)
        val run = tm.map(_.executorRunTime).getOrElse(-1L)
        val cpu = tm.map(_.executorCpuTime / 1000000L).getOrElse(-1L)
        val deser = tm.map(_.executorDeserializeTime).getOrElse(-1L)
        stages.add((i.stageId, i.numTasks, ms, run, cpu, deser))
      }
    }

    args.drop(1).foreach { name =>
      // warmup, discarded (codegen/classload/scan-cache)
      graft.SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      graft.operators.Pinned.release(spark, blocking = true)

      jobs.clear(); stages.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.currentTimeMillis()
      graft.SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      val t1 = System.currentTimeMillis()
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
      graft.operators.Pinned.release(spark, blocking = true)

      val rows = {
        import scala.jdk.CollectionConverters._
        jobs.values().asScala.toSeq.sortBy(_.start)
      }
      val wall = t1 - t0
      val jobSum = rows.map(r => math.max(0L, r.end - r.start)).sum
      // driver-side gap = wall minus the union of job intervals
      val covered = {
        var last = t0; var cov = 0L
        rows.foreach { r =>
          val s = math.max(r.start, last); val e = math.max(r.end, s)
          if (e > s) cov += e - s
          last = math.max(last, r.end)
        }
        cov
      }
      val st = {
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq
      }
      println(f"\nPROFILE $name wall=${wall / 1e3}%.2fs jobs=${rows.size} jobMs=$jobSum " +
        f"gapMs=${wall - covered} stages=${st.size} tasks=${st.map(_._2).sum}")
      rows.foreach { r =>
        println(f"  job ${r.id}%3d +${r.start - t0}%6dms ${math.max(0L, r.end - r.start)}%6dms  ${r.desc}")
      }
      val heavy = st.sortBy(-_._3).take(8)
      heavy.foreach { case (sid, nt, ms, run, cpu, deser) =>
        println(f"  stage $sid%4d tasks=$nt%4d wall=${ms}%5dms taskRun=${run}%5dms " +
          f"taskCpu=${cpu}%5dms deser=${deser}%4dms")
      }
    }
    spark.stop()
  }
}
