package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkEntry

/** Dev diagnostic: which catalog queries plan a global (no-partition)
  * window? Those serialize onto one task — the exact pattern the round-3
  * verdict flagged on q73. Walks the OPTIMIZED logical plan (pre-execution,
  * cheap) and prints offenders.
  */
object FindGlobalWindows {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val offenders = df.queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty =>
            w.windowExpressions.map(_.sql).mkString("; ")
        }
        if (offenders.nonEmpty) {
          bad += 1
          println(s"GLOBAL-WINDOW $name: ${offenders.mkString(" | ")}")
        }
      } catch {
        case e: Throwable => println(s"ERROR $name: ${e.getMessage}")
      }
    }
    println(s"done, $bad queries with global windows")
    spark.stop()
  }
}
