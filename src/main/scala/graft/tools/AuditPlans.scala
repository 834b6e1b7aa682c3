package graft.tools

import graft._

/** Dev tool: sweep every catalog query's physical plan at sf0.001 and
  * tabulate the operators that decide 100 TB behavior — cartesian
  * products, nested-loop joins, single-partition exchanges, shuffle and
  * sort-merge counts. Counts come from the simple-mode explain text
  * because under AQE the executed plan is an AdaptiveSparkPlanExec
  * wrapper whose inner tree `collect` cannot see. One line per query;
  * hazards flagged with `!`.
  *
  *   sbt "runMain graft.tools.AuditPlans"
  */
object AuditPlans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    def occurrences(hay: String, needle: String): Int =
      needle.r.findAllMatchIn(hay).size
    println(f"${"query"}%-28s cart bnlj 1part shuf smj note")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val p = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode)
        val cart = occurrences(p, "CartesianProduct")
        val bnlj = occurrences(p, "BroadcastNestedLoopJoin")
        val onePart = occurrences(p, "Exchange SinglePartition")
        val shuf = occurrences(p, "Exchange ")
        val smj = occurrences(p, "SortMergeJoin")
        val flag = if (cart + bnlj + onePart > 0) " !" else ""
        println(f"$name%-28s $cart%4d $bnlj%4d $onePart%5d $shuf%4d $smj%3d$flag")
      } catch {
        case e: Exception => println(f"$name%-28s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
