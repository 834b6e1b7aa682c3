package graft.tools

import org.apache.spark.sql.DataFrame

/** Scratch timing harness for query tuning — not part of the library. */
object TimeQ90 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time(tag: String)(f: => DataFrame): Unit = {
      f.write.mode("overwrite").format("noop").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f.write.mode("overwrite").format("noop").save(); (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $tag%-10s min=${ts.min}%.2f med=${ts.sorted.apply(1)}%.2f")
    }
    time("q89") { graft.queries.Documents.q89DupNgramSpans(spark, dir) }
    time("q90") { graft.queries.Documents.q90SparseDocsim(spark, dir) }
    spark.stop()
  }
}
