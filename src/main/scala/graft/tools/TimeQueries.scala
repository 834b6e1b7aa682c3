package graft.tools

import org.apache.spark.sql.DataFrame

/** Scratch timing harness for text-query tuning — not part of the
  * library. min/median of 3 noop-sink runs per query.
  */
object TimeQueries {
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
    time("q32") { graft.queries.Documents.q32TextQuality(spark, dir) }
    time("q34") { graft.queries.Documents.q34Shingles(spark, dir) }
    time("q46") { graft.queries.Documents.q46Repetition(spark, dir) }
    time("q37") { graft.queries.TextPipeline.q37Winnow(spark, dir) }
    time("q38") { graft.queries.TextPipeline.q38LangId(spark, dir) }
    time("q39") { graft.queries.TextPipeline.q39Fingerprints(spark, dir) }
    spark.stop()
  }
}
