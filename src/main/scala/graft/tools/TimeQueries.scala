package graft.tools

/** Scratch timing harness for query tuning — not part of the library.
  * min/median of 3 noop-sink runs per catalogued query (plus one
  * discarded warmup), mirroring Bench's measurement protocol.
  *
  *   sbt "runMain graft.tools.TimeQueries /root/testdata/sf0.1 q91_fuzzy_editdist q90_sparse_docsim"
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQueries <sfDir> <query>...")
    val dir = args(0)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        graft.operators.Pinned.release(spark, blocking = true)
        dt
      }
      run() // warmup, discarded
      val ts = (1 to 3).map(_ => run()).sorted
      println(f"TIMEQ $name%-24s min=${ts.head}%.2f med=${ts(1)}%.2f")
    }
    spark.stop()
  }
}
