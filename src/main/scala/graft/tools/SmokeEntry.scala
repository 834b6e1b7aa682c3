package graft.tools

/** Dev mirror of the driver's flagship smoke: SparkEntry.entry on
  * sf0.001 must return rows. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    // Same session config as the production entry points (GraftSession)
    // so the smoke exercises the engine under the benched planner
    // behavior, not a hand-rolled variant (round-15 advice).
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"FLAGSHIP_ROWS=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
