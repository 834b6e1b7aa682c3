package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev mirror of the driver's flagship smoke: SparkEntry.entry on
  * sf0.001 must return rows. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"FLAGSHIP_ROWS=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
