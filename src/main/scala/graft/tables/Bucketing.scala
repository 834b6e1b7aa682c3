package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout helpers: pre-shuffle a table ONCE at write time so
  * every future equi-join/aggregation on the bucket key runs with no
  * exchange at all — the difference between re-shuffling 100 TB per
  * query and never shuffling it again.
  *
  * Both sides of a join must agree on bucket count and key;
  * `spark.sql.sources.bucketing.enabled` (default true) lets the
  * planner consume the layout.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table
    * registered in the session catalog.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys — planner
    * proves co-location, no Exchange appears.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String, leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right), spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
