package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog over the driver-generated parquet corpus (TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst predicate pushdown /
  * column pruning apply; the only normalization done here is the
  * `events.ts` column, whose physical encoding has varied across
  * corpus generations — TIMESTAMP(NANOS) (unsupported natively by
  * Spark; surfaces as LONG under `nanosAsLong`) or standard
  * TIMESTAMP(MICROS). Either way it is surfaced uniformly as:
  *   - `ts`     TIMESTAMP_NTZ, microsecond precision (the nanos form
  *              truncated, which is exactly what DuckDB does when
  *              reading the same file), and
  *   - `ts_us`  LONG epoch microseconds, for arithmetic that must be
  *              bit-identical across engines.
  */
object Tables {

  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val aux: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ aux

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(path(dir, name))

  /** `events` with its timestamp encoding normalized (see class doc). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, "events"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // TIMESTAMP(NANOS) surfaced as epoch-nano longs by nanosAsLong
        raw
          .withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case _ =>
        // standard TIMESTAMP(MICROS); session TZ is pinned UTC, so the
        // tz-less and tz-ful forms name the same instant
        raw
          .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view (for SQL-surface queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
