package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: rows for the same key belong to one session
  * while consecutive gaps stay <= `gapUs`.
  *
  * go-fish has only processing-time interval flushes (window.go:19-49);
  * this is the event-time generalization a real pipeline needs. Batch
  * form: one shuffle by key + a per-partition sort, then two window
  * sweeps (lag → cumulative sum). The streaming form is Spark's built-in
  * `session_window`, exposed in graft.streaming.
  *
  * `timeUs` must be LONG epoch-microseconds so the gap comparison is
  * integer arithmetic (bit-identical across engines and partitionings).
  */
object Sessionize {

  def apply(df: DataFrame, key: String, timeUs: String, tieBreak: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(timeUs), col(tieBreak))
    df.withColumn(
        "_new_session",
        when(col(timeUs) - lag(col(timeUs), 1).over(w) <= gapUs, 0).otherwise(1)
      )
      .withColumn(
        "session_id",
        sum(col("_new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("int")
      )
      .drop("_new_session")
  }
}
