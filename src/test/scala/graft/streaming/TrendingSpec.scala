package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Windowed trending top-k: state-store round-trip of the SpaceSaving
  * buffers across micro-batches, append-mode once-per-closed-window
  * emission, and the two merge-semantics contracts (exact equality
  * with the batch sketch when capacity covers the key space, the
  * SpaceSaving bounds when it doesn't).
  */
class TrendingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  /** events: (minute, key, repeat) tuples expanded to rows */
  private def rows(spec: (Int, String, Int)*): Seq[(Timestamp, String)] =
    spec.flatMap { case (m, k, n) => Seq.fill(n)((ts(m), k)) }

  private def runStream(
      batches: Seq[Seq[(Timestamp, String)]],
      k: Int,
      capacity: Int,
      name: String): Array[org.apache.spark.sql.Row] = {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val in = MemoryStream[(Timestamp, String)]
    val out = Trending.topKByWindow(
      in.toDF().toDF("ts", "key"), "ts", "key", "10 minutes", "5 minutes", k, capacity)
    val q = out.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).orderBy("window_start").collect()
  }

  private def batchTopK(data: Seq[(Timestamp, String)], k: Int, capacity: Int) = {
    val s = spark
    import s.implicits._
    Trending
      .topKByWindow(data.toDF("ts", "key"), "ts", "key", "10 minutes", "5 minutes", k, capacity)
      .orderBy("window_start")
      .collect()
  }

  test("closed windows emit once with the exact top-k when capacity covers the keys") {
    // window 10:00-10:10 data split across THREE micro-batches (state
    // round-trips through serialize/deserialize between them), then a
    // late-window batch pushes the watermark past 10:10 to close it.
    val w1a = rows((1, "alpha", 5), (2, "beta", 3))
    val w1b = rows((3, "alpha", 4), (4, "gamma", 2))
    val w1c = rows((5, "beta", 1), (6, "delta", 1))
    val closer = rows((21, "zeta", 1), (22, "zeta", 1)) // watermark -> 10:17 > 10:10
    val got = runStream(Seq(w1a, w1b, w1c, closer), k = 3, capacity = 16, "trending_exact")
    assert(got.length == 1, s"exactly the closed window emits, got ${got.length}")
    val row = got.head
    assert(row.getTimestamp(0) == ts(0) && row.getTimestamp(1) == ts(10))
    val top = row.getSeq[org.apache.spark.sql.Row](2).map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // capacity 16 >= 4 distinct keys: the sketch is exact regardless of
    // micro-batch split points — alpha 9, beta 4, gamma 2, zero error
    assert(top == Seq(("alpha", 9L, 0L), ("beta", 4L, 0L), ("gamma", 2L, 0L)), top.toString)
  }

  test("multi-batch streaming equals the single-pass batch sketch when capacity covers the keys") {
    val all = rows((1, "a", 7), (2, "b", 5), (3, "c", 3), (4, "d", 2), (5, "e", 1))
    val streamed = runStream(
      Seq(rows((1, "a", 7), (2, "b", 5)), rows((3, "c", 3), (4, "d", 2), (5, "e", 1)),
        rows((25, "x", 1))),
      k = 4, capacity = 8, "trending_parity")
    val batch = batchTopK(all, k = 4, capacity = 8)
    // compare the closed 10:00 window against the batch computation
    assert(streamed.length == 1)
    assert(streamed.head.getSeq[org.apache.spark.sql.Row](2) ==
      batch.head.getSeq[org.apache.spark.sql.Row](2))
  }

  test("overflowed capacity keeps the SpaceSaving guarantees across micro-batch merges") {
    // 6 distinct keys into capacity 4, split adversarially across
    // batches: the true heavy hitter must surface, every reported cnt
    // must bound its true count within max_err, nothing exceeds cnt.
    val trueCounts = Map("hot" -> 12L, "warm" -> 6L, "k1" -> 2L, "k2" -> 2L, "k3" -> 1L, "k4" -> 1L)
    val b1 = rows((1, "k1", 2), (2, "hot", 4), (3, "k3", 1))
    val b2 = rows((4, "warm", 3), (5, "hot", 4), (6, "k2", 2))
    val b3 = rows((7, "hot", 4), (8, "warm", 3), (9, "k4", 1))
    val got = runStream(Seq(b1, b2, b3, rows((25, "z", 1))), k = 4, capacity = 4, "trending_bounds")
    assert(got.length == 1)
    val top = got.head.getSeq[org.apache.spark.sql.Row](2).map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(top.head._1 == "hot", s"true heavy hitter must lead: $top")
    top.foreach { case (item, cnt, err) =>
      val truth = trueCounts(item)
      assert(cnt >= truth, s"$item: reported $cnt under true $truth")
      assert(cnt - err <= truth, s"$item: cnt-err ${cnt - err} exceeds true $truth")
    }
  }

  test("batch and streaming share one plan shape (partial aggregation, bounded slots)") {
    val s = spark
    import s.implicits._
    val p = Trending
      .topKByWindow(rows((1, "a", 2)).toDF("ts", "key"), "ts", "key", "10 minutes", "5 minutes", 2, 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_space_saving_topk"), "map-side partial sketch expected")
  }
}
