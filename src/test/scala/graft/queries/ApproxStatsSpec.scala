package graft.queries

import graft.SparkSpec

/** q45's verdict booleans must be TRUE at every shipped scale factor
  * — the gate's whole design ("deterministic-per-engine, never
  * flaky") collapses if a band is satisfiable at one SF and not
  * another. Round 14 found exactly that: the original p99 VALUE band
  * was unsatisfiable at sf0.001 (two tail order statistics 28% of
  * value apart straddle the interpolated p99), which is why the check
  * is now a rank band. This spec pins the Spark side at the two small
  * scale factors; the sf0.1 run lives in the verify sweep.
  */
class ApproxStatsSpec extends SparkSpec {

  private def verdicts(dir: String): Seq[(String, Boolean, Boolean, Boolean)] =
    graft.SparkEntry.queries("q45_approx_stats")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
      .toSeq

  test("all verdict booleans hold at sf0.001 and sf0.01") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val v = verdicts(dir)
      assert(v.nonEmpty)
      v.foreach { case (et, hll, p50, p99) =>
        assert(hll && p50 && p99, s"$dir $et: hll=$hll p50=$p50 p99=$p99")
      }
    }
  }
}
