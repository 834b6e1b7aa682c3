package graft.tools

import graft.SparkSpec

/** The plan sweep's build-time coverage: queries that run bounded Spark
  * jobs during CONSTRUCTION (q118's covariance aggregation, IVF/PQ
  * fits) must have those executions visible to the audit, or a rewrite
  * could hide a scale-killer in a plan the returned frame never shows.
  */
class AuditPlansSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("captureBuild sees q118's build-time covariance aggregation (incl. its shuffle)") {
    val cap = AuditPlans.captureBuild(spark) {
      graft.SparkEntry.queries("q118_power_iteration")(spark, dir)
    }
    // The covariance matrix is computed by driver-side jobs during
    // construction: at least one SQL execution must be captured, and
    // the aggregation over exploded (i,j) pairs shuffles.
    assert(cap.sqlPlans.nonEmpty,
      "q118 computes its covariance during construction — the sweep must see it")
    val build = cap.sqlPlans.map(AuditPlans.auditText).foldLeft(AuditPlans.Audit.zero)(_ + _)
    assert(build.shuf >= 1, s"expected a build-time shuffle, got $build")
    // And the build path stays hazard-free (no cartesian/BNLJ).
    assert(build.cart == 0 && build.bnlj == 0, s"build-time hazard: $build")
  }

  test("captureBuild reports zero build executions for a plan-only query") {
    val cap = AuditPlans.captureBuild(spark) {
      graft.SparkEntry.queries("q01_pricing_summary")(spark, dir)
    }
    assert(cap.sqlPlans.isEmpty, s"q01 should not execute at build time: ${cap.sqlPlans.size}")
    // Parquet file-listing may run as a small raw scheduler job when the
    // table is first touched; that is scan setup, not computation.
    assert(cap.rawJobs <= 2, s"unexpected build-time jobs: ${cap.rawJobs}")
  }

  test("captureBuild counts raw RDD jobs that bypass the SQL layer") {
    val cap = AuditPlans.captureBuild(spark) {
      spark.sparkContext.parallelize(1 to 8, 2).count()
    }
    assert(cap.result == 8L)
    assert(cap.rawJobs >= 1)
  }
}
