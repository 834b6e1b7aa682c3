package graft.queries

import graft.SparkSpec

/** q129's training-dynamics contract, beyond the oracle hash: the GD
  * trajectory must actually LEARN (monotone MSE descent under the
  * documented stability bound) and stay partitioning-invariant (the
  * decimal gradient sums are the mechanism — this is the property
  * that makes the trained weights reproducible on a 1000-executor
  * cluster exactly as on one).
  */
class LinregGdSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run() =
    // release the query's pinned intermediates once collected — each
    // invocation pins ~10 frames and the suite runs the query thrice
    try graft.SparkEntry.queries("q129_linreg_gd")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    finally graft.operators.Pinned.release(spark, blocking = true)

  test("MSE descends strictly every round (lr under the stability bound)") {
    val mses = run().filter(_._2 == "mse").sortBy(_._1).map(_._3)
    assert(mses.length == 9, s"rounds 0..8 expected, got ${mses.length}")
    mses.sliding(2).foreach { case Array(a, b) =>
      assert(b < a, s"MSE rose: $a -> $b — lr past the stability bound for this corpus")
    }
    assert(mses.last < mses.head / 5.0,
      s"training should cut MSE >5x over 8 rounds: ${mses.head} -> ${mses.last}")
  }

  test("the trajectory is invariant under input re-partitioning (decimal gradient sums)") {
    val base = run().toSeq
    val conf = spark.conf
    val prevShuffle = conf.get("spark.sql.shuffle.partitions")
    val prevSplit = conf.get("spark.sql.files.maxPartitionBytes")
    try {
      conf.set("spark.sql.shuffle.partitions", "3")
      // and genuinely different scan parallelism for the map-side
      // passes: a 64 KiB split cap fragments the parquet scan into
      // many more input partitions than the default 128 MiB
      conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
      val again = run().toSeq
      assert(again == base, "weights/losses changed under re-partitioning")
    } finally {
      conf.set("spark.sql.shuffle.partitions", prevShuffle)
      conf.set("spark.sql.files.maxPartitionBytes", prevSplit)
    }
  }
}
