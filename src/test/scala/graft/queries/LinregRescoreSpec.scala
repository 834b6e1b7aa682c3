package graft.queries

import graft.SparkSpec

/** q131's training-dynamics contract, beyond the oracle hash: the
  * trained re-scorer must actually LEARN the teacher (its MSE against
  * the teacher beats the null/mean model — GD at lr=0.5 under the
  * stability bound converged, it didn't diverge into a hash-stable
  * but meaningless ranking), and every query's shortlist re-ranks
  * completely (contiguous ranks).
  */
class LinregRescoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("the trained re-scorer fits the teacher better than the null model; ranks are contiguous") {
    val rows =
      try graft.SparkEntry.queries("q131_trained_rescore")(spark, dir).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(3), r.getDouble(4)))
      finally graft.operators.Pinned.release(spark, blocking = true)
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_._1)
    byQ.foreach { case (q, rs) =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"qid $q ranks not contiguous: $ranks")
      assert(ranks.length <= 10, s"qid $q shortlist exceeds the fused top-10")
    }
    val n = rows.length
    val mseModel = rows.iterator.map { case (_, _, s, y) => (s - y) * (s - y) }.sum / n
    val mean = rows.iterator.map(_._4).sum / n
    val mseNull = rows.iterator.map { case (_, _, _, y) => (y - mean) * (y - mean) }.sum / n
    assert(mseModel < mseNull,
      s"trained scorer no better than the teacher mean: $mseModel vs null $mseNull")
  }
}
