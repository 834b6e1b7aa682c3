package graft.queries

import graft.SparkSpec

/** q131's training-dynamics contract, beyond the oracle hash: the
  * trained re-scorer must actually LEARN the teacher — MSE against
  * the teacher beats the null/mean model (GD at lr=0.3 over the
  * standardized features converges; the r14 unstandardized lr=0.2
  * run measured ABOVE null at sf0.01, and lr=0.5 oscillated —
  * Vectors.scala's q131 header) — every query's shortlist re-ranks
  * completely (contiguous ranks), and the distilled RANKING tracks
  * the teacher: mean Spearman rho across queries above a pinned
  * floor, every query's rho positive. Both pinned at sf0.001 AND
  * sf0.01 so convergence is a property, not corpus luck.
  *
  * Why rho and not top-1 agreement (the r14 verdict's sketch): the
  * EXACT least-squares optimum on these features ranks the teacher's
  * top-1 first on 0 of 3 queries at sf0.01 (1 of 3 at sf0.001) —
  * measured during the round-15 anchor work — so top-1 is not a
  * property linear distillation can promise on this corpus; whole-
  * ranking correlation is. GD's mean rho lands ≈ 0.58 at both SFs
  * (the LS ceiling is ≈ 0.65–0.70).
  */
class LinregRescoreSpec extends SparkSpec {

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    val sf = dir.split('/').last
    test(s"$sf: re-scorer beats the null model; ranks contiguous; ranking tracks the teacher") {
      val rows =
        try graft.SparkEntry.queries("q131_trained_rescore")(spark, dir).collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getDouble(3), r.getDouble(4), r.getLong(2)))
        finally graft.operators.Pinned.release(spark, blocking = true)
      assert(rows.nonEmpty)
      val byQ = rows.groupBy(_._1)
      byQ.foreach { case (q, rs) =>
        val ranks = rs.map(_._2).sorted.toSeq
        assert(ranks == (1 to ranks.length), s"qid $q ranks not contiguous: $ranks")
        assert(ranks.length <= 10, s"qid $q shortlist exceeds the fused top-10")
      }
      val n = rows.length
      val mseModel = rows.iterator.map { case (_, _, s, y, _) => (s - y) * (s - y) }.sum / n
      val mean = rows.iterator.map(_._4).sum / n
      val mseNull = rows.iterator.map { case (_, _, _, y, _) => (y - mean) * (y - mean) }.sum / n
      assert(mseModel < mseNull,
        s"trained scorer no better than the teacher mean: $mseModel vs null $mseNull")

      // ranking anchor: student rank = the emitted rank column (score
      // desc, doc_id); teacher rank = position under (y desc, doc_id)
      // — the same tie-break. Floors leave ~25% margin under the
      // measured ≈0.58 means (min per-query rho measured 0.38).
      val perQ = byQ.toSeq.map { case (q, rs) =>
        val teacherRank = rs.sortBy(r => (-r._4, r._5)).zipWithIndex
          .map { case (r, i) => r._5 -> (i + 1) }.toMap
        val m = rs.length
        val d2 = rs.iterator.map { r =>
          val d = (r._2 - teacherRank(r._5)).toDouble; d * d
        }.sum
        val rho = if (m < 2) 1.0 else 1.0 - 6.0 * d2 / (m.toDouble * (m * m - 1))
        (q, rho)
      }
      val meanRho = perQ.map(_._2).sum / perQ.size
      val detail = perQ.sortBy(_._1).map { case (q, r) => f"q$q rho=$r%.3f" }.mkString(", ")
      assert(meanRho >= 0.45, f"mean Spearman rho vs teacher $meanRho%.3f below the 0.45 floor: $detail")
      perQ.foreach { case (q, rho) =>
        assert(rho > 0.1, f"qid $q rho=$rho%.3f not meaningfully positive: $detail")
      }
    }
  }
}
