package graft.queries

import graft.SparkSpec

/** MMR greedy invariants beyond the oracle hash (which pins exact
  * values at one dataset): structural properties that must hold for
  * ANY input, checked on the sf0.001 corpus for both the brute-force
  * (q128) and IVFADC-shortlist (q130) compositions.
  */
class MmrSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)
      .select("qid", "step", "nid", "rel", "score")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))

  for (q <- Seq("q128_mmr_rerank", "q130_mmr_ivfadc")) {
    test(s"$q: k selections per query, no duplicates, steps 1..k") {
      val byQ = rows(q).groupBy(_._1)
      byQ.foreach { case (qid, sel) =>
        assert(sel.length == 5, s"$qid: ${sel.length} selections")
        assert(sel.map(_._3).distinct.length == sel.length, s"$qid: duplicate nid selected")
        assert(sel.map(_._2).sorted.toSeq == (1 to 5), s"$qid: steps ${sel.map(_._2).toSeq}")
      }
    }

    test(s"$q: step 1 is the pure-relevance argmax; its score IS its rel") {
      rows(q).filter(_._2 == 1).foreach { case (qid, _, _, rel, score) =>
        assert(score == rel, s"$qid: step-1 score $score != rel $rel")
      }
      val byQ = rows(q).groupBy(_._1)
      byQ.foreach { case (qid, sel) =>
        val first = sel.find(_._2 == 1).get
        val maxRel = sel.map(_._4).max
        assert(first._4 == maxRel,
          s"$qid: step-1 rel ${first._4} below a later selection's rel $maxRel — " +
            "greedy must take the relevance argmax first")
      }
    }

    test(s"$q: diversity penalty only ever lowers a score below its rel") {
      rows(q).filter(_._2 > 1).foreach { case (qid, step, _, rel, score) =>
        // score = 0.7*rel - 0.3*maxsim with maxsim ∈ [-1, 1]:
        // against the all-positive corpus sims, score < rel strictly
        assert(score <= 0.7 * rel + 0.3 + 1e-12, s"$qid step $step: score $score out of band")
      }
    }
  }

  test("q130 consumes the q102 shortlist: every selected nid is a probed-ADC candidate") {
    val selected = rows("q130_mmr_ivfadc").map(r => (r._1, r._3)).toSet
    // q102's contract output is rank <= 5; the shortlist is rank <= 20 —
    // re-derive it through the same public search path
    val e = graft.tables.Tables.embeddings(spark, dir).selectExpr(
      "vec_id", "transform(embedding, x -> cast(x as double)) as e")
    val idx = graft.operators.Ivfadc.fit(
      e, idCol = "vec_id", embCol = "e", coarseK = 8, coarseIters = 3, m = 4, pqK = 4, pqIters = 2)
    val qs = e.filter("vec_id < 8").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).sortBy(_._1).toSeq
    val shortlist = graft.operators.Ivfadc.search(idx, qs, nprobe = 2, k = 20)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(selected.subsetOf(shortlist),
      s"selections outside the ANN shortlist: ${selected.diff(shortlist)}")
  }
}
