package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // 4 docs, hand-checkable: "apple" in 3 docs, "kiwi" in 1, "pear" in 0.
  private val corpus = Seq(
    (0L, "apple apple banana"),
    (1L, "apple banana banana cherry"),
    (2L, "banana cherry cherry"),
    (3L, "apple kiwi")
  ).toDF("doc_id", "text")

  private def run(queries: Seq[(Int, Seq[String])], k: Int = 10) =
    Bm25
      .topK(corpus, "doc_id", col("text"), queries, k1 = 1.2, b = 0.75, k = k)
      .orderBy("qid", "rank")
      .as[(Int, Int, Long, Double)]
      .collect()
      .toSeq

  /** Reference scorer in plain Scala — same rational-idf variant. */
  private def ref(terms: Seq[String]): Map[Long, Double] = {
    val docs = Seq(
      0L -> Seq("apple", "apple", "banana"),
      1L -> Seq("apple", "banana", "banana", "cherry"),
      2L -> Seq("banana", "cherry", "cherry"),
      3L -> Seq("apple", "kiwi")
    )
    val n = docs.size.toDouble
    val avgdl = docs.map(_._2.size).sum.toDouble / docs.size
    val dfOf = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    docs.flatMap { case (id, toks) =>
      val s = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0 || dfOf(t) == 0) 0.0
        else {
          val idf = (n - dfOf(t) + 0.5) / (dfOf(t) + 0.5)
          idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + (0.75 * toks.size) / avgdl))
        }
      }.sum
      if (s > 0) Some(id -> s) else None
    }.toMap
  }

  test("single-term query ranks by tf with length normalization, matching the reference") {
    val out = run(Seq(1 -> Seq("apple")))
    val want = ref(Seq("apple"))
    out.map(_._3).toSet shouldBe want.keySet // only matching docs appear
    out.foreach { case (_, _, id, score) => score shouldBe want(id) +- 1e-12 }
    // doc 0 has tf=2 in a short doc: the top hit
    out.head._3 shouldBe 0L
  }

  test("rarer term outscores a common one: kiwi-only doc tops a kiwi+apple query") {
    val out = run(Seq(1 -> Seq("apple", "kiwi")))
    // doc 3 gets apple AND the rare kiwi (df=1, idf=(4-1+.5)/1.5=2.33)
    out.head._3 shouldBe 3L
    val want = ref(Seq("apple", "kiwi"))
    out.foreach { case (_, _, id, score) => score shouldBe want(id) +- 1e-12 }
  }

  test("a term absent from the corpus contributes nothing and breaks nothing") {
    val out = run(Seq(1 -> Seq("apple", "zzz-missing")))
    val wantOnlyApple = ref(Seq("apple"))
    out.map(_._3).toSet shouldBe wantOnlyApple.keySet
    out.foreach { case (_, _, id, score) => score shouldBe wantOnlyApple(id) +- 1e-12 }
  }

  test("k caps the per-query result count; ties break by doc_id") {
    val out = run(Seq(1 -> Seq("banana")), k = 2)
    out.size shouldBe 2
    out.map(_._2) shouldBe Seq(1, 2)
  }

  test("multiple queries score independently in one pass") {
    val out = run(Seq(1 -> Seq("apple"), 2 -> Seq("cherry")))
    out.groupBy(_._1).keySet shouldBe Set(1, 2)
    val cherry = ref(Seq("cherry"))
    out.filter(_._1 == 2).foreach { case (_, _, id, s) => s shouldBe cherry(id) +- 1e-12 }
  }

  // ---- WAND / max-score pruning -------------------------------------------

  /** 2000 docs all containing the hot term; rare terms in a sliver.
    * Impacts differ per doc through length normalization (dl varies by
    * padding), so impact ordering is non-trivial.
    */
  private def hotCorpus = {
    val rows = (0 until 2000).map { i =>
      val pad = Seq.fill(i % 17)("filler" + (i % 5)).mkString(" ")
      val rare = if (i % 97 == 0) " needle" else ""
      (i.toLong, s"hotword common$pad$rare stuff$i")
    }
    rows.toDF("doc_id", "text")
  }

  private def collectTopK(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("qid", "rank").as[(Int, Int, Long, Double)].collect().toSeq

  test("pruned top-k is byte-identical to the exact form on the hand corpus") {
    for (cap <- Seq(1, 2, 100)) {
      val qs = Seq(1 -> Seq("apple", "kiwi"), 2 -> Seq("banana"))
      val exact = collectTopK(Bm25.topK(corpus, "doc_id", col("text"), qs, k = 3))
      val pruned =
        collectTopK(Bm25.topKPruned(corpus, "doc_id", col("text"), qs, k = 3, cap = cap))
      pruned shouldBe exact
    }
  }

  test("hot-term soak: candidates stay bounded by cap·terms and output stays exact") {
    val qs = Seq(1 -> Seq("hotword", "needle"), 2 -> Seq("hotword"))
    val (cands, result) =
      Bm25.prunedInternal(hotCorpus, "doc_id", col("text"), qs, 1.2, 0.75, 10, 50)
    // hot term has df=2000 but each (query, term) list is truncated to
    // 50: ≤ 2 queries × 2 terms × 50
    cands.count() should be <= 200L
    val exact = collectTopK(Bm25.topK(hotCorpus, "doc_id", col("text"), qs, k = 10))
    collectTopK(result) shouldBe exact
  }

  test("unsafe bound falls back to exact scoring (cap smaller than k)") {
    // cap=3 < k=8 on a hot list: the k-th candidate can't dominate the
    // exclusion bound, so the fallback path must fire — and the output
    // must STILL equal the unpruned ranking.
    val qs = Seq(1 -> Seq("hotword"))
    val exact = collectTopK(Bm25.topK(hotCorpus, "doc_id", col("text"), qs, k = 8))
    val pruned =
      collectTopK(Bm25.topKPruned(hotCorpus, "doc_id", col("text"), qs, k = 8, cap = 3))
    pruned shouldBe exact
  }

  test("impact truncation runs as WindowGroupLimit, not a full per-term sort") {
    // reuse=false keeps the raw composed plan (a checkpoint boundary
    // would hide the window operator from the downstream plan)
    val qs = Seq(1 -> Seq("hotword", "needle"))
    val (cands, _) =
      Bm25.prunedInternal(hotCorpus, "doc_id", col("text"), qs, 1.2, 0.75, 10, 50, reuse = false)
    val plan = cands.queryExecution.executedPlan.toString
    plan should include("WindowGroupLimit")
  }

  test("RM3 expansion retrieves a doc sharing NO original query term (the point of PRF)") {
    // alpha docs consistently co-occur with beta; doc 10 is beta-only.
    // A plain BM25 query for "alpha" can never return it; RM3 learns
    // "beta" from the feedback docs and pulls it in.
    val prf = (Seq(
      (1L, "alpha beta one filler words here"),
      (2L, "alpha beta two filler words here"),
      (3L, "alpha beta three filler words here"),
      (4L, "alpha beta four filler words here"),
      (10L, "beta beta beta entirely different text"),
      (11L, "unrelated noise document nothing shared")
    )).toDF("doc_id", "text")
    val q = Seq(1 -> Seq("alpha"))
    val plain = Bm25
      .topK(prf, "doc_id", col("text"), q, k = 10)
      .select("doc_id").as[Long].collect().toSet
    plain should not contain 10L
    val rm3 = Bm25
      .topKRm3(prf, "doc_id", col("text"), q, k = 10, fbDocs = 3, fbTerms = 1)
      .orderBy("rank")
      .select(col("doc_id"), col("rank")).as[(Long, Int)].collect()
    rm3.map(_._1) should contain(10L)
    // original-term docs still dominate: expansion mixes at λ=0.5,
    // it does not hijack the query
    rm3.head._1 should not be 10L
    // and the noise doc (shares neither alpha nor beta) stays out
    rm3.map(_._1) should not contain 11L
  }
}
