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
}
