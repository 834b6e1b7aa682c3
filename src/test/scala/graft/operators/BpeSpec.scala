package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- plain-Scala reference BPE (independent of the Spark code) ----

  private def refApply(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refTrain(
      words: Map[String, Long],
      m: Int): List[(String, String, Long)] = {
    var tab = words.map { case (w, c) => w.toList.map(_.toString) -> c }.toList
    var learned = List.empty[(String, String, Long)]
    var done = false
    while (learned.size < m && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      tab.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        learned = learned :+ (l, r, c)
        tab = tab.map { case (syms, wc) => refApply(syms, l, r) -> wc }
      }
    }
    learned
  }

  private val corpus = Seq(
    "low low low low low lower lower newest newest",
    "newest newest newest newest widest widest widest"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private val corpusWords = Map(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("trainMerges matches the reference implementation, ranks and counts included") {
    val got = Bpe.trainMerges(corpus, col("text"), 8)
    got shouldBe refTrain(corpusWords, 8)
    // the classic first merges on this corpus: "es" (9), then "est" (9)
    got.head._1 + got.head._2 shouldBe "es"
    (got(1)._1 + got(1)._2) shouldBe "est"
  }

  test("encodeWord applies learned merges exactly as the reference does") {
    val merges = Bpe.trainMerges(corpus, col("text"), 6)
    val words = Seq("lowest", "newest", "wider", "low").toDF("w")
    val got = words
      .select(col("w"), Bpe.encodeWord(col("w"), merges.map(m => (m._1, m._2))).as("toks"))
      .as[(String, Seq[String])]
      .collect()
      .toMap
    words.as[String].collect().foreach { w =>
      val want = merges.foldLeft(w.toList.map(_.toString)) { case (s, (l, r, _)) =>
        refApply(s, l, r)
      }
      got(w) shouldBe want
    }
  }

  test("equal-symbol merges are greedy non-overlapping (run parity)") {
    val out = Seq("aaa", "aaaa", "aaaaa")
      .toDF("w")
      .select(col("w"), Bpe.applyMerge(Bpe.chars(col("w")), "a", "a").as("t"))
      .as[(String, Seq[String])]
      .collect()
      .toMap
    out("aaa") shouldBe Seq("aa", "a")
    out("aaaa") shouldBe Seq("aa", "aa")
    out("aaaaa") shouldBe Seq("aa", "aa", "a")
  }

  test("training stops early when the corpus is fully merged") {
    val tiny = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(tiny, col("text"), 5)
    merges shouldBe Seq(("a", "b", 2L))
  }

  // ---- checkpointEvery: the production-vocab path ----------------------------

  /** 150 deterministic 10-char pseudo-words over a 16-letter alphabet
    * with varied counts — 90 learnable merges (enough distinct pair
    * structure for the 70-round production-path test).
    */
  private lazy val bigWords: Map[String, Long] =
    (0 until 150).map { i =>
      val w = (0 until 10).map(j => ('a' + ((i * (j + 3) + 5 * j * j + i * i) % 16)).toChar).mkString
      w -> ((i % 5) + 1).toLong
    }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
  private lazy val bigCorpus = Seq(
    (0L, bigWords.toSeq.sortBy(_._1).flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.mkString(" "))
  ).toDF("doc_id", "text")

  test("checkpointEvery produces IDENTICAL merges to the unchunked path") {
    val unchunked = Bpe.trainMerges(corpus, col("text"), 8)
    Bpe.trainMerges(corpus, col("text"), 8, checkpointEvery = 1) shouldBe unchunked
    Bpe.trainMerges(corpus, col("text"), 8, checkpointEvery = 3) shouldBe unchunked
  }

  test("checkpointEvery lifts the 64-round cap: 70 merges match the reference") {
    val ref = refTrain(bigWords, 70)
    ref.size shouldBe 70 // the fixture really has 70 learnable merges
    // past 64 rounds the unchunked path refuses...
    val e = intercept[IllegalArgumentException](Bpe.trainMerges(bigCorpus, col("text"), 70))
    e.getMessage should include("checkpointEvery")
    // ...and the checkpointed path trains the full vocabulary exactly
    Bpe.trainMerges(bigCorpus, col("text"), 70, checkpointEvery = 8) shouldBe ref
  }

  test("checkpointEvery bounds the per-round analyzed-plan depth") {
    // analyzed-plan SIZE (string length) tracks the fold-expression
    // depth — plan node count doesn't, the fold chain is one Project
    def depths(checkpointEvery: Int): Seq[Int] = {
      val ds = scala.collection.mutable.ArrayBuffer.empty[Int]
      Bpe.trainMergesProbed(bigCorpus, col("text"), 16, checkpointEvery,
        (_, scored) => ds += scored.queryExecution.analyzed.toString.length)
      ds.toSeq
    }
    val chunked = depths(2)
    val unchunked = depths(0)
    // identical plumbing: both saw 16 rounds
    chunked.size shouldBe 16
    // unchunked grows without bound (each round folds one more merge)...
    unchunked.last.toDouble should be > unchunked.head * 4.0
    // ...checkpointed depth CYCLES: every round folds at most 2 pending
    // merges over the last materialization, so no round is deeper than
    // the deepest of the first cycle
    chunked.max shouldBe chunked.take(3).max
    chunked.max should be < unchunked.last
  }

  test("training releases its own pins: bounded storage during, zero after") {
    Pinned.release(spark, blocking = true) // clean slate from earlier suites
    val pinsPerRound = scala.collection.mutable.ArrayBuffer.empty[Int]
    Bpe.trainMergesProbed(bigCorpus, col("text"), 16, checkpointEvery = 2,
      (_, _) => pinsPerRound += Pinned.pinnedCount(spark))
    // at most the word-freq table + two symbol-table generations are
    // ever live (generation k-1 feeds k until k materializes); a
    // 30k-merge run must not accumulate superseded tables
    pinsPerRound.max should be <= 3
    // and the method cleans up after itself — nothing escapes but the
    // collected merge list
    Pinned.pinnedCount(spark) shouldBe 0
  }
}
