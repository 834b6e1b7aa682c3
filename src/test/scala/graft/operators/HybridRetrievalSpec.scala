package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-form hybrid retrieval (WAND BM25 ⊕ IVFADC ⊕ RRF): the fused
  * output must be exactly the RRF of its two legs (fusion adds no
  * arithmetic surprises), self-id collisions between query ids and
  * corpus ids must NOT drop candidates (the excludeSelf=false
  * contract), and rank fidelity against the exact hybrid baseline
  * (brute-force L2 + unpruned BM25, fused identically) is gated at
  * calibrated overlap floors — the IvfadcSpec recall-gate pattern
  * applied to the composition.
  */
class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String): Double = {
    val dig = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Integer.toUnsignedLong(java.nio.ByteBuffer.wrap(dig).getInt).toDouble / 4294967295.0
  }

  /** The IvfadcSpec hierarchical fixture: 8 coarse clusters × 6
    * subclusters × 10 points in 16 dims, ids 0..479.
    */
  private lazy val vecRows: Seq[(Long, Seq[Double])] =
    for { k <- 0 until 8; g <- 0 until 6; i <- 0 until 10 } yield {
      val emb = (0 until 16).map { d =>
        (u(s"c:$k:$d") * 2 - 1) * 10.0 +
          (u(s"g:$k:$g:$d") * 2 - 1) * 2.0 +
          (u(s"p:$k:$g:$i:$d") * 2 - 1) * 0.1
      }
      ((k * 60 + g * 10 + i).toLong, emb: Seq[Double])
    }

  private val vocab = Seq(
    "spark", "join", "window", "agg", "batch", "scan", "vector", "stream",
    "filter", "query", "customer", "data", "table", "index", "merge", "sort")

  /** Text per doc: 12 words drawn deterministically from the vocab,
    * biased so words correlate with the coarse cluster — retrieval
    * has real signal, not uniform noise.
    */
  private lazy val docRows: Seq[(Long, String)] = vecRows.map { case (id, _) =>
    val k = (id / 60).toInt
    val words = (0 until 12).map { j =>
      val bias = if (j % 3 == 0) k * 2 % vocab.size else (u(s"w:$id:$j") * vocab.size).toInt
      vocab(bias.min(vocab.size - 1))
    }
    (id, words.mkString(" "))
  }

  private lazy val docs = docRows.toDF("doc_id", "text")
  private lazy val embs = vecRows.toDF("id", "emb")
  private lazy val index =
    Ivfadc.fit(embs, "id", "emb", coarseK = 8, coarseIters = 5, m = 4, pqK = 16, pqIters = 3)

  // query ids 5/17/100 deliberately COLLIDE with corpus ids; embeddings
  // are small perturbations of corpus points 7, 130, 305
  private val termQueries: Seq[(Int, Seq[String])] = Seq(
    5 -> Seq("spark", "join"),
    17 -> Seq("batch", "scan"),
    100 -> Seq("vector", "stream"))
  private lazy val queryEmb: Seq[(Long, Seq[Double])] = {
    val anchors = Map(5L -> 7L, 17L -> 130L, 100L -> 305L)
    anchors.toSeq.sortBy(_._1).map { case (qid, src) =>
      val base = vecRows.find(_._1 == src).get._2
      (qid, base.zipWithIndex.map { case (x, d) => x + (u(s"q:$qid:$d") * 2 - 1) * 0.05 })
    }
  }

  private val legK = 20
  private val k = 10

  private def hybrid =
    HybridRetrieval.topK(
      docs, "doc_id", col("text"), termQueries,
      index, queryEmb.toDF("qid", "qemb"), "qid", "qemb",
      k = k, legK = legK, cap = 8, nprobe = 2)

  /** Driver-side RRF replay over two collected legs. */
  private def fuseInScala(
      sparse: Map[(Int, Long), Int],
      dense: Map[(Int, Long), Int]): Map[Int, Seq[Long]] = {
    val keys = (sparse.keySet ++ dense.keySet).toSeq
    keys
      .map { case (qid, doc) =>
        val s = sparse.get((qid, doc)).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
        val d = dense.get((qid, doc)).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
        (qid, doc, s + d)
      }
      .groupBy(_._1)
      .map { case (qid, xs) =>
        qid -> xs.sortBy(x => (-x._3, x._2)).take(k).map(_._2)
      }
  }

  test("fused output IS the RRF of its two legs, byte-for-byte") {
    val sparse = Bm25
      .topKPruned(docs, "doc_id", col("text"), termQueries, 1.2, 0.75, legK, cap = 8)
      .select(col("qid"), col("doc_id"), col("rank"))
      .as[(Int, Long, Int)].collect().map { case (q, d, r) => (q, d) -> r }.toMap
    val dense = Ivfadc
      .searchDf(index, queryEmb.toDF("qid", "qemb"), "qid", "qemb", 2, legK, excludeSelf = false)
      .select(col("qid").cast("int"), col("nid"), col("rank"))
      .as[(Int, Long, Int)].collect().map { case (q, d, r) => (q, d) -> r }.toMap
    val expect = fuseInScala(sparse, dense)
    val got = hybrid
      .orderBy("qid", "rank")
      .select(col("qid"), col("doc_id"))
      .as[(Int, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSeq }
    got shouldBe expect
    // audit columns carry the leg ranks through the fusion
    val row = hybrid.filter(col("rank_sparse").isNotNull && col("rank_dense").isNotNull)
    row.count() should be > 0L
  }

  test("query ids colliding with corpus ids keep their self-matches (excludeSelf=false)") {
    // qid 5's embedding is a 0.05-perturbation of corpus vector 7 —
    // its own id 5 is a DIFFERENT corpus vector that may legitimately
    // rank; nothing may silently drop doc_id == qid rows
    val dense = Ivfadc
      .searchDf(index, queryEmb.toDF("qid", "qemb"), "qid", "qemb", 2, legK, excludeSelf = false)
    // the top dense hit must come from the anchor's COARSE cluster
    // (ADC ties across subcluster mates and can shuffle adjacent
    // subclusters, but crossing a coarse cluster means broken probe
    // routing), and the anchor itself must rank within the leg
    val top1 = dense.filter(col("rank") === 1)
      .select(col("qid"), col("nid")).as[(Long, Long)].collect().toMap
    top1.map { case (q, n) => q -> n / 60 } shouldBe Map(5L -> 0L, 17L -> 2L, 100L -> 5L)
    val anchored = dense
      .filter((col("qid") === 5 && col("nid") === 7) ||
        (col("qid") === 17 && col("nid") === 130) ||
        (col("qid") === 100 && col("nid") === 305))
      .count()
    anchored shouldBe 3L
    // and the default self-exclusion would have removed (qid,nid) pairs:
    val selfPairs = dense.filter(col("qid") === col("nid")).count()
    val excl = Ivfadc
      .searchDf(index, queryEmb.toDF("qid", "qemb"), "qid", "qemb", 2, legK)
      .filter(col("qid") === col("nid")).count()
    excl shouldBe 0L
    info(s"self-id candidates kept without excludeSelf: $selfPairs")
  }

  test("production composition: hybrid search off a SAVED+LOADED index is byte-identical") {
    // fit offline -> save -> load -> serve: the deployment shape
    val dir = java.nio.file.Files.createTempDirectory("graft_hybrid_idx").toString
    Ivfadc.save(index, dir)
    val loaded = Ivfadc.load(spark, dir)
    val served = HybridRetrieval.topK(
      docs, "doc_id", col("text"), termQueries,
      loaded, queryEmb.toDF("qid", "qemb"), "qid", "qemb",
      k = k, legK = legK, cap = 8, nprobe = 2)
    served.orderBy("qid", "rank").collect() shouldBe hybrid.orderBy("qid", "rank").collect()
  }

  test("rank fidelity: fused top-10 tracks the exact hybrid baseline (brute L2 + exact BM25)") {
    // exact dense leg: brute-force squared L2, self kept, top legK
    val denseTruth: Map[(Int, Long), Int] = queryEmb.flatMap { case (qid, qe) =>
      vecRows
        .map { case (n, ne) =>
          (ne.zip(qe).foldLeft(0.0) { case (a, (x, y)) => a + (x - y) * (x - y) }, n)
        }
        .sorted
        .take(legK)
        .zipWithIndex
        .map { case ((_, n), i) => (qid.toInt, n) -> (i + 1) }
    }.toMap
    // exact sparse leg: unpruned BM25 (identical scores by the WAND
    // exactness bound, so only the dense leg differs from the operator)
    val sparseTruth = Bm25
      .topK(docs, "doc_id", col("text"), termQueries, 1.2, 0.75, legK)
      .select(col("qid"), col("doc_id"), col("rank"))
      .as[(Int, Long, Int)].collect().map { case (q, d, r) => (q, d) -> r }.toMap
    val exact = fuseInScala(sparseTruth, denseTruth)
    val got = hybrid
      .select(col("qid"), col("doc_id"))
      .as[(Int, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val overlaps = exact.map { case (qid, truth) =>
      val o = got.getOrElse(qid, Set.empty).intersect(truth.toSet).size.toDouble / k
      info(s"qid $qid fused-vs-exact overlap@10: $o")
      o
    }
    // calibrated floors (measured 0.7/0.5/0.9 at pin time): ADC
    // quantization ties cost a few slots per query, but a broken leg
    // (wrong probe routing, dropped candidates, fusion bug) drops
    // overlap to near 0 — which is what the gate exists to catch
    overlaps.foreach(_ should be >= 0.4)
    (overlaps.sum / overlaps.size) should be >= 0.6
  }
}
