package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The long-lived-session contract for operators that pin
  * intermediates with lazy local checkpoints (Bm25, Dedup, Ivfadc,
  * ConnectedComponents, ImportanceWeights, Bpe):
  *
  *   - pins accumulate across engine calls when nobody releases
  *     (the GC eventually frees them, but lazily — the round-9 bench
  *     session measured ~18s of phantom cost from exactly this);
  *   - `Pinned.release` on a request boundary frees them
  *     deterministically, and repeated call→release cycles show
  *     ZERO storage growth with byte-identical results per cycle;
  *   - a released frame that is re-executed fails loudly (checkpoint
  *     block gone) — it never silently recomputes.
  */
class PinnedSessionSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "apple apple banana kiwi"),
    (1L, "apple banana banana cherry"),
    (2L, "banana cherry cherry plum"),
    (3L, "apple kiwi plum plum"),
    (4L, "apple apple banana kiwi"),
    (5L, "cherry plum kiwi banana")
  ).toDF("doc_id", "text")

  private val queries = Seq(1 -> Seq("apple", "kiwi"), 2 -> Seq("cherry", "plum"))

  private def runPruned() =
    Bm25
      .topKPruned(corpus, "doc_id", col("text"), queries, k = 3, cap = 2)
      .orderBy("qid", "rank")
      .collect()
      .toSeq

  private def runDedup() =
    Dedup
      .minhashNearDups(corpus, "doc_id", "text", verifyCandidatesOnly = true)
      .orderBy("id1", "id2")
      .collect()
      .toSeq

  test("pins accumulate without release; release frees every one") {
    spark.catalog.clearCache() // clean slate from earlier suites
    Pinned.release(spark, blocking = true)
    Pinned.pinnedCount(spark) shouldBe 0

    // Hold the result frames across the assertions: pins from a
    // DISCARDED call are eventually ContextCleaner-collected (that's
    // the lazy GC path the registry exists to beat), which would race
    // the strict-growth check below.
    val r1 = Bm25.topKPruned(corpus, "doc_id", col("text"), queries, k = 3, cap = 2)
    r1.collect()
    val afterOne = Pinned.pinnedCount(spark)
    afterOne should be > 0 // topKPruned pins posting/capped/candidate frames

    val r2 = Bm25.topKPruned(corpus, "doc_id", col("text"), queries, k = 3, cap = 2)
    r2.collect()
    Pinned.pinnedCount(spark) shouldBe (2 * afterOne) // strict per-call growth

    val freed = Pinned.release(spark, blocking = true)
    freed shouldBe (2 * afterOne)
    Pinned.pinnedCount(spark) shouldBe 0
    Pinned.pinnedBytes(spark) shouldBe 0L
  }

  test("repeated call->release cycles: zero storage growth, identical results") {
    // The request boundary pairs BOTH hygiene calls, exactly as the
    // Bench/Verify harnesses do: clearCache() for CacheManager
    // entries (minhashNearDups' persistShingles), Pinned.release for
    // the checkpoint pins clearCache can't reach.
    def boundary(): Unit = {
      spark.catalog.clearCache()
      Pinned.release(spark, blocking = true)
    }
    boundary()
    val sc = spark.sparkContext
    val basePersistent = sc.getPersistentRDDs.size

    val first = runPruned()
    val firstDedup = runDedup()
    boundary()

    (1 to 4).foreach { i =>
      runPruned() shouldBe first
      runDedup() shouldBe firstDedup
      boundary()
      withClue(s"cycle $i: ") {
        Pinned.pinnedCount(spark) shouldBe 0
        // nothing of ours leaked past the boundary (<= not ==: the
        // ContextCleaner may concurrently collect OTHER suites'
        // discarded frames, shrinking the map under us)
        sc.getPersistentRDDs.size should be <= basePersistent
      }
    }
  }

  test("scoped release frees only the scope's own pins (concurrent-pipeline safety)") {
    spark.catalog.clearCache()
    Pinned.release(spark, blocking = true)

    // Two "pipelines" sharing the session, each collecting into its own
    // scope — the ApiServer shape. Releasing A must not break B.
    val (a, scopeA) = Pinned.collecting(spark) {
      val d = Pinned.pin(corpus.select(col("doc_id"), expr("length(text)").as("len")))
      d.collect() // materialize the checkpoint blocks
      d
    }
    val (b, scopeB) = Pinned.collecting(spark) {
      val d = Pinned.pin(corpus.select(col("doc_id"), expr("upper(text)").as("u")))
      d.collect()
      d
    }
    scopeA.size should be > 0
    scopeB.size should be > 0

    scopeA.release(blocking = true) should be > 0
    // B's frame still executes — its pin was untouched by A's release
    b.collect().length shouldBe 6
    scopeB.size should be > 0
    // A's frame is gone, loudly
    intercept[Exception](a.collect())

    scopeB.release(blocking = true)
    Pinned.pinnedCount(spark) shouldBe 0
  }

  test("product batch path: N compile->runBatch cycles hold zero pin growth") {
    import graft.pipeline.PipelineCompiler
    spark.catalog.clearCache()
    Pinned.release(spark, blocking = true)

    // nearDup runs its clustering EAGERLY at compile (CorpusRules
    // caveat), pinning CC label frames — exactly the serving-path leak
    // the round-10 verdict flagged: before this round, nothing on the
    // product path ever released them.
    val dir = java.nio.file.Files.createTempDirectory("graft_pin_pipeline").toString
    // Docs 10/11 are a guaranteed SimHash near-dup pair (inserting
    // "apple" into the 23-token pangram flips 0 of the 64 bits —
    // verified against the same md5 kernel), so nearDup's eager
    // ConnectedComponents run always has edges and always pins.
    val pangram = "the quick brown fox jumps over the lazy dog while pack my box " +
      "with five dozen liquor jugs and bright vixens jump quickly"
    corpus
      .unionByName(Seq((10L, pangram), (11L, s"apple $pangram")).toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$dir/in")
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {"dedup": {"source": "docs", "plugin": "nearDup", "sink": "out"}},
         |  "states": {},
         |  "sources": {"docs": {"type": "File", "path": "$dir/in", "format": "parquet"}},
         |  "sinks": {"out": {"type": "File", "path": "$dir/out", "format": "parquet"}}
         |}""".stripMargin

    val first = {
      val c = PipelineCompiler.compile(spark, config).toOption.get
      withClue("compile should have pinned CC intermediates: ") {
        c.pins.map(_.size).getOrElse(0) should be > 0
      }
      PipelineCompiler.runBatch(c)
      spark.read.parquet(s"$dir/out").orderBy("doc_id").collect().toSeq
    }
    (1 to 3).foreach { i =>
      val c = PipelineCompiler.compile(spark, config).toOption.get
      PipelineCompiler.runBatch(c)
      withClue(s"cycle $i: ") {
        // runBatch released post-commit: nothing of this pipeline's
        // pins survives its own request boundary
        c.pins.map(_.size).getOrElse(-1) shouldBe 0
        Pinned.pinnedCount(spark) shouldBe 0
        spark.read.parquet(s"$dir/out").orderBy("doc_id").collect().toSeq shouldBe first
      }
    }
  }

  test("a throwing collecting body releases its pins before rethrowing") {
    spark.catalog.clearCache()
    Pinned.release(spark, blocking = true)
    Pinned.pinnedCount(spark) shouldBe 0

    // The failed-compile shape (round-11 verdict #3): pins built inside
    // the scope, then the body throws before the caller could ever
    // receive the Scope — nothing may be stranded on the GC lifecycle.
    val boom = intercept[RuntimeException] {
      Pinned.collecting(spark) {
        val d = Pinned.pin(corpus.select(col("doc_id"), expr("length(text)").as("len")))
        d.collect() // materialize the checkpoint blocks
        sys.error("compile failed after pinning")
      }
    }
    boom.getMessage should include("compile failed after pinning")
    Pinned.pinnedCount(spark) shouldBe 0
    Pinned.pinnedBytes(spark) shouldBe 0L
  }

  test("mixed Memory+File pipeline: runBatch keeps only the Memory-reachable pins") {
    import graft.pipeline.PipelineCompiler
    spark.catalog.clearCache()
    Pinned.release(spark, blocking = true)

    val dir = java.nio.file.Files.createTempDirectory("graft_pin_mixed").toString
    val pangram = "the quick brown fox jumps over the lazy dog while pack my box " +
      "with five dozen liquor jugs and bright vixens jump quickly"
    corpus
      .unionByName(Seq((10L, pangram), (11L, s"apple $pangram")).toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$dir/in")
    // two independent nearDup applications: each pins its own CC
    // frames; only the Memory sink's remain live after runBatch
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {
         |    "dedupLive": {"source": "docs", "plugin": "nearDup", "sink": "live"},
         |    "dedupFile": {"source": "docs", "plugin": "nearDup", "sink": "out"}
         |  },
         |  "states": {},
         |  "sources": {"docs": {"type": "File", "path": "$dir/in", "format": "parquet"}},
         |  "sinks": {
         |    "live": {"type": "Memory"},
         |    "out": {"type": "File", "path": "$dir/out", "format": "parquet"}
         |  }
         |}""".stripMargin

    val c = PipelineCompiler.compile(spark, config).toOption.get
    val before = c.pins.map(_.size).getOrElse(0)
    before should be > 0
    PipelineCompiler.runBatch(c)

    // per-frame carve-out: the File sink's pins are gone, the Memory
    // view's survive for the caller
    val after = c.pins.map(_.size).getOrElse(-1)
    after should be > 0
    after should be < before
    spark.read.parquet(s"$dir/out").count() should be > 0L
    val live = spark.table("live").orderBy("doc_id").collect()
    live.length should be > 0
    // caller-owned release: view dies loudly, nothing leaks
    c.pins.foreach(_.release(blocking = true))
    Pinned.pinnedCount(spark) shouldBe 0
    intercept[Exception](spark.table("live").collect())
    spark.catalog.dropTempView("live")
  }

  test("a runBatch whose sink write throws releases the pipeline's pins") {
    import graft.pipeline.PipelineCompiler
    spark.catalog.clearCache()
    Pinned.release(spark, blocking = true)

    val dir = java.nio.file.Files.createTempDirectory("graft_pin_throw").toString
    val pangram = "the quick brown fox jumps over the lazy dog while pack my box " +
      "with five dozen liquor jugs and bright vixens jump quickly"
    corpus
      .unionByName(Seq((10L, pangram), (11L, s"apple $pangram")).toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$dir/in")
    // the sink path routes THROUGH a regular file — mkdir fails at
    // write time (works even as root, unlike a read-only dir), after
    // compile already pinned the CC frames
    val blocker = java.nio.file.Paths.get(dir, "blocker")
    java.nio.file.Files.writeString(blocker, "not a directory")
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {"dedup": {"source": "docs", "plugin": "nearDup", "sink": "out"}},
         |  "states": {},
         |  "sources": {"docs": {"type": "File", "path": "$dir/in", "format": "parquet"}},
         |  "sinks": {"out": {"type": "File", "path": "$blocker/sub/out", "format": "parquet"}}
         |}""".stripMargin
    val c = PipelineCompiler.compile(spark, config).toOption.get
    c.pins.map(_.size).getOrElse(0) should be > 0
    intercept[Exception](PipelineCompiler.runBatch(c))
    // the failed batch is abandoned — its pins were released in the
    // catch, not stranded on GC (round-11 ADVICE #2)
    c.pins.map(_.size).getOrElse(-1) shouldBe 0
    Pinned.pinnedCount(spark) shouldBe 0
  }

  test("pinIds reaches a pin NESTED behind another pin's checkpoint lineage (pin-of-pin)") {
    spark.catalog.clearCache()
    Pinned.release(spark, blocking = true)

    // The ADVICE-r12 scenario: inner pin materialized (lineage
    // truncated to its checkpoint blocks), outer pin built OVER it and
    // handed out unexecuted — the Memory-sink view shape. The outer
    // frame's analyzed plan shows only the outer LogicalRDD; the inner
    // pin is visible only through the RDD dependency graph.
    val ((inner, outer), scope) = Pinned.collecting(spark) {
      val i = Pinned.pin(corpus.select(col("doc_id"), expr("length(text)").as("len")))
      i.collect() // materialize: lineage truncates to the checkpoint
      val o = Pinned.pin(i.filter(col("len") > 0).select(col("doc_id"), (col("len") * 2).as("l2")))
      (i, o) // o is NOT executed — a live view the caller still owns
    }
    scope.size shouldBe 2

    val keep = Pinned.pinIds(outer)
    // plan-only reachability sees 1 (the outer leaf); the dependency
    // walk must find the inner pin too
    keep.size shouldBe 2

    // the per-frame carve-out must therefore free NOTHING here...
    scope.releaseExcept(keep, blocking = true) shouldBe 0
    // ...and the kept view still executes through both checkpoints
    outer.collect().length shouldBe 6

    scope.release(blocking = true)
    Pinned.pinnedCount(spark) shouldBe 0
    // regression shape check: without the walk, releaseExcept would
    // have dropped `inner`'s blocks and this collect would throw
    intercept[Exception](inner.collect())
  }

  test("a released frame fails loudly on re-execution, never recomputes") {
    val p = Pinned.pin(corpus.select(col("doc_id"), expr("length(text)").as("len")))
    p.collect().length shouldBe 6
    Pinned.release(spark, blocking = true)
    val e = intercept[Exception](p.collect())
    // LocalCheckpointRDD: "Checkpoint block rdd_N_P not found!"
    val msgs = Iterator
      .iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    msgs.toLowerCase should include("checkpoint block")
  }
}
