package graft

import org.apache.spark.sql.DataFrame

/** The amortized ANN serving benchmark (round-13 verdict #4): the
  * catalog's fit-dominated rows (q102/q120/q130) are adjudicated as
  * offline-amortized, and THIS harness measures the amortized half —
  * fit + save once (untimed), then time only what a serving
  * deployment pays per request batch: `Ivfadc.load` + probed search
  * (+ MMR re-rank), against the staged cell-partitioned index.
  *
  * Bench.scala's measurement-honesty rules apply: noop sink (count()
  * would let the optimizer collapse the query), warmup run discarded,
  * min + median of 3, pinned-block release on the run boundary. The
  * load sits INSIDE the timed window — opening the staged index
  * (model JSON + lazy table plans) is part of a serving request's
  * cold cost; it is small, which is exactly the point of staging.
  *
  * Rows:
  *   - q102_serve: the 8-query contract probed ADC search from the
  *     loaded index (q102's serving leg);
  *   - q130_serve: the same shortlist at k=20 + the bounded MMR
  *     greedy (q130's serving leg);
  *   - serve_allq:  EVERY corpus vector queries the index via
  *     searchDf (the many-query sweep — the row that scales with |Q|);
  *   - postings_serve: BM25 from the STAGED sparse index (base built
  *     offline by StreamingPostings fold — term-repartitioned, the
  *     serving layout), load + search timed;
  *   - bm25_scan: the same queries as a full corpus scan (tokenize +
  *     filtered explode per request) — the self-baseline the staged
  *     index amortizes away; postings_serve should sit below it.
  */
object ServingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_serving").toString
    val idxDir = s"$root/idx"
    // ---- offline half: fit + stage the q102 index (untimed) ----
    graft.queries.Vectors.q102FitAndSave(spark, sfDir, idxDir)
    // ---- offline half, sparse: ingest documents as 8 postings
    // micro-batches and fold to the term-partitioned serving base ----
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val postIngest = s"$root/postings_v1"
    (0 until 8).foreach { i =>
      graft.streaming.StreamingPostings.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(8)) === i), i.toLong, postIngest, "doc_id", "text")
    }
    val postBase = s"$root/postings_v2"
    graft.streaming.StreamingPostings.foldDeltas(spark, postIngest, postBase)
    val sparseQueries: Seq[(Int, Seq[String])] = Seq(
      1 -> Seq("batch", "scan"),
      2 -> Seq("customer", "stream", "query"),
      3 -> Seq("vector", "join"),
      4 -> Seq("data", "filter"))
    graft.operators.Pinned.release(spark, blocking = true)
    spark.catalog.clearCache()

    def runOne(build: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        build().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } finally {
        spark.catalog.clearCache()
        graft.operators.Pinned.release(spark, blocking = true)
      }
    }

    val rows: Seq[(String, () => DataFrame)] = Seq(
      "q102_serve" -> (() =>
        graft.queries.Vectors.q102Serve(spark, sfDir, graft.operators.Ivfadc.load(spark, idxDir))),
      "q130_serve" -> (() =>
        graft.queries.Vectors.q130Serve(spark, sfDir, graft.operators.Ivfadc.load(spark, idxDir))),
      "serve_allq" -> (() =>
        graft.queries.Vectors.ivfadcServeAll(spark, sfDir, graft.operators.Ivfadc.load(spark, idxDir))),
      "postings_serve" -> (() =>
        graft.streaming.StreamingPostings.search(
          graft.streaming.StreamingPostings.load(spark, postBase), sparseQueries, k = 10)),
      "bm25_scan" -> (() =>
        graft.operators.Bm25.topK(docs, "doc_id", col("text"), sparseQueries, k = 10))
    )
    // warmup EVERY row, discarded: rows don't share all their code
    // paths (MMR greedy, searchDf's executor-built tables), so a
    // single-row warmup would leave the others' first measured run
    // carrying first-use codegen/classload cost (ADVICE r14)
    rows.foreach { case (_, build) => runOne(build) }

    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val results = rows.map { case (name, build) =>
      val times = (1 to runs).map(_ => runOne(build)).sorted
      (name, times(times.length / 2), times.head)
    }
    val med = results.map { case (k, v, _) => s""""${k}_sec":$v""" }.mkString(",")
    val min = results.map { case (k, _, m) => s""""${k}_min_sec":$m""" }.mkString(",")
    val json = s"""{"metric":"ivfadc_serving","unit":"sec",$med,$min,"sf":"$sfDir"}"""
    println(json)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/serving_last.json"))
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(out, (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
