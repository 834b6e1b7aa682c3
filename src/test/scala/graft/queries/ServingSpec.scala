package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Ivfadc

/** The ServingBench entry points: the staged serving legs must be
  * byte-identical to the fit-inclusive catalog queries (save/load
  * round-trips bit-exactly, so load-then-search IS q102's search),
  * and the many-query sweep must honor the per-query top-k contract.
  */
class ServingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSeq

  test("staged serving legs are byte-identical to the fit-inclusive queries") {
    val idxDir = Files.createTempDirectory("graft_serving_spec").toString + "/idx"
    Vectors.q102FitAndSave(spark, dir, idxDir)
    try {
      val idx = Ivfadc.load(spark, idxDir)
      assert(rows(Vectors.q102Serve(spark, dir, idx)) == rows(Vectors.q102Ivfadc(spark, dir)),
        "loaded-index probed search diverged from the fit-inclusive q102")
      assert(rows(Vectors.q130Serve(spark, dir, idx)) == rows(Vectors.q130MmrIvfadc(spark, dir)),
        "loaded-index MMR serving diverged from the fit-inclusive q130")
    } finally graft.operators.Pinned.release(spark, blocking = true)
  }

  test("the many-query sweep serves top-k per corpus vector, self excluded") {
    val idxDir = Files.createTempDirectory("graft_serving_allq").toString + "/idx"
    Vectors.q102FitAndSave(spark, dir, idxDir)
    val idx = Ivfadc.load(spark, idxDir)
    val res = Vectors.ivfadcServeAll(spark, dir, idx, k = 5)
      .select("qid", "nid", "rank").cache()
    try {
      assert(res.filter(col("qid") === col("nid")).isEmpty, "self-match served")
      val perQ = res.groupBy("qid")
        .agg(count(lit(1)).as("n"), max(col("rank")).as("maxr"), min(col("rank")).as("minr"))
      assert(perQ.filter(col("n") > 5 || col("maxr") =!= col("n") || col("minr") =!= 1).isEmpty,
        "per-query ranks must be 1..n with n <= k")
      val nq = perQ.count()
      val corpus = graft.tables.Tables.embeddings(spark, dir).count()
      assert(nq == corpus, s"every corpus vector queries the index: $nq of $corpus answered")
    } finally res.unpersist()
  }
}
