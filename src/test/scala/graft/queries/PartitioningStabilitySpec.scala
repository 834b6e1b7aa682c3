package graft.queries

import graft.SparkSpec

/** Bit-stability under re-partitioning: every catalogued query must
  * return IDENTICAL rows whether the shuffle is 3-wide or 17-wide —
  * the local stand-in for AQE re-planning and cluster-size changes at
  * 100 TB. Queries that aggregate doubles are the ones that silently
  * break this (summation order follows partitioning), which is why the
  * catalog computes them via exact decimals / IEEE-fixed shapes; this
  * spec pins the invariant for the riskiest queries so a refactor that
  * reintroduces a raw double SUM fails here, not in the oracle gate.
  */
class PartitioningStabilitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // The double-producing / order-sensitive subset of the catalog.
  private val risky = Seq(
    "q01_pricing_summary", // decimal-summed aggregates
    "q22_asof_enrich", // windowed sweep
    "q26_percentiles", // interpolated percentiles
    "q40_knn_brute_force", // dot-product folds
    "q44_embedding_near_dup", // cosine pairs
    "q61_bigram_fluency", // frequency-join score
    "q66_label_centroids", // quantized vector means
    "q68_revenue_share", // ratio-to-report
    "q72_stats_exact", // moment formulas
    "q73_pack_spans", // two-pass prefix offsets (partition-count sensitive)
    "q76_scalar_quant", // quantization error audit
    "q79_kmv_distinct", // sketch estimate
    "q80_bloom_decontamination", // hit fractions
    "q82_interpolate", // linear blends
    "q90_sparse_docsim", // bucket-grouped pair stage (round-6 rewrite)
    "q96_staged_neardup" // staged incremental pairing + jaccard verify
  )

  test("risky queries return identical rows at 3-wide and 17-wide shuffles") {
    val conf = spark.conf
    val old = conf.get("spark.sql.shuffle.partitions")
    def runAll(parts: Int): Map[String, Seq[String]] = {
      conf.set("spark.sql.shuffle.partitions", parts.toString)
      risky.map { name =>
        name -> graft.SparkEntry
          .queries(name)(spark, dir)
          .collect()
          .map(_.toString)
          .toSeq
      }.toMap
    }
    try {
      val narrow = runAll(3)
      val wide = runAll(17)
      for (name <- risky) {
        withClue(s"$name diverged between partitionings: ") {
          wide(name) shouldBe narrow(name)
        }
      }
    } finally conf.set("spark.sql.shuffle.partitions", old)
  }
}
