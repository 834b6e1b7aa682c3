package graft.tools

import graft._

/** Dev tool: dump `explain("formatted")` physical plans for the named
  * queries (default: the flagship set) — the artifact reviewed for
  * scan pushdown, pruning, broadcast choices, and shuffle counts.
  *
  *   sbt "runMain graft.tools.PlanDiag q01_pricing_summary q22_asof_enrich"
  */
object PlanDiag {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq(
        "q01_pricing_summary",
        "q02_filter_project",
        "q03_revenue_by_nation",
        "q22_asof_enrich",
        "q35_minhash_lsh",
        "q42_ann_ivf",
        "q89_dup_ngram_spans",
        "q90_sparse_docsim",
        "q91_fuzzy_editdist",
        "q92_event_transitions"
      )
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      println(s"\n==== $name ====")
      // scalastyle:off println — explain writes to stdout by design
      df.explain("formatted")
    }
    spark.stop()
  }
}
