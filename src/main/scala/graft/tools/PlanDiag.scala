package graft.tools

import org.apache.spark.sql.functions._

import graft._
import graft.operators.Dedup

/** Dev diagnostic: stage timings for tuning. */
object PlanDiag {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    val docs = graft.tables.Tables.documents(spark, dir)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"DIAG $label rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("tokens")(docs.select(Dedup.tokens(col("text")).as("t")).select(sum(size(col("t")))).head().getLong(0))
    time("shingles")(
      docs.select(Dedup.shingles(Dedup.tokens(col("text")), 3).as("s")).select(sum(size(col("s")))).head().getLong(0)
    )
    time("basehash")(
      docs
        .select(Dedup.shingles(Dedup.tokens(col("text")), 3).as("s"))
        .select(Dedup.baseHashes(col("s")).as("x"))
        .select(sum(size(col("x"))))
        .head()
        .getLong(0)
    )
    time("bands")(Dedup.explodeBands(docs, "doc_id", "text", 3, 8, 4).count())
    time("pairs")(Dedup.candidatePairs(Dedup.explodeBands(docs, "doc_id", "text", 3, 8, 4), "doc_id").count())
    time("full")(Dedup.minhashNearDups(docs, "doc_id", "text", 3, 8, 4).count())
    spark.stop()
  }
}
