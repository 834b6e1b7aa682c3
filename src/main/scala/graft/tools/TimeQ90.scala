package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch timing harness for query tuning — not part of the library. */
object TimeQ90 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time(tag: String)(f: => DataFrame): Unit = {
      f.write.mode("overwrite").format("noop").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f.write.mode("overwrite").format("noop").save(); (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $tag%-10s min=${ts.min}%.2f med=${ts.sorted.apply(1)}%.2f")
    }
    time("q32") { graft.queries.Documents.q32TextQuality(spark, dir) }
    time("q34") { graft.queries.Documents.q34Shingles(spark, dir) }
    time("q46") { graft.queries.Documents.q46Repetition(spark, dir) }
    time("q37") { graft.queries.TextPipeline.q37Winnow(spark, dir) }
    time("q38") { graft.queries.TextPipeline.q38LangId(spark, dir) }
    time("q39") { graft.queries.TextPipeline.q39Fingerprints(spark, dir) }
    spark.stop()
  }

  private def gramPositions(s: SparkSession, dir: String, n: Int): DataFrame =
    graft.tables.Tables.documents(s, dir)
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .filter(col("n_tokens") >= n)
      .select(
        col("doc_id"),
        posexplode(
          transform(sequence(lit(0), col("n_tokens") - n),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))
        ).as(Seq("pos", "gram"))
      )

  def q91CandOnly(s: SparkSession, dir: String): DataFrame = {
    val grams = gramPositions(s, dir, 5).select("doc_id", "gram").distinct()
    grams.as("a")
      .join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .agg(count(lit(1)).as("n_shared"))
  }

  def q91NoLev(s: SparkSession, dir: String): DataFrame = {
    val maxDist = 40
    val cand = q91CandOnly(s, dir)
    val txt = graft.tables.Tables.documents(s, dir)
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
    cand
      .join(txt.as("t1"), col("doc1") === col("t1.doc_id"))
      .join(txt.as("t2"), col("doc2") === col("t2.doc_id"))
      .filter(abs(length(col("t1.t")) - length(col("t2.t"))) <= maxDist)
      .select(col("doc1"), col("doc2"), col("n_shared"),
        length(col("t1.t")).as("dist"))
  }
}
