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
    import graft.operators.Dedup
    import graft.tables.Tables
    val docs = Tables.documents(spark, dir)
    println("direct rows: " + Dedup.minhashNearDups(docs, "doc_id", "text", 3, 8, 4, persistShingles = false).count())
    val w0 = org.apache.spark.sql.expressions.Window.partitionBy("text")
    val withGid0 = docs.select(col("doc_id"), col("text")).withColumn("gid", min(col("doc_id")).over(w0))
    val reps0 = withGid0.filter(col("doc_id") === col("gid")).select(col("gid").as("doc_id"), col("text"))
    val members0 = withGid0.select(col("gid"), col("doc_id").as("mid"))
    val repPairs0 = Dedup.minhashNearDups(reps0, "doc_id", "text", 3, 8, 4, persistShingles = false)
    println("repPairs rows: " + repPairs0.count())
    time("cross") {
      repPairs0
        .join(members0.select(col("gid").as("g1"), col("mid").as("a")), col("id1") === col("g1"))
        .join(members0.select(col("gid").as("g2"), col("mid").as("b")), col("id2") === col("g2"))
        .select(least(col("a"), col("b")).as("id1"), greatest(col("a"), col("b")).as("id2"), col("jaccard"))
    }
    time("dedup1st") { Dedup.minhashNearDups(docs, "doc_id", "text", 3, 8, 4, persistShingles = false, dedupFirst = true) }
    time("reps") {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("text")
      docs.select(col("doc_id"), col("text")).withColumn("gid", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("gid"))
    }
    time("repPairs") {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("text")
      val reps = docs.select(col("doc_id"), col("text")).withColumn("gid", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("gid")).select(col("gid").as("doc_id"), col("text"))
      Dedup.minhashNearDups(reps, "doc_id", "text", 3, 8, 4, persistShingles = false)
    }
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
