package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{length => strlen}

import graft.SparkSpec

class TextGroupsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "Alpha beta gamma"),
    (2L, "alpha beta gamma"), // same after lower, different raw
    (3L, "Alpha beta gamma"), // raw dup of 1
    (4L, "delta epsilon"),
    (5L, "delta epsilon")
  ).toDF("doc_id", "text")

  test("perDoc memoization matches the direct per-row computation") {
    val direct = corpus
      .select(col("doc_id"), md5(col("text")).as("h"), strlen(col("text")).as("len"))
      .orderBy("doc_id")
      .as[(Long, String, Int)]
      .collect()
      .toSeq
    val memo = TextGroups
      .perDoc(corpus, "doc_id", col("text")) { reps =>
        reps.select(col("gid"), md5(col("t")).as("h"), strlen(col("t")).as("len"))
      }
      .orderBy("doc_id")
      .as[(Long, String, Int)]
      .collect()
      .toSeq
    memo shouldBe direct
  }

  test("perDoc drops every doc of a text the perText function drops") {
    val out = TextGroups
      .perDoc(corpus, "doc_id", lower(col("text"))) { reps =>
        reps.filter(col("t").startsWith("alpha")).select(col("gid"), strlen(col("t")).as("len"))
      }
      .select("doc_id")
      .as[Long]
      .collect()
      .sorted
      .toSeq
    out shouldBe Seq(1L, 2L, 3L) // docs 1-3 share the lowercased text
  }

  test("perDocWithSizes: group sizes recover document-level counts") {
    // corpus doc-frequency of a token == sum of gsz over groups containing it
    def direct(df: DataFrame) = df
      .select(col("doc_id"), explode(array_distinct(split(lower(col("text")), "\\s+"))).as("tok"))
      .groupBy("tok")
      .agg(countDistinct(col("doc_id")).as("df"))
    val expected = direct(corpus).orderBy("tok").as[(String, Long)].collect().toSeq
    val viaSizes = TextGroups
      .perDocWithSizes(corpus, "doc_id", lower(col("text"))) { (reps, sizes) =>
        reps
          .select(col("gid"), explode(array_distinct(split(col("t"), "\\s+"))).as("tok"))
          .join(sizes, "gid")
          .groupBy("gid", "tok")
          .agg(first(col("gsz")).as("gsz"))
      }
      // back at doc granularity the group sizes must reproduce the
      // document frequency exactly
      .groupBy("tok")
      .agg(countDistinct(col("doc_id")).as("df"))
      .orderBy("tok")
      .as[(String, Long)]
      .collect()
      .toSeq
    viaSizes shouldBe expected
  }

  test("prelude: representative is min id per key, members cover every doc") {
    val (members, reps) = TextGroups.prelude(corpus, "doc_id", lower(col("text")))
    reps.select("gid").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 4L)
    members
      .orderBy("doc_id")
      .as[(Long, Long)]
      .collect()
      .toSeq shouldBe Seq((1L, 1L), (1L, 2L), (1L, 3L), (4L, 4L), (4L, 5L))
    // the representative's key is the grouped text, exposed as `t`
    reps.orderBy("gid").as[(Long, String)].collect().toSeq shouldBe
      Seq((1L, "alpha beta gamma"), (4L, "delta epsilon"))
  }

  test("prelude rejects an id column named t (alias collision)") {
    an[IllegalArgumentException] should be thrownBy
      TextGroups.prelude(corpus.withColumnRenamed("doc_id", "t"), "t", lower(col("text")))
  }

  private def withMemoize[A](mode: String)(body: => A): A = {
    spark.conf.set("spark.graft.text.memoize", mode)
    try body
    finally spark.conf.unset("spark.graft.text.memoize")
  }

  test("grouped and direct modes are bit-identical on a duplicate-heavy corpus") {
    // the real memoization pattern: per-doc total of corpus DOC
    // frequencies — a cross-group aggregate where gsz weights group
    // membership back to document counts
    def run = TextGroups
      .perDocWithSizes(corpus, "doc_id", lower(col("text"))) { (reps, sizes) =>
        val toks =
          reps.select(col("gid"), explode(array_distinct(split(col("t"), "\\s+"))).as("tok"))
        val docFreq =
          toks.join(sizes, "gid").groupBy("tok").agg(sum(col("gsz")).as("docfreq"))
        toks
          .join(docFreq, "tok")
          .groupBy("gid")
          .agg(sum(col("docfreq")).as("w"), count(lit(1)).as("n_tok"))
      }
      .orderBy("doc_id")
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    val grouped = withMemoize("always")(run)
    val direct = withMemoize("never")(run)
    direct shouldBe grouped
    direct.map(_._1) shouldBe Seq(1L, 2L, 3L, 4L, 5L)
  }

  test("direct mode: prelude degenerates to singleton groups with no exchange") {
    withMemoize("never") {
      val (members, reps) = TextGroups.prelude(corpus, "doc_id", lower(col("text")))
      members.as[(Long, Long)].collect().toSeq.sorted shouldBe
        Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L))
      reps.count() shouldBe 5L
      // projection-only: no shuffle, no window in the plan
      val plan = members.queryExecution.executedPlan.toString
      plan should not include "Exchange"
      plan should not include "Window"
    }
  }

  test("auto measures the duplication factor and picks the grouped plan past the threshold") {
    // 5 docs / 2 distinct lowercased texts = 2.5 ≥ 2.0 → memoized
    TextGroups.duplicationFactor(corpus, lower(col("text"))) shouldBe 2.5 +- 0.3
    val out = TextGroups.perDoc(corpus, "doc_id", lower(col("text"))) { reps =>
      reps.select(col("gid"), strlen(col("t")).as("len"))
    }
    out.queryExecution.executedPlan.toString should include("Window")
    // 5 docs / 3 distinct raw texts = 1.67 < 2.0 → direct
    val direct = TextGroups.perDoc(corpus, "doc_id", col("text")) { reps =>
      reps.select(col("gid"), strlen(col("t")).as("len"))
    }
    direct.queryExecution.executedPlan.toString should not include "Window"
    // both compute the same values regardless
    direct.orderBy("doc_id").as[(Long, Int)].collect() shouldBe
      out.orderBy("doc_id").as[(Long, Int)].collect()
  }

  test("a streaming input always takes the direct path (no measurement, no window)") {
    // even under memoize=always: the grouping window is not a
    // streaming operator and the measurement cannot run on a stream
    withMemoize("always") {
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
      mem.addData((1L, "alpha beta"), (2L, "alpha beta"))
      val out = TextGroups.perDoc(mem.toDF.toDF("doc_id", "text"), "doc_id", col("text")) { reps =>
        reps.select(col("gid"), strlen(col("t")).as("len"))
      }
      out.isStreaming shouldBe true
      out.queryExecution.analyzed.toString should not include "Window"
      val q = out.writeStream.format("memory").queryName("tgStream").outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      spark.table("tgStream").as[(Long, Int)].collect().toSet shouldBe
        Set((1L, 10), (2L, 10))
    }
  }

  test("an invalid memoize mode fails with the conf key's options named") {
    withMemoize("sometimes") {
      val e = intercept[IllegalArgumentException] {
        TextGroups.perDoc(corpus, "doc_id", col("text"))(identity)
      }
      e.getMessage should include("auto|always|never")
    }
  }
}
