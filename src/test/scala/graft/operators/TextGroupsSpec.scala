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
}
