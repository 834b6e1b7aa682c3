package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // one hot key (90% of rows) + a tail
    val big = ((1 to 900).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i))).toDF("key", "v")
    val small = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).map(k => (k, s"dim_$k")).toDF("key", "dim")

    val plain = big.join(small, "key").select("key", "v", "dim")
    val saltedOut = Skew.saltedJoin(big, small, "key", buckets = 8, tieBreak = col("v")).select("key", "v", "dim")

    val a = plain.as[(String, Int, String)].collect().sorted
    val b = saltedOut.as[(String, Int, String)].collect().sorted
    b shouldBe a
  }

  test("salted join spreads the hot key over multiple salt buckets") {
    val big = (1 to 1000).map(i => ("hot", i)).toDF("key", "v")
    val n = Skew
      .salted(big, col("v"), buckets = 8)
      .select("_salt")
      .distinct()
      .count()
    n should be > 4L // all 8 with overwhelming probability
  }

  test("salted count equals the plain count") {
    val df = ((1 to 500).map(_ => "hot") ++ Seq("a", "b", "b")).toDF("key")
      .withColumn("rowid", monotonically_increasing_id())
    val plain = df.groupBy("key").count().as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(df, "key", col("rowid"), 8).as[(String, Long)].collect().toMap
    salted shouldBe plain
  }

  test("salting is deterministic across runs (no rand())") {
    val df = (1 to 50).map(i => ("k", i)).toDF("key", "v")
    val s1 = Skew.salted(df, col("v"), 8).select("v", "_salt").as[(Int, Int)].collect().toMap
    val s2 = Skew.salted(df, col("v"), 8).select("v", "_salt").as[(Int, Int)].collect().toMap
    s1 shouldBe s2
  }
}
