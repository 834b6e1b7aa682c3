package graft.expressions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the MmrGreedyAgg aggregate byte-identical to the frame-form
  * greedy it replaced (round-15 optimization): k−1 rounds of join +
  * windowed argmax over the candidate pool. The reference below IS
  * that chain, kept verbatim (minus the pins — plan size is fine at
  * spec scale) so a drift in the aggregate's arithmetic or tie-breaks
  * fails loudly against the original semantics.
  */
class MmrGreedySpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** The pre-round-15 frame-form greedy, verbatim reference. */
  private def mmrGreedyFrames(cands: DataFrame, k: Int): DataFrame = {
    val aSide = cands.select(col("qid"), col("nid").as("a"), col("nemb").as("aemb"))
    val bSide = cands.select(col("qid"), col("nid").as("b"), col("nemb").as("bemb"))
    val sims = aSide
      .join(bSide, Seq("qid"))
      .filter(col("a") =!= col("b"))
      .select(
        col("qid"),
        col("a"),
        col("b"),
        (dot(col("aemb"), col("bemb")) /
          (sqrt(dot(col("aemb"), col("aemb"))) * sqrt(dot(col("bemb"), col("bemb"))))).as("sim"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("nid"))
    val base = cands.select(col("qid"), col("nid"), col("rel"))
    var selected = base
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select(col("qid"), col("nid"), col("rel"), col("rel").as("score"), lit(1).as("step"))
    for (t <- 2 to k) {
      val ms = sims
        .join(selected.select(col("qid"), col("nid").as("b")), Seq("qid", "b"))
        .groupBy(col("qid"), col("a"))
        .agg(max(col("sim")).as("maxsim"))
        .withColumnRenamed("a", "nid")
      val wPick = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid"))
      val pick = base
        .join(selected.select("qid", "nid"), Seq("qid", "nid"), "left_anti")
        .join(ms, Seq("qid", "nid"))
        .withColumn("score", lit(0.7) * col("rel") - lit(0.3) * col("maxsim"))
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("qid"), col("nid"), col("rel"), col("score"), lit(t).as("step"))
      selected = selected.unionByName(pick)
    }
    selected
  }

  private def mmrGreedyAgg(cands: DataFrame, k: Int): DataFrame =
    cands
      .groupBy(col("qid"))
      .agg(MmrGreedyAgg.mmr(col("nid"), col("nemb"), col("rel"), k, 0.7, 0.3).as("_sel"))
      .select(col("qid"), explode(col("_sel")).as("_s"))
      .select(
        col("qid"),
        col("_s.nid").as("nid"),
        col("_s.rel").as("rel"),
        col("_s.score").as("score"),
        col("_s.step").as("step"))

  private def collectBoth(cands: DataFrame, k: Int) = {
    val a = mmrGreedyAgg(cands, k)
      .orderBy("qid", "step")
      .as[(Long, Long, Double, Double, Int)]
      .collect()
      .toSeq
    val b = mmrGreedyFrames(cands, k)
      .orderBy("qid", "step")
      .as[(Long, Long, Double, Double, Int)]
      .collect()
      .toSeq
    (a, b)
  }

  test("matches the frame-form greedy on random pools (property, incl. doubles bit-equality)") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      qid <- 0L until 5L
      nid <- 0L until 12L
    } yield (qid, nid * 7 + qid, Seq.fill(8)(rnd.nextDouble() * 2 - 1), rnd.nextDouble())
    val cands = rows.toDF("qid", "nid", "nemb", "rel")
    val (a, b) = collectBoth(cands, 5)
    a should have size (5 * 5)
    // bit-level comparison: scores must match EXACTLY, not within eps
    a.map(t => (t._1, t._2, t._5,
      java.lang.Double.doubleToLongBits(t._3), java.lang.Double.doubleToLongBits(t._4))) shouldBe
      b.map(t => (t._1, t._2, t._5,
        java.lang.Double.doubleToLongBits(t._3), java.lang.Double.doubleToLongBits(t._4)))
  }

  test("ties break to the lower nid, same as the window order") {
    // identical embeddings and rel values → every step is a pure
    // tie; both forms must pick ascending nids deterministically
    val rows = for {
      qid <- 0L until 2L
      nid <- Seq(9L, 3L, 7L, 1L)
    } yield (qid, nid, Seq(1.0, 0.0), 0.5)
    val cands = rows.toDF("qid", "nid", "nemb", "rel")
    val (a, b) = collectBoth(cands, 3)
    a shouldBe b
    a.filter(_._1 == 0L).map(_._2) shouldBe Seq(1L, 3L, 7L)
  }

  test("pool smaller than k stops early in both forms") {
    val rows = Seq(
      (0L, 1L, Seq(1.0, 0.0), 0.9),
      (0L, 2L, Seq(0.0, 1.0), 0.8))
    val cands = rows.toDF("qid", "nid", "nemb", "rel")
    val (a, b) = collectBoth(cands, 5)
    a shouldBe b
    a should have size 2
  }

  test("distributed pools merge before selection (repartitioned input, same result)") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      qid <- 0L until 3L
      nid <- 0L until 20L
    } yield (qid, nid, Seq.fill(4)(rnd.nextDouble()), rnd.nextDouble())
    val cands = rows.toDF("qid", "nid", "nemb", "rel")
    val (a, _) = collectBoth(cands, 4)
    val scattered = mmrGreedyAgg(cands.repartition(16), 4)
      .orderBy("qid", "step")
      .as[(Long, Long, Double, Double, Int)]
      .collect()
      .toSeq
    scattered shouldBe a
  }
}
