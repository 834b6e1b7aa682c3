package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("sign matrix is deterministic and roughly balanced") {
    val signs = for (i <- 0 until 64; j <- 0 until 8) yield RandomProjection.sign(i, j)
    signs.foreach(s => Set(1, -1) should contain(s))
    signs shouldBe (for (i <- 0 until 64; j <- 0 until 8) yield RandomProjection.sign(i, j))
    val pos = signs.count(_ == 1)
    pos should be > 180 // ~256 expected of 512; md5 parity is fair
    pos should be < 330
  }

  test("projection preserves norms in expectation (JL on deterministic vectors)") {
    // vectors with known norms: e_i scaled — projected squared norm of
    // s·e_i is s²·sign²/k·k = s² exactly? No: proj_j = s·sign(i,j)/√k,
    // Σ_j proj_j² = s²·k/k = s². Single-coordinate vectors project
    // EXACTLY norm-preserving under a ±1 matrix — a sharp invariant.
    val rows = (0 until 64).map { i =>
      val v = Array.fill(64)(0.0f); v(i) = 2.5f
      (i.toLong, v.toSeq)
    }
    val out = rows
      .toDF("id", "embedding")
      .select(col("id"), RandomProjection.project(col("embedding"), 64, 8).as("p"))
      .as[(Long, Seq[Double])]
      .collect()
    out.foreach { case (_, p) =>
      val n2 = p.map(x => x * x).sum
      n2 shouldBe 6.25 +- 1e-9
    }
  }

  test("distortion on general vectors stays within the coarse JL band at k=8") {
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 40).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat).toSeq))
    val df = vecs
      .toDF("id", "embedding")
      .select(col("id"), col("embedding"), RandomProjection.project(col("embedding"), 64, 8).as("p"))
      .as[(Long, Seq[Float], Seq[Double])]
      .collect()
    val ratios = df.sliding(2).collect { case Array((_, e1, p1), (_, e2, p2)) =>
      val dOrig = e1.zip(e2).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
      val dProj = p1.zip(p2).map { case (a, b) => (a - b) * (a - b) }.sum
      dProj / dOrig
    }.toSeq
    // k=8 is coarse: individual ratios wander, but the mean is ~1 and
    // nothing collapses to 0 or explodes
    ratios.foreach { r => r should (be > 0.05 and be < 8.0) }
    (ratios.sum / ratios.size) shouldBe 1.0 +- 0.4
  }
}
