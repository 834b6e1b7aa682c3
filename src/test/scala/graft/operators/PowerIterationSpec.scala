package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class PowerIterationSpec extends AnyFunSuite with Matchers {

  test("recovers the dominant eigenpair of a diagonal matrix") {
    val m = Array(
      Array(4.0, 0.0),
      Array(0.0, 1.0))
    val (v, eig) = PowerIteration.topComponent(m, 30)
    eig shouldBe 4.0 +- 1e-9
    math.abs(v(0)) shouldBe 1.0 +- 1e-6
    math.abs(v(1)) shouldBe 0.0 +- 1e-6
  }

  test("recovers a rotated dominant direction") {
    // covariance of points along (1, 1): [[2, 2], [2, 2]] + small ridge
    val m = Array(
      Array(2.1, 2.0),
      Array(2.0, 2.1))
    val (v, eig) = PowerIteration.topComponent(m, 30)
    eig shouldBe 4.1 +- 1e-9
    (v(0) / v(1)) shouldBe 1.0 +- 1e-6
    math.sqrt(v(0) * v(0) + v(1) * v(1)) shouldBe 1.0 +- 1e-9
  }

  test("deterministic: identical inputs give bit-identical outputs") {
    val m = Array.tabulate(8, 8)((i, j) => 1.0 / (1 + i + j))
    val a = PowerIteration.topComponent(m, 6)
    val b = PowerIteration.topComponent(m, 6)
    a._1.toSeq shouldBe b._1.toSeq
    a._2 shouldBe b._2
  }
}
