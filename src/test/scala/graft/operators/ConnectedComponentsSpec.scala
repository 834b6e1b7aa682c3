package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)]
      .collect()
      .toMap

  test("chain collapses to its min id (multi-iteration propagation)") {
    // A 6-vertex path needs several propagation rounds — exercises the
    // fixpoint loop, not just one join.
    val out = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L)
  }

  test("separate components keep separate labels") {
    val out = cc(Seq((1L, 2L), (10L, 11L), (11L, 12L), (20L, 21L)))
    out(1L) shouldBe 1L
    out(2L) shouldBe 1L
    Seq(10L, 11L, 12L).foreach(v => out(v) shouldBe 10L)
    Seq(20L, 21L).foreach(v => out(v) shouldBe 20L)
  }

  test("edge direction and duplicates do not matter") {
    val out = cc(Seq((5L, 3L), (3L, 5L), (5L, 3L), (4L, 5L)))
    out shouldBe Map(3L -> 3L, 4L -> 3L, 5L -> 3L)
  }

  test("self-loops are ignored") {
    val out = cc(Seq((7L, 7L), (7L, 8L)))
    out shouldBe Map(7L -> 7L, 8L -> 7L)
  }

  test("star graph converges in one round") {
    val out = cc((2L to 9L).map(i => (1L, i)))
    out.values.toSet shouldBe Set(1L)
    out.keySet shouldBe (1L to 9L).toSet
  }

  test("empty edge list yields an empty labeling, not an NPE") {
    val out = cc(Seq.empty)
    out shouldBe Map.empty
  }

  test("matches a union-find reference on random graphs (property)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll

    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // normalize: every vertex → min id of its component
      val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val byRoot = vs.groupBy(find)
      byRoot.valuesIterator.flatMap(c => { val m = c.min; c.map(_ -> m) }).toMap
    }

    val edgeGen = Gen.zip(Gen.choose(0L, 25L), Gen.choose(0L, 25L))
    val graphGen = Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, edgeGen))
    val prop = forAll(graphGen) { edges =>
      val real = edges.filter(e => e._1 != e._2)
      real.isEmpty || cc(real) == unionFind(real)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
