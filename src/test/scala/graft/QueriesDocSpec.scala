package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** QUERIES.md is the reviewer's index of the catalog — keep it honest:
  * every catalogued query number appears in the doc and vice versa.
  */
class QueriesDocSpec extends AnyFunSuite with Matchers {

  test("QUERIES.md lists exactly the catalogued query numbers") {
    val doc = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("QUERIES.md")),
      "UTF-8"
    )
    val documented = "(?m)^- (q\\d+):".r.findAllMatchIn(doc).map(_.group(1)).toSet
    val catalogued = SparkEntry.queries.keySet.map(_.split("_")(0))
    documented shouldBe catalogued
  }

  test("every oracle key is a catalogued query") {
    SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet) shouldBe empty
  }

  test("exactly q45 is rows-only (the doc header's claim)") {
    // q45's HLL/approx-quantile sketches are engine-private by design
    // (the portable KMV form q79 IS hash-gated); everything else —
    // including q52's trained k-means, replayed in DuckDB via unrolled
    // Lloyd iterations — carries a full oracle.
    val rowsOnly = SparkEntry.queries.keySet
      .diff(SparkEntry.oracleSql.keySet)
      .map(_.split("_")(0))
    rowsOnly shouldBe Set("q45")
  }
}
