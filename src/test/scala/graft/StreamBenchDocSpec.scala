package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The QueriesDocSpec pattern, extended to the streaming-throughput
  * headlines (round-11 verdict #2): SCALE.md and COVERAGE.md quoted a
  * superseded STREAMBENCH recording for a whole round because nothing
  * gated prose numbers against the committed artifacts. This spec
  * makes that drift a test failure: every throughput number quoted in
  * an "events/sec" paragraph of the documents of record must exist in
  * SOME committed STREAMBENCH_r*.json —
  *
  *   - comma-formatted exact values ("331,109") must equal an
  *     artifact's events_per_sec (or _max) exactly;
  *   - rounded "NNNk" tokens must equal an artifact value rounded to
  *     the nearest thousand (protocol constants like N=200k / 20k
  *     keys are admitted from the artifacts' n/keys/events fields);
  *   - lines explicitly marked superseded are exempt — history notes
  *     may cite the numbers they correct.
  */
class StreamBenchDocSpec extends AnyFunSuite with Matchers {

  test("streaming throughput numbers in the docs exist in a committed STREAMBENCH artifact") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(".")
    val artifacts = java.nio.file.Files
      .list(root)
      .iterator()
      .asScala
      .map(_.getFileName.toString)
      .filter(_.matches("STREAMBENCH_r\\d+(_[a-z_]+)?\\.json"))
      .toSeq
      .sorted
    artifacts should not be empty

    val exact = scala.collection.mutable.Set.empty[Long]
    val roundedK = scala.collection.mutable.Set.empty[Long]
    artifacts.foreach { a =>
      val txt = new String(java.nio.file.Files.readAllBytes(root.resolve(a)), "UTF-8")
      """"events_per_sec(?:_max)?":(\d+)(?:\.\d+)?""".r.findAllMatchIn(txt).foreach { m =>
        val v = m.group(1).toLong
        exact += v
        roundedK += Math.round(v / 1000.0)
      }
      // protocol constants quoted alongside the rates (N=200k spools,
      // 20k distinct principals, 220k total s2s events)
      """"(?:n|keys|events)":(\d+)""".r.findAllMatchIn(txt).foreach { m =>
        val v = m.group(1).toLong
        if (v % 1000 == 0) roundedK += v / 1000
      }
    }

    val commaNum = """\b(\d{1,3}(?:,\d{3})+)\b""".r
    val kNum = """\b(\d{2,4})k\b""".r
    for (doc <- Seq("BASELINE.md", "SCALE.md", "COVERAGE.md")) {
      val lines = java.nio.file.Files.readAllLines(root.resolve(doc)).asScala.toSeq
      // paragraph = contiguous non-blank lines; only paragraphs that
      // talk about events/sec are streaming-throughput quotes
      val paragraphs = lines.foldLeft(List(List.empty[String])) {
        case (acc, l) if l.trim.isEmpty => Nil :: acc
        case (p :: rest, l)             => (l :: p) :: rest
        case (Nil, l)                   => List(List(l))
      }
      paragraphs.filter(_.exists(_.contains("events/sec"))).foreach { para =>
        para.filterNot(_.toLowerCase.contains("supersed")).foreach { line =>
          commaNum.findAllMatchIn(line).foreach { m =>
            val v = m.group(1).replace(",", "").toLong
            withClue(s"$doc quotes $v (line: $line): ") { exact should contain(v) }
          }
          kNum.findAllMatchIn(line).foreach { m =>
            withClue(s"$doc quotes ${m.group(1)}k (line: $line): ") {
              roundedK should contain(m.group(1).toLong)
            }
          }
        }
      }
    }
  }
}
