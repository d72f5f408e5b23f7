package graft.format

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Replays the reference's AFL fuzz corpus (42 minimized crash inputs,
  * the .col files under reference testdata, exercised by AFLTestCases in
  * src/columnfile_test.cc:278-303) against our reader. Same wire format,
  * same contract: malformed input must raise a clean
  * CorruptColumnFileException — never crash, hang, or over-allocate.
  *
  * The corpus is read from the reference checkout when present (test
  * inputs only — no reference code is used); the suite is skipped in
  * environments without it.
  */
class FuzzCorpusSpec extends AnyFunSuite {

  private val corpusDir = Paths.get("/root/reference/testdata")

  private def corpus: Seq[java.nio.file.Path] =
    if (!Files.isDirectory(corpusDir)) Seq.empty
    else Files.list(corpusDir).iterator().asScala
      .filter(_.toString.endsWith(".col")).toSeq.sortBy(_.toString)

  test("AFL corpus: every input either parses or throws cleanly") {
    assume(corpus.nonEmpty, "reference fuzz corpus not available")
    var parsed = 0
    var rejected = 0
    corpus.foreach { p =>
      val bytes = Files.readAllBytes(p)
      try {
        val reader = ColumnFileReader.open(bytes)
        var rows = 0
        while (!reader.end && rows < 1000000) {
          reader.getRow()
          rows += 1
        }
        parsed += 1
      } catch {
        case _: CorruptColumnFileException => rejected += 1
        // any other throwable fails the test = a crash-class bug
      }
    }
    info(s"corpus: ${corpus.size} inputs, $parsed parsed, $rejected rejected")
    assert(parsed + rejected == corpus.size)
  }

  test("AFL corpus: chunk scanning never over-allocates") {
    assume(corpus.nonEmpty, "reference fuzz corpus not available")
    corpus.foreach { p =>
      val bytes = Files.readAllBytes(p)
      try {
        ColumnFileReader.scanChunks(new BytesInput(bytes))
        ()
      } catch { case _: CorruptColumnFileException => }
    }
  }
}
