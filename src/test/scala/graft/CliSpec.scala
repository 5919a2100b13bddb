package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.operators.InvertedIndex
import graft.sources.{LetterSink, TextCorpus}

/** The CLI's pipeline (manifest -> index -> letter files) at CLI
  * semantics — exercised directly (Cli.main owns its own SparkSession;
  * the shared-session suite drives the same composition).
  */
class CliSpec extends SparkTestBase {

  test("CLI pipeline produces the reference contract from a manifest") {
    val refSmall = Paths.get("/root/reference/checker/test_small.txt")
    assume(Files.exists(refSmall))
    val out = Files.createTempDirectory("graft-cli").toString
    LetterSink.write(
      InvertedIndex(TextCorpus.fromManifest(spark, refSmall.toString)), out)
    val files = ('a' to 'z').map(c => Paths.get(out, s"$c.txt"))
    assert(files.forall(Files.exists(_)), "missing letter files")
    val sLines = Files.readAllLines(Paths.get(out, "s.txt")).asScala
    assert(sLines.head.startsWith("sky:["), s"ordering wrong: ${sLines.head}")
  }
}
