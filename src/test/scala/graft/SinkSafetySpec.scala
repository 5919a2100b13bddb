package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.operators.InvertedIndex
import graft.sources.{LetterSink, TextCorpus}

class SinkSafetySpec extends SparkTestBase {
  import spark.implicits._

  test("a failing job never clobbers the previous run's letter files") {
    val out = Files.createTempDirectory("sink-safety").toString
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    LetterSink.write(InvertedIndex(docs), out)
    val before = Files.readAllLines(Paths.get(out, "b.txt")).asScala.toSeq
    assert(before.nonEmpty)

    // an index whose evaluation throws mid-job
    val poisoned = InvertedIndex(docs)
      .withColumn("ids",
        when(raise_error(lit("boom")).isNull, col("ids")))
    intercept[Exception] {
      LetterSink.write(poisoned, out)
    }
    assert(Files.readAllLines(Paths.get(out, "b.txt")).asScala.toSeq
      === before, "failed run clobbered existing output")
    // no stage litter left behind
    assert(!Files.list(Paths.get(out)).iterator().asScala
      .exists(_.getFileName.toString.startsWith(".stage-")))
  }

  test("a re-run with a different corpus leaves no stale letters") {
    val out = Files.createTempDirectory("sink-stale").toString
    LetterSink.write(InvertedIndex(
      Seq((1L, "zebra")).toDF("doc_id", "text")), out)
    assert(Files.readAllLines(Paths.get(out, "z.txt")).asScala.nonEmpty)
    LetterSink.write(InvertedIndex(
      Seq((1L, "apple")).toDF("doc_id", "text")), out)
    assert(Files.readAllLines(Paths.get(out, "z.txt")).asScala.isEmpty,
      "stale letter content survived a re-run")
    assert(Files.readAllLines(Paths.get(out, "a.txt")).asScala.nonEmpty)
  }

  test("manifest source fails cleanly on a missing document file") {
    val dir = Files.createTempDirectory("bad-manifest")
    Files.writeString(dir.resolve("m.txt"), "2\nexists.txt\nmissing.txt\n")
    Files.writeString(dir.resolve("exists.txt"), "hello")
    val e = intercept[Exception] {
      TextCorpus.fromManifest(spark, dir.resolve("m.txt").toString).count()
    }
    assert(e.getMessage.toLowerCase.contains("path does not exist") ||
      e.getMessage.contains("missing.txt"))
  }
}
