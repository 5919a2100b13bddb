package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.operators.InvertedIndex
import graft.sources.{LetterSink, TextCorpus}

class InvertedIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("inverted index on an inline corpus") {
    val docs = Seq(
      (1L, "the sky is blue"),
      (2L, "the sun is bright"),
      (3L, "blue blue sky")).toDF("doc_id", "text")
    val idx = InvertedIndex(docs).collect()
      .map(r => r.getString(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    assert(idx("the") === ((Seq(1L, 2L), 2L)))
    assert(idx("blue") === ((Seq(1L, 3L), 2L)))   // dup within doc 3 collapsed
    assert(idx("sky") === ((Seq(1L, 3L), 2L)))
    assert(idx("bright") === ((Seq(2L), 1L)))
  }

  test("identical results regardless of partitioning (the reference's MxR matrix)") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val a = InvertedIndex(docs.repartition(1)).orderBy("word").collect()
    val b = InvertedIndex(docs.repartition(13)).orderBy("word").collect()
    assert(a.sameElements(b))
  }

  /** Golden fidelity: run the full pipeline over the reference's own small
    * corpus (read in place, never copied) and diff against its golden
    * outputs `checker/test_out_small/{a..z}.txt`.
    */
  test("golden outputs match the reference checker fixtures") {
    val refDir = Paths.get("/root/reference/checker")
    assume(Files.exists(refDir), "reference checker fixtures not present")

    val docs = TextCorpus.fromManifest(spark,
      refDir.resolve("test_small.txt").toString)
    val out = Files.createTempDirectory("graft-golden").toString
    LetterSink.write(InvertedIndex(docs), out)

    ('a' to 'z').foreach { c =>
      val got = Files.readAllLines(Paths.get(out, s"$c.txt")).asScala
        .map(_.trim).filter(_.nonEmpty)
      val want = Files.readAllLines(refDir.resolve(s"test_out_small/$c.txt"))
        .asScala.map(_.trim).filter(_.nonEmpty)
      assert(got === want, s"letter file $c.txt differs")
    }
  }

  test("sharded posting lists reassemble into the unsharded index") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val flat = InvertedIndex(docs).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val sharded = InvertedIndex.sharded(docs, shardSize = 7).collect()
      .groupBy(_.getString(0))
      .map { case (word, rows) =>
        val reassembled = rows.sortBy(_.getInt(1))
          .flatMap(_.getSeq[Long](2)).toSeq
        assert(rows.forall(_.getSeq[Long](2).length <= 7),
          s"shard overflow for $word")
        word -> reassembled
      }
    assert(sharded === flat)
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** The full-size reference corpus: 355 book-chapter files, 6.4 MB,
    * 33k golden output lines. Matches the reference checker's main
    * correctness gate (diff -w of all 26 letter files).
    */
  test("golden outputs match the BIG reference corpus") {
    val refDir = Paths.get("/root/reference/checker")
    assume(Files.exists(refDir.resolve("test.txt")), "big fixtures absent")

    val docs = TextCorpus.fromManifest(spark, refDir.resolve("test.txt").toString)
    val out = Files.createTempDirectory("graft-golden-big").toString
    LetterSink.write(InvertedIndex(docs), out)

    ('a' to 'z').foreach { c =>
      val got = Files.readAllLines(Paths.get(out, s"$c.txt")).asScala
        .map(_.trim).filter(_.nonEmpty)
      val want = Files.readAllLines(refDir.resolve(s"test_out/$c.txt"))
        .asScala.map(_.trim).filter(_.nonEmpty)
      assert(got.length === want.length, s"line count differs in $c.txt")
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g === w, s"$c.txt line ${i + 1} differs")
      }
    }
  }

  test("incremental maintenance == full rebuild, and the merge is idempotent") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
    val oldDocs = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    val full = InvertedIndex(docs).orderBy("word").collect()
    val inc = InvertedIndex
      .incremental(InvertedIndex(oldDocs), delta)
      .orderBy("word").collect()
    assert(inc.sameElements(full),
      "incremental merge diverged from the full rebuild")
    // re-delivering the same delta must change nothing
    val again = InvertedIndex
      .incremental(InvertedIndex.incremental(InvertedIndex(oldDocs), delta), delta)
      .orderBy("word").collect()
    assert(again.sameElements(full), "incremental merge is not idempotent")
  }
}
